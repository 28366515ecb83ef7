"""Per-query phase profiler: build time (transpile+analysis+any
driver-paced work), execution time through the noop sink, and Spark
job count per rep.

Usage: python tools/profile_rec.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), REPS (default 3).

Job counting reads the DAGScheduler's job-id counter delta —
setJobGroup + statusTracker.getJobIdsForGroup was observed to wedge
the second rep of a query in this environment.
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from neo4j_arrow_spark.operators.dedup import unpersist_intermediates  # noqa: E402
from neo4j_arrow_spark.queries import queries  # noqa: E402
from neo4j_arrow_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "3"))
    spark = get_session("profile-rec")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    sc = spark.sparkContext

    def jobid() -> int:
        return sc._jsc.sc().dagScheduler().nextJobId()

    qs = queries()
    for name in sys.argv[1:]:
        fn = qs[name]
        for rep in range(reps):
            gc.collect()
            sc._jvm.System.gc()
            j0 = jobid()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j1 = jobid()
            print(
                f"{name} rep{rep}: build={t1 - t0:.3f}s "
                f"exec={t2 - t1:.3f}s jobs={j1 - j0}",
                flush=True,
            )
            unpersist_intermediates(df)


if __name__ == "__main__":
    main()
