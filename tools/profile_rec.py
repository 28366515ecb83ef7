"""Per-query phase profiler: build time (transpile+analysis), execution
time through the noop sink, and Spark job count per rep.

Usage: python tools/profile_rec.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), REPS (default 3).
"""

from __future__ import annotations

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
    qs = queries()
    for name in sys.argv[1:]:
        fn = qs[name]
        for rep in range(reps):
            gid = f"{name}-{rep}"
            sc.setJobGroup(gid, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs = sc._jsc.sc().statusTracker().getJobIdsForGroup(gid)
            print(
                f"{name} rep{rep}: build={t1 - t0:.3f}s "
                f"exec={t2 - t1:.3f}s jobs={len(list(jobs))}",
                flush=True,
            )
            unpersist_intermediates(df)
            sc.clearJobGroup()


if __name__ == "__main__":
    main()
