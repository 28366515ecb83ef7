"""Benchmark harness — the driver runs this per-round at sf0.1.

Runs every registry query end-to-end (forced through the noop sink so
the full plan materializes — a bare count() would let Spark skip
column computation) and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ...}``.

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neo4j_arrow_spark.queries import queries  # noqa: E402
from neo4j_arrow_spark.session import get_session  # noqa: E402


def _sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("neo4j_arrow_spark-bench")
    # warm up the JVM + parquet footers so timings measure the plans
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, fn in sorted(queries().items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # operators persist shared subframes; drop them so queries are
        # independent measurements and memory pressure can't accumulate
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "registry_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
