"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and exact values (order-insensitive: columns sorted by name,
rows sorted by all columns). Exact equality is the bar — if this
passes, a value-hash comparison passes too.

Usage: python tools/oracle_check.py [sf_dir] [query ...]

Known harness limit: the ``khop_wire`` ORACLE at sf0.1 exceeds DuckDB's
capacity (its ordered list aggregation does not spill; 10M input rows
OOM even standalone), while the Spark side computes the same result in
seconds. The driver's gate runs at sf0.01, where all queries pass; at
sf0.1 the ``khop_wire_checksum`` query closes the hole — it reduces the
SAME chunked wire output list-free (per-origin edge count, chunk count,
commutative pair-hash) and is verified hash-equal at sf0.1.

The full registry runs in CI via ``tests/test_full_oracle.py`` (skip
with ``SPARK_GRAFT_SKIP_FULL_ORACLE=1``) so the queries the driver's
50-per-round sample never touches cannot regress silently.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # big-oracle headroom (10M-row list aggs at sf0.1): explicit limit
    # + disk spill, since the container cgroup can confuse the default
    con.execute("SET threads=8")  # avoid thread contention with the Spark JVM
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # unify datetime resolution (Spark->pandas is ns, DuckDB is µs);
        # assert_series_equal(check_exact=True) compares raw int64s
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(
    name: str, spark_df, duck_df: pd.DataFrame, record: dict | None = None
) -> list[str]:
    """Compare; when ``record`` is given, fill it with the driver's
    CORRECTNESS fields (rows/schema/hash match + row counts)."""
    problems: list[str] = []
    sp = normalize(spark_df.toPandas())
    du = normalize(duck_df)
    if record is not None:
        record.update(
            spark_rows=len(sp),
            oracle_rows=len(du),
            rows_match=len(sp) == len(du),
            schema_match=list(sp.columns) == list(du.columns),
            hash_match=False,  # set below when values prove equal
            err=None,
        )
    if list(sp.columns) != list(du.columns):
        problems.append(f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"row count differs: spark={len(sp)} duck={len(du)}")
        return problems
    for col in sp.columns:
        a, b = sp[col], du[col]
        # dtype-strict: the driver hashes raw values, so a DuckDB HUGEINT
        # (-> float64 in pandas) vs Spark int64 is a hash mismatch even
        # when every value is equal (bit us in round 1: degree_histogram,
        # kmeans_assign). Flag any numeric-kind difference.
        if a.dtype.kind != b.dtype.kind:
            problems.append(
                f"column {col}: dtype kind differs: spark={a.dtype} duck={b.dtype}"
            )
        try:
            pd.testing.assert_series_equal(
                a, b, check_dtype=False, check_exact=True, check_names=False
            )
        except AssertionError as e:
            diff = (a != b) & ~(a.isna() & b.isna())
            n_bad = int(diff.sum())
            sample = ""
            if n_bad:
                i = diff[diff].index[0]
                sample = f" first diff @{i}: spark={a[i]!r} duck={b[i]!r}"
            problems.append(f"column {col}: {n_bad} mismatches.{sample}")
    if record is not None and not problems:
        record["hash_match"] = True
    return problems


def _round_number() -> int:
    """The driver's round counter: BENCH_r{N}.json exists for every
    COMPLETED round, so the round in progress is max(N)+1 (env
    override: SPARK_GRAFT_ROUND)."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    import glob
    import re as _re

    ns = []
    for f in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = _re.match(r"BENCH_r(\d+)\.json$", os.path.basename(f))
        if m:
            ns.append(int(m.group(1)))
    return (max(ns) + 1) if ns else 1


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from neo4j_arrow_spark.queries import oracle_sql, queries
    from neo4j_arrow_spark.session import get_session

    spark = get_session("oracle-check")
    con = duck_connection(sf_dir)
    qs, oracles = queries(), oracle_sql()

    import time

    failed = []
    walls: dict[str, float] = {}
    records: dict[str, dict] = {}
    t_start = time.perf_counter()
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            walls[name] = time.perf_counter() - t0
            records[name] = {
                "rows_only": True,
                "spark_rows": n,
                "err": None,
            }
            print(f"[rows-only] {name}: {n} rows ({walls[name]:.1f}s)")
            continue
        spark_df = fn(spark, sf_dir)
        duck_df = con.execute(oracles[name]).fetchdf()
        rec: dict = {}
        problems = compare(name, spark_df, duck_df, record=rec)
        records[name] = rec
        walls[name] = time.perf_counter() - t0
        if problems:
            failed.append(name)
            print(f"[FAIL] {name}")
            for p in problems:
                print(f"       {p}")
        else:
            print(
                f"[ok]   {name}: {len(duck_df)} rows hash-equal "
                f"({walls[name]:.1f}s)"
            )
    # per-query wall report: the CI subprocess has a fixed timeout and
    # the registry grows every round — surface where the time goes so
    # the next 20 queries can't push past it silently (r5 verdict #9)
    total = time.perf_counter() - t_start
    slowest = sorted(walls.items(), key=lambda kv: -kv[1])[:10]
    print(f"\nslowest 10 of {len(walls)} (total {total:.0f}s):")
    for n, w in slowest:
        print(f"  {w:6.1f}s  {n}")
    if not only:
        # r10 (r9 verdict #3): persist the FULL per-query result next
        # to the driver's 50-query sample, so every query's latest
        # recorded hard signal is current-round (the driver's sample
        # left degree_histogram/media_features showing a stale r01
        # FAIL for 8 rounds after they were fixed)
        import json

        out = os.path.join(
            REPO, f"CORRECTNESS_full_r{_round_number():02d}.json"
        )
        with open(out, "w") as fh:
            json.dump(records, fh, indent=1, sort_keys=True)
        print(f"wrote {out} ({len(records)} queries)")
    print(f"{len(failed)} failures" if failed else "all oracle checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
