"""Synthesize a larger scale factor by replicating a driver dataset.

The driver ships sf0.001/0.01/0.1 only; the scale proof (VERDICT r3
item 8) needs an sf1-sized input. This generator writes a consistent
``mult``-fold copy of a source sf dir: copy ``i`` offsets every primary
and foreign key by ``i * OFFSET`` so joins stay exactly as selective as
the original, and the *nation* table is replicated too (copy ``i`` gets
nation keys ``+ i*25``), so the graph built on IN_NATION keeps its
per-nation neighborhood size — the realistic "10x data = 10x entities"
model under which output sizes scale linearly, rather than the
hub-inflation model where every per-origin neighborhood also grows 10x
and k-hop output grows 100x.

Document text gets a per-copy suffix token so the dedup families see a
10x corpus, not a corpus where every doc has 9 verbatim clones;
embeddings get a deterministic per-copy last-dimension nudge for the
same reason. region (5 rows) is shared.

Usage: python tools/make_scale.py [--src /root/testdata/sf0.1]
                                  [--dst /root/repo/.scale/sf1]
                                  [--mult 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

K_OFF = 10_000_000  # per-copy key offset (primary entity keys)
O_OFF = 100_000_000  # per-copy order/event id offset
N_OFF = 25  # nations per copy


def copy_sql(table: str, src: str, i: int) -> str:
    p = f"'{src}/{table}.parquet'"
    k, o, n = i * K_OFF, i * O_OFF, i * N_OFF
    return {
        "nation": f"""
            SELECT n_nationkey + {n} AS n_nationkey,
                   n_name || '#{i}' AS n_name, n_regionkey
            FROM {p}""",
        "customer": f"""
            SELECT c_custkey + {k} AS c_custkey, c_name,
                   c_nationkey + {n} AS c_nationkey, c_acctbal, c_mktsegment
            FROM {p}""",
        "supplier": f"""
            SELECT s_suppkey + {k} AS s_suppkey, s_name,
                   s_nationkey + {n} AS s_nationkey, s_acctbal
            FROM {p}""",
        "part": f"""
            SELECT p_partkey + {k} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM {p}""",
        "orders": f"""
            SELECT o_orderkey + {o} AS o_orderkey,
                   o_custkey + {k} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {p}""",
        "lineitem": f"""
            SELECT l_orderkey + {o} AS l_orderkey,
                   l_partkey + {k} AS l_partkey,
                   l_suppkey + {k} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {p}""",
        "events": f"""
            SELECT event_id + {o} AS event_id, ts,
                   user_id + {k} AS user_id, event_type, value, props
            FROM {p}""",
        "documents": f"""
            SELECT doc_id + {k} AS doc_id,
                   CASE WHEN {i} = 0 THEN text
                        ELSE text || ' shard{i}' END AS text,
                   lang, source,
                   n_chars + CASE WHEN {i} = 0 THEN 0
                             ELSE {len(" shard0")} END AS n_chars
            FROM {p}""",
        "embeddings": f"""
            SELECT vec_id + {k} AS vec_id,
                   CASE WHEN {i} = 0 THEN embedding
                        ELSE list_transform(embedding,
                            (x, j) -> CASE WHEN j = len(embedding)
                                      THEN CAST(x + {i} * 1e-3 AS FLOAT)
                                      ELSE x END)
                   END AS embedding,
                   label
            FROM {p}""",
    }[table]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.scale/sf1")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    # region is scale-invariant
    con.execute(
        f"COPY (SELECT * FROM '{args.src}/region.parquet') TO "
        f"'{args.dst}/region.parquet' (FORMAT PARQUET)"
    )
    scaled = (
        "nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    # Small row groups keep the files SPLITTABLE: Spark parallelizes a
    # parquet scan at row-group granularity, and DuckDB's default single
    # giant group made every documents-table operator run its regex-
    # heavy stage on ONE core of 32 (the r4 sf1 'superlinear' outliers —
    # quality_filtered_corpus 9.3x — were this input artifact, not a
    # plan defect). 5000 rows/group ≈ 64 groups at sf1 for documents.
    row_group = {"documents": 2000, "embeddings": 1000, "events": 50000}
    for t in scaled:
        union = "\nUNION ALL\n".join(
            copy_sql(t, args.src, i) for i in range(args.mult)
        )
        rg = row_group.get(t, 122880)
        con.execute(
            f"COPY ({union}) TO '{args.dst}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{args.dst}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
