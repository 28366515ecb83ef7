"""Scale proof: run the heaviest registry queries at a synthesized sf1
(tools/make_scale.py) and compare wall time to the same queries at
sf0.1. VERDICT r3 item 8's bar: khop / pagerank / LSH within 15x of
their sf0.1 times at 10x the data, no OOM, no failure.

Writes BENCH_sf1.json: {query: {"sf0.1": s, "sf1": s, "ratio": r}}.

Usage: python tools/bench_scale.py [--sf1 /root/repo/.scale/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

HEAVY = [
    "khop_wire",
    "khop3_in_nation",
    "khop_in_nation",
    "pagerank3",
    "ppr_nation0",
    "connected_components",
    "triangle_counts",
    "sssp_nation0",
    "minhash_lsh_pairs",
    "neardup_clusters",
    "quality_filtered_corpus",
    "hits2_buysfrom",
    # round-4 operators
    "harmonic_centrality3",
    "betweenness_sampled3",
    "eigenvector3_buysfrom",
    "pagerank3_weighted",
    "pq_adc_topk",
    "bm25_topk",
    "event_funnel",
    # round-4 second-session operators
    "dup_ngram_spans",
    "link_prediction_nation0",
    "closeness_centrality3",
    "conductance_lpa2",
    "knn_graph_ivf",
    "local_clustering_coeff",
    "unigram_surprisal",
    # round-6 late additions: the recursive-CTE distinct-frontier shape
    # and the decorrelated pattern-comprehension aggregate
    "cypher_unbounded_relvar_hops",
    "cypher_pattern_comp_degree",
    # round-7: CALL {} derived-table forms (per-anchor windowed top-k,
    # keyed LEFT-join aggregate), deep bounded recursion, unbounded
    # varlength as an OPTIONAL LEFT-join branch, the ANF diameter
    # readout
    "cypher_call_topk_per_nation",
    "cypher_call_agg_per_nation",
    "cypher_varlength_deep",
    "cypher_optional_unbounded",
    "anf_effective_diameter",
    # round-8: the leading-OPTIONAL LEFT-join shape, per-hop-unrolled
    # path values, collect-postfix grouping, endpoint accessors
    "cypher_leading_optional_rel",
    "cypher_path_comprehension",
    "cypher_collect_indexed",
    "cypher_endpoint_accessor_props",
    # round-10: the landmark (pivot) scale path for the exact
    # closeness/harmonic family — k BFS waves, k·|V| state
    "closeness_landmark",
    # round-11: its harmonic twin (adds the k·max_hops histogram join)
    "harmonic_landmark",
]


def run(qs, spark, name: str, sf_dir: str, runs: int = 2) -> float:
    """bench.py's methodology (r6 — the old single-cold-run loop with
    no heap hygiene inflated late-sweep sf1 numbers up to 3.4x:
    ppr_nation0 measured 34s in-sweep vs 10.1s in a clean session):

    - untimed Python+JVM GC barrier before each query (localCheckpoint
      blocks and tenured garbage from earlier queries are reclaimed
      only after both collections),
    - per-run release of the query's persisted intermediates (without
      it, every pair-generator/persist across the 26-query sweep
      stays pinned in executor memory),
    - noop sink (count() can prune columns the real sink pays for),
    - best-of-N with one extra run while still improving >20% (C2
      compilation of wide codegen takes 2+ executions to kick in).
    """
    import gc

    from neo4j_arrow_spark.operators.dedup import unpersist_intermediates

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    best = float("inf")
    n, improving = 0, True
    while n < runs or (n < runs + 2 and improving and best > 2.0):
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        last = time.time() - t0
        improving = last < best * 0.8
        best = min(best, last)
        n += 1
        unpersist_intermediates(df)
        del df
    return round(best, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default="/root/repo/.scale/sf1")
    ap.add_argument("--out", default="/root/repo/BENCH_sf1.json")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names: re-measure just these and "
        "merge into an existing --out file",
    )
    args = ap.parse_args()

    from neo4j_arrow_spark.session import get_session
    import __spark_entry__ as entry

    spark = get_session()
    qs = entry.queries()
    out = {}
    todo = HEAVY
    if args.only:
        todo = [s.strip() for s in args.only.split(",") if s.strip()]
        if os.path.exists(args.out):
            with open(args.out) as f:
                out = json.load(f).get("queries", {})
    # warm the JVM on a cheap query first so sf0.1 numbers aren't
    # penalized by first-run codegen/IO
    qs["gds_node_scan"](spark, args.sf01).count()
    for name in todo:
        t_small = run(qs, spark, name, args.sf01)
        t_big = run(qs, spark, name, args.sf1)
        out[name] = {
            "sf0.1": t_small,
            "sf1": t_big,
            "ratio": round(t_big / t_small, 1) if t_small else None,
        }
        print(name, out[name], flush=True)
    # ratios whose >x10-looking growth is the DATA, not the plan —
    # measured in r6's intermediate row-count drill-down
    notes = {
        "neardup_clusters": (
            "inherent input growth: sf1 synthesis appends ' shardN' to 10 "
            "copies of each doc, so near-dup pairs grow 253 -> 245,478 "
            "(970x) and CC non-singleton nodes 471 -> 49,520 at 10x data; "
            "wall is sublinear in actual pair/cluster work"
        ),
        "khop_in_nation": (
            "output rows exactly 10.0x (10.27M -> 102.7M); ratio tracks "
            "output volume (r5 verdict, re-confirmed)"
        ),
        "minhash_lsh_pairs": (
            "same data artifact as neardup_clusters: the output pair list "
            "itself grows 970x (253 -> 245,478 rows) because every sf1 doc "
            "has ~9 near-identical shard copies; candidate pairs grow "
            "16,611 -> 1,855,735 (112x)"
        ),
        "closeness_centrality3": (
            "all-origins join-powers — the documented weak-at-scale shape; "
            "the registry carries the sampled twin (closeness_sampled) as "
            "the 100-TB default"
        ),
        "harmonic_centrality3": (
            "all-origins join-powers — same family as closeness_centrality3; "
            "harmonic_sampled is the scale path"
        ),
    }
    with open(args.out, "w") as f:
        json.dump({"mult": 10, "queries": out, "notes": notes}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
