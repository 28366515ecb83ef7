"""HyperANF sketch accuracy and determinism (operators/anf.py).

The registry oracle (harmonic_anf3 / anf_curve3) proves Spark and
DuckDB compute the SAME sketch — but both sides share the constants and
the emitter, so a semantic misreading of HLL itself would pass that
gate. These tests pin the estimates against EXACT neighborhood sizes
computed by plain Python BFS on fixture graphs: if the sketch stops
estimating cardinalities (merge bug, rho bug, estimator bug), the
relative-error assertions fail regardless of cross-engine agreement.
"""

from __future__ import annotations

import os
import sys
from collections import deque

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_arrow_spark.operators import anf  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from neo4j_arrow_spark.session import get_session

    return get_session(
        "test-anf", extra_conf={"spark.sql.shuffle.partitions": "8"}
    )


def exact_balls(edges: list[tuple[int, int]], max_hops: int) -> dict:
    """{node: [|ball_0|, ..., |ball_H|]} by BFS (undirected)."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for s in adj:
        dist = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            if dist[x] >= max_hops:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        out[s] = [
            sum(1 for d in dist.values() if d <= h) for h in range(max_hops + 1)
        ]
    return out


# a 60-node graph with two communities joined by a bridge — balls range
# from 4 to ~40 nodes, straddling the linear-counting/raw switchover
def _fixture_edges() -> list[tuple[int, int]]:
    edges = []
    for i in range(30):  # community A: ring + chords
        edges.append((i, (i + 1) % 30))
        if i % 3 == 0:
            edges.append((i, (i + 7) % 30))
    for i in range(31, 60):  # community B: star centered at 30
        edges.append((30, i))
    edges += [(0, 30)]  # bridge
    return sorted(set(edges))


def test_estimates_track_exact_ball_sizes(spark):
    edges = _fixture_edges()
    exact = exact_balls(edges, 3)
    edf = spark.createDataFrame(edges, "u long, v long")
    per_hop = anf.anf_sketch_by_hop(edf, max_hops=3)
    for h in (1, 2, 3):
        got = {r["node"]: r["est_q"] for r in per_hop[h].collect()}
        rel_errs = []
        for node, balls in exact.items():
            est = got[node] / anf.SCALE
            rel_errs.append(abs(est - balls[h]) / balls[h])
        rel_errs.sort()
        med = rel_errs[len(rel_errs) // 2]
        # m=32 -> ~18% std error; median across nodes should sit well
        # inside 2 sigma. A broken sketch is off by whole multiples.
        assert med < 0.36, f"hop {h}: median rel err {med:.2f}"
        assert max(rel_errs) < 1.0, f"hop {h}: worst rel err {max(rel_errs):.2f}"


def test_monotone_and_deterministic(spark):
    edges = _fixture_edges()
    edf = spark.createDataFrame(edges, "u long, v long")
    a = anf.harmonic_anf(edf, max_hops=3).orderBy("node").collect()
    b = anf.harmonic_anf(edf, max_hops=3).orderBy("node").collect()
    assert a == b  # bit-identical across runs (order-free bit_or merge)
    curve = {
        r["hop"]: r["nf_est_q"]
        for r in anf.anf_curve(edf, max_hops=3).collect()
    }
    assert curve[0] <= curve[1] <= curve[2] <= curve[3]


def test_harmonic_upper_bounds_reached(spark):
    # harmonic sum with all deltas at distance 1 equals reached; any
    # deeper distribution strictly reduces it -> harmonic <= reached
    edges = _fixture_edges()
    edf = spark.createDataFrame(edges, "u long, v long")
    for r in anf.harmonic_anf(edf, max_hops=3).collect():
        assert 0 <= r["harmonic_est_q"] <= r["reached_est_q"] + 2  # div floor
        assert r["total_hops_est_q"] >= r["reached_est_q"] - 2


def test_singleton_pair_graph(spark):
    # one edge: each node's ball_h = 2 for every h >= 1
    edf = spark.createDataFrame([(1, 2)], "u long, v long")
    per_hop = anf.anf_sketch_by_hop(edf, max_hops=2)
    for h in (1, 2):
        for r in per_hop[h].collect():
            est = r["est_q"] / anf.SCALE
            assert 1.0 <= est <= 3.5  # LC on tiny sets is near-exact
