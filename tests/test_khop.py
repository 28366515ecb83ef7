"""Golden test: the reference's documented 2-hop example (KHOP.md:4-150,
fixture reproduced in FIXTURES.md F3)."""

from __future__ import annotations

import pytest

from neo4j_arrow_spark.operators.khop import khop, khop_flat

EDGES = [(0, 1), (0, 2), (0, 3), (1, 0), (1, 2), (1, 3), (4, 1), (5, 4)]

EXPECTED = {
    0: {(0, 1), (1, 0), (1, 2), (1, 3), (4, 1), (0, 2), (0, 3)},
    1: {(1, 0), (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (4, 1), (5, 4)},
    2: {(0, 1), (0, 2), (0, 3), (1, 0), (1, 2), (1, 3), (4, 1)},
    3: {(0, 1), (0, 2), (0, 3), (1, 0), (1, 2), (1, 3), (4, 1)},
    4: {(4, 1), (1, 0), (1, 2), (1, 3), (0, 1), (5, 4)},
    5: {(5, 4), (4, 1)},
}


@pytest.fixture(scope="module")
def golden(spark):
    nodes = spark.createDataFrame(
        [(i, ["User"]) for i in range(6)], "ID long, LABELS array<string>"
    )
    rels = spark.createDataFrame(
        [(s, d, "FOLLOWS", 1.0) for s, d in EDGES],
        "START_ID long, END_ID long, TYPE string, weight double",
    )
    return nodes, rels


def test_khop_flat_golden(golden):
    nodes, rels = golden
    out = khop_flat(nodes, rels)
    got: dict[int, set] = {}
    for r in out.collect():
        got.setdefault(r.origin, set()).add((r.src, r.dst))
    assert got == EXPECTED


def test_khop_wire_shape_and_chunking(golden):
    nodes, rels = golden
    out = khop(nodes, rels, list_size=3)
    assert out.columns == ["_origin_id_", "_source_ids_", "_target_ids_"]
    flattened: dict[int, set] = {}
    for r in out.collect():
        assert len(r._source_ids_) == len(r._target_ids_) <= 3
        flattened.setdefault(r._origin_id_, set()).update(
            zip(r._source_ids_, r._target_ids_)
        )
    assert flattened == EXPECTED


def test_khop_type_filter(golden):
    nodes, rels = golden
    # no edges of that type -> empty result, no error
    assert khop_flat(nodes, rels, filters=["NOPE"]).count() == 0


def test_khop_dedups_parallel_edges(spark):
    nodes = spark.createDataFrame([(i, ["U"]) for i in range(2)], "ID long, LABELS array<string>")
    rels = spark.createDataFrame(
        [(0, 1, "A", 1.0), (0, 1, "A", 2.0), (0, 1, "B", 3.0)],
        "START_ID long, END_ID long, TYPE string, weight double",
    )
    out = khop_flat(nodes, rels)
    got = {}
    for r in out.collect():
        got.setdefault(r.origin, set()).add((r.src, r.dst))
    assert got == {0: {(0, 1)}, 1: {(0, 1)}}


def _py_khop(edges, origins, k):
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    out = {}
    for o in origins:
        members = {o}
        for _ in range(k - 1):
            members = members | {m for x in members for m in nbrs.get(x, ())}
        es = {(s, d) for (s, d) in edges if s in members or d in members}
        if es:
            out[o] = es
    return out


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_khop_general_k_matches_python_oracle(golden, k):
    nodes, rels = golden
    got = {}
    for r in khop_flat(nodes, rels, k=k).collect():
        got.setdefault(r.origin, set()).add((r.src, r.dst))
    assert got == _py_khop(EDGES, set(range(6)), k)


def test_khop_k1_is_incident_edges(golden):
    nodes, rels = golden
    got = {}
    for r in khop_flat(nodes, rels, k=1).collect():
        got.setdefault(r.origin, set()).add((r.src, r.dst))
    assert got[5] == {(5, 4)}
    assert got[0] == {(0, 1), (0, 2), (0, 3), (1, 0)}


def test_khop_invalid_k(golden):
    nodes, rels = golden
    with pytest.raises(ValueError):
        khop_flat(nodes, rels, k=0)


def test_khop_node_id_remap(spark):
    """Client parity: khop(node_id=...) substitutes a node property for
    every exported id (origin and the pair lists)."""
    from neo4j_arrow_spark.operators.khop import khop

    nodes = spark.createDataFrame(
        [(1, ["N"], 101), (2, ["N"], 102), (3, ["N"], 103)],
        "ID long, LABELS array<string>, alt long",
    )
    rels = spark.createDataFrame(
        [(1, 2, "E"), (2, 3, "E")], "START_ID long, END_ID long, TYPE string"
    )
    out = khop(nodes, rels, node_id="alt").collect()
    ids = {r._origin_id_ for r in out}
    flat = {
        x for r in out for x in list(r._source_ids_) + list(r._target_ids_)
    }
    assert ids <= {101, 102, 103}
    assert flat <= {101, 102, 103}


def test_khop_node_id_remap_k2_exact(spark):
    """Remap correctness at k=2 against the identity-shifted property:
    the remapped flat set must equal the plain flat set shifted by +100
    on every column (regression for the remap-before-expand plan)."""
    from neo4j_arrow_spark.operators.khop import khop_flat

    nodes = spark.createDataFrame(
        [(i, ["N"], i + 100) for i in range(6)],
        "ID long, LABELS array<string>, alt long",
    )
    rels = spark.createDataFrame(
        [(0, 1, "E"), (1, 2, "E"), (2, 3, "E"), (3, 4, "E"), (4, 5, "E")],
        "START_ID long, END_ID long, TYPE string",
    )
    plain = {
        (r.origin, r.src, r.dst) for r in khop_flat(nodes, rels, k=2).collect()
    }
    remapped = {
        (r.origin, r.src, r.dst)
        for r in khop_flat(nodes, rels, k=2, node_id="alt").collect()
    }
    assert remapped == {(o + 100, s + 100, d + 100) for o, s, d in plain}


def test_khop_node_id_remap_k2_missing_property_fails(spark):
    """A referenced endpoint whose remap property is NULL fails the job
    (NOT_FOUND parity, GdsReadJob.java:281-283) — also at k=2, where the
    remap now rides the edge/member frames instead of the output."""
    from neo4j_arrow_spark.operators.khop import khop

    nodes = spark.createDataFrame(
        [(1, ["N"], 101), (2, ["N"], None), (3, ["N"], 103)],
        "ID long, LABELS array<string>, alt long",
    )
    rels = spark.createDataFrame(
        [(1, 2, "E"), (2, 3, "E")], "START_ID long, END_ID long, TYPE string"
    )
    with pytest.raises(Exception, match="missing or non-integral"):
        khop(nodes, rels, k=2, node_id="alt").collect()
