"""r10 ADVICE regressions, all batch-write semantics:

1. (high) ID-keyed batch MERGE honors the explicit id — the merge key
   IS the node's identity, like single-statement MERGE — so re-running
   an identical batch is idempotent and RETURN resolves created rows.
2. (high) trailing RETURN after a multi-pattern batch CREATE projects
   ONLY the returned variable's created nodes; property access on a
   sibling created variable refuses at submit.
3. (low) a merge-key value the schema cast NULLs (string vs long
   column) surfaces as a type-mismatch line, not the misleading
   NULL-merge-key error.
4. (low) analysis errors inside the batch executors surface as
   targeted CypherUnsupported one-liners, never a raw Spark stack.
5. (low) clause-keyword-named batch keys / properties (``row.on``,
   ``n.set``) parse as property accesses, not clause breaks.
"""

from __future__ import annotations

import pytest

from neo4j_arrow_spark.api import Neo4jArrowSpark
from neo4j_arrow_spark.cypher import CypherUnsupported

LEAK_MARKERS = ("py4j", "org.apache.spark", "AnalysisException", "java.lang")


@pytest.fixture()
def aapi(spark):
    api = Neo4jArrowSpark(spark)
    nodes = spark.createDataFrame(
        [(1, ["P"], "seed", 0.0)],
        "ID long, LABELS array<string>, name string, price double",
    )
    api.catalog.register("adv", nodes, None, overwrite=True)
    return api


def _nodes(api, label="P"):
    return sorted(
        (r.ID, r.name)
        for r in api.cypher(
            f"MATCH (n:{label}) RETURN n.ID AS ID, n.name AS name",
            graph="adv",
        )
        .result(120)
        .collect()
    )


# -- 1. ID-keyed batch MERGE -----------------------------------------------


def test_id_keyed_batch_merge_honors_id_and_is_idempotent(aapi):
    q = (
        "UNWIND $b AS row MERGE (n:P {ID: row.id}) "
        "ON CREATE SET n.name = row.nm"
    )
    batch = [{"id": 500, "nm": "x"}, {"id": 501, "nm": "y"}]
    s1 = aapi.cypher(q, graph="adv", params={"b": batch}).result(120).collect()[0]
    assert s1.nodes_created == 2
    # identical re-run: every key now matches — nothing created
    s2 = aapi.cypher(q, graph="adv", params={"b": batch}).result(120).collect()[0]
    assert s2.nodes_created == 0
    assert _nodes(aapi) == [(1, "seed"), (500, "x"), (501, "y")]


def test_id_keyed_batch_merge_return_resolves_created_rows(aapi):
    rows = (
        aapi.cypher(
            "UNWIND $b AS row MERGE (n:P {ID: row.id}) "
            "ON CREATE SET n.name = row.nm RETURN n.ID AS id, n.name AS nm "
            "ORDER BY id",
            graph="adv",
            params={"b": [{"id": 1, "nm": "zzz"}, {"id": 900, "nm": "new"}]},
        )
        .result(120)
        .collect()
    )
    # matched row keeps its stored name; created row has the batch id
    assert [(r.id, r.nm) for r in rows] == [(1, "seed"), (900, "new")]


def test_id_keyed_batch_merge_refuses_cross_label_id_clash(aapi):
    # ID 1 exists as :P — creating it under :Q (outside the merge
    # pattern's label filter) would corrupt node identity
    with pytest.raises(RuntimeError, match="already exists"):
        aapi.cypher(
            "UNWIND $b AS row MERGE (n:Q {ID: row.id})",
            graph="adv",
            params={"b": [{"id": 1}]},
        ).result(120)


# -- 2. multi-pattern batch CREATE + RETURN --------------------------------


def test_batch_multi_pattern_create_return_scopes_to_variable(aapi):
    rows = (
        aapi.cypher(
            "UNWIND $b AS row CREATE (a:X {name: row.s}), (b:Y {name: row.t}) "
            "RETURN a.name AS nm ORDER BY nm",
            graph="adv",
            params={"b": [{"s": "ax", "t": "bx"}, {"s": "ay", "t": "by"}]},
        )
        .result(120)
        .collect()
    )
    assert [r.nm for r in rows] == ["ax", "ay"]
    # both variables' nodes WERE created
    assert [n for _, n in _nodes(aapi, "Y")] == ["bx", "by"]


def test_batch_create_return_sibling_variable_refuses(aapi):
    with pytest.raises(CypherUnsupported, match="created node variable"):
        aapi.cypher(
            "UNWIND $b AS row CREATE (a:X {name: row.s}), (b:Y {name: row.t}) "
            "RETURN b.name AS nm",
            graph="adv",
            params={"b": [{"s": "ax", "t": "bx"}]},
        )


# -- 3. cast-nulled merge key ----------------------------------------------


def test_type_mismatched_merge_key_is_targeted(aapi):
    try:
        aapi.cypher(
            "UNWIND $b AS row MERGE (n:P {ID: row.id})",
            graph="adv",
            params={"b": [{"id": "not-a-number"}]},
        ).result(120)
        pytest.fail("type-mismatched merge key did not fail")
    except RuntimeError as e:
        msg = str(e)
        assert "does not fit" in msg
        assert "NULL merge-key" not in msg
        for marker in LEAK_MARKERS:
            assert marker not in msg


def test_genuinely_null_merge_key_still_refused(aapi):
    with pytest.raises(RuntimeError, match="NULL merge-key"):
        aapi.cypher(
            "UNWIND $b AS row MERGE (n:P {ID: row.id})",
            graph="adv",
            params={"b": [{"id": None}]},
        ).result(120)


# -- 4. analysis errors in batch executors are wrapped ---------------------


def test_batch_where_unknown_reference_is_targeted(aapi):
    # `zz.name` binds no variable: the WHERE frame filter fails
    # analysis inside the job — the guard must one-liner it
    job = aapi.cypher(
        "UNWIND $b AS row MATCH (n:P {ID: row.id}) "
        "WHERE zz.name = 'x' SET n.name = row.nm",
        graph="adv",
        params={"b": [{"id": 1, "nm": "q"}]},
    )
    with pytest.raises(RuntimeError) as ei:
        job.result(120)
    msg = str(ei.value)
    assert "CypherUnsupported" in msg
    for marker in LEAK_MARKERS:
        assert marker not in msg, f"raw {marker} leak:\n{msg}"


# -- 5. keyword-named keys / properties ------------------------------------


def test_keyword_named_batch_key_and_property(aapi):
    kapi = aapi
    nodes = kapi.spark.createDataFrame(
        [(1, ["K"], "z", 0.0, 9)],
        "ID long, LABELS array<string>, sku string, on double, set long",
    )
    kapi.catalog.register("kw", nodes, None, overwrite=True)
    kapi.cypher(
        "UNWIND $b AS row MERGE (n:K {sku: row.sku}) "
        "ON MATCH SET n.on = row.on",
        graph="kw",
        params={"b": [{"sku": "z", "on": 7.0}]},
    ).result(120)
    rows = kapi.cypher(
        "MATCH (n:K) RETURN n.on AS o", graph="kw"
    ).result(120).collect()
    assert [r.o for r in rows] == [7.0]
    # batch node SET with a WHERE on a keyword-named property
    kapi.cypher(
        "UNWIND $b AS row MATCH (n:K {sku: row.sku}) "
        "WHERE n.set = 9 SET n.on = row.v",
        graph="kw",
        params={"b": [{"sku": "z", "v": 11.0}]},
    ).result(120)
    rows = kapi.cypher(
        "MATCH (n:K) RETURN n.on AS o", graph="kw"
    ).result(120).collect()
    assert [r.o for r in rows] == [11.0]


# -- props_set on CREATE property maps (r10 verdict #5) --------------------


def test_batch_create_props_set_counts_map_props(aapi):
    s = (
        aapi.cypher(
            "UNWIND $b AS row CREATE (n:L {name: row.x})",
            graph="adv",
            params={"b": [{"x": "a"}, {"x": "b"}, {"x": None}]},
        )
        .result(120)
        .collect()[0]
    )
    # one per non-NULL assignment (the None batch value is NOT set)
    assert (s.nodes_created, s.props_set) == (3, 2)


def test_chain_create_props_set_counts_node_and_rel_props(aapi):
    rels = aapi.spark.createDataFrame(
        [], "START_ID long, END_ID long, TYPE string, w double"
    )
    nodes = aapi.spark.createDataFrame(
        [(1, ["Z"], "z", 0.0)],
        "ID long, LABELS array<string>, name string, price double",
    )
    aapi.catalog.register("chainp", nodes, rels, overwrite=True)
    s = (
        aapi.cypher(
            "CREATE (a:X {ID: 10, name: 'a'})-[:T {w: 2.0}]->"
            "(b:Y {ID: 11, name: 'b', price: 1.0})",
            graph="chainp",
        )
        .result(120)
        .collect()[0]
    )
    # node map props (ID excluded) + rel map props: 1 + 2 + 1 = 4
    assert (s.nodes_created, s.rels_created, s.props_set) == (2, 1, 4)
