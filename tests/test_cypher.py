from __future__ import annotations

import re

import pytest

from neo4j_arrow_spark.api import Neo4jArrowSpark
from neo4j_arrow_spark.cypher import (
    CypherSyntaxError,
    CypherUnsupported,
    cypher_to_sql,
    is_cypher,
)
from neo4j_arrow_spark.sources.tpch import load_tables
from neo4j_arrow_spark.sources.tpch_graph import graph_frames_from_tpch


def test_is_cypher_dispatch():
    assert is_cypher("MATCH (a) RETURN a")
    assert is_cypher("  match (a:X) RETURN a")
    assert not is_cypher("SELECT 1")


def test_node_scan_translation():
    sql = cypher_to_sql(
        "MATCH (c:Customer {name: 'Alice'}) RETURN c.name AS name, c.acctbal",
        "g_nodes", "g_rels",
    )
    assert "FROM g_nodes AS c" in sql
    assert "array_contains(c.LABELS, 'Customer')" in sql
    assert "c.name = 'Alice'" in sql
    assert "c.acctbal AS c_acctbal" in sql


def test_hop_translation_directions():
    sql = cypher_to_sql(
        "MATCH (a)-[r:PAYS]->(b) RETURN a.ID, b.ID", "n", "e"
    )
    assert "r.START_ID = a.ID" in sql and "b.ID = r.END_ID" in sql
    sql = cypher_to_sql("MATCH (a)<-[r:PAYS]-(b) RETURN a.ID", "n", "e")
    assert "r.END_ID = a.ID" in sql and "b.ID = r.START_ID" in sql


def test_aggregate_implicit_grouping():
    sql = cypher_to_sql(
        "MATCH (a:X)-[r:T]->(b) RETURN b.name AS n, count(*) AS c ORDER BY c DESC LIMIT 5",
        "n", "e",
    )
    assert "GROUP BY b.name" in sql  # underlying expr, not alias (ambiguity)
    assert "ORDER BY c DESC" in sql and "LIMIT 5" in sql


def test_unsupported_forms():
    # r8: `MATCH () RETURN 1` is now supported — computed RETURN items
    # auto-alias by their expression text (openCypher behavior)
    sql = cypher_to_sql("MATCH () RETURN 1", "n", "e")
    assert "AS `1`" in sql
    with pytest.raises(CypherUnsupported):
        # WITH still demands explicit aliases (openCypher requires)
        cypher_to_sql("MATCH (a:P) WITH a.x + 1 RETURN 1", "n", "e")
    with pytest.raises(CypherSyntaxError):
        cypher_to_sql("MATCH (a RETURN a.ID", "n", "e")


@pytest.fixture(scope="module")
def client(spark, sf_dir):
    c = Neo4jArrowSpark(spark)
    nodes, rels = graph_frames_from_tpch(
        spark, load_tables(spark, sf_dir, ("customer", "supplier", "nation", "orders", "lineitem"))
    )
    c.catalog.register("cy", nodes, rels)
    return c


def test_cypher_end_to_end_label_scan(client):
    job = client.cypher("MATCH (n:Nation) RETURN n.name AS name ORDER BY name LIMIT 3")
    got = [r.name for r in client.stream(job, 60).collect()]
    assert got == sorted(got) and len(got) == 3


def test_cypher_end_to_end_hop_agg(client):
    job = client.cypher(
        "MATCH (c:Customer)-[r:IN_NATION]->(n:Nation) "
        "RETURN n.name AS nation, count(*) AS members "
        "ORDER BY members DESC, nation ASC LIMIT 5"
    )
    rows = client.stream(job, 60).collect()
    assert len(rows) == 5
    assert rows[0].members >= rows[-1].members
    total = client.stream(
        client.cypher("MATCH (c:Customer)-[r:IN_NATION]->(n:Nation) RETURN count(*) AS c")
    ).collect()[0].c
    assert total == 150  # every customer has one nation edge


def test_cypher_where_and_props(client):
    job = client.cypher(
        "MATCH (c:Customer) WHERE c.acctbal > 5000.0 AND NOT c.acctbal > 9000.0 "
        "RETURN count(*) AS n"
    )
    n = client.stream(job, 60).collect()[0].n
    assert n > 0


def test_cypher_two_hop_chain(client):
    job = client.cypher(
        "MATCH (c:Customer)-[b:BUYS_FROM]->(s:Supplier)-[i:IN_NATION]->(n:Nation) "
        "RETURN n.name AS nation, count(*) AS edges ORDER BY nation"
    )
    rows = client.stream(job, 120).collect()
    assert sum(r.edges for r in rows) == 6000  # one per lineitem


def test_undirected_translation():
    sql = cypher_to_sql("MATCH (a)-[r:T]-(b) RETURN a.ID, b.ID", "n", "e")
    assert "UNION ALL" in sql and "END_ID AS START_ID" in sql


def test_cypher_undirected_end_to_end(client):
    # undirected matches each IN_NATION edge in both orientations:
    # 150 customer edges + 10 supplier edges ... from the nation side too
    job = client.cypher(
        "MATCH (n:Nation)-[r:IN_NATION]-(x) RETURN count(*) AS deg"
    )
    deg = client.stream(job, 60).collect()[0].deg
    job2 = client.cypher(
        "MATCH (x)-[r:IN_NATION]->(n:Nation) RETURN count(*) AS deg"
    )
    directed = client.stream(job2, 60).collect()[0].deg
    assert deg == directed  # every IN_NATION edge ends at a Nation node


def test_optional_match_translation():
    sql = cypher_to_sql(
        "MATCH (a:X) OPTIONAL MATCH (a)-[r:T]->(b) RETURN a.ID AS id, b.ID AS nbr",
        "n", "e",
    )
    assert "LEFT JOIN e AS r ON r.START_ID = a.ID AND r.TYPE = 'T'" in sql
    assert "LEFT JOIN n AS b ON b.ID = r.END_ID" in sql


def test_optional_match_requires_bound_anchor():
    with pytest.raises(CypherUnsupported):
        cypher_to_sql("MATCH (a:X) OPTIONAL MATCH (z)-[r:T]->(b) RETURN a.ID", "n", "e")


def test_optional_match_target_label_nested_join():
    # r6: a labeled optional target compiles to ONE nested
    # parenthesized join so a failed label test nulls the whole pattern
    sql = cypher_to_sql(
        "MATCH (a:X) OPTIONAL MATCH (a)-[r:T]->(b:Lab) RETURN a.ID AS i, b.ID AS j",
        "n", "e",
    )
    assert "LEFT JOIN (\n  e AS r" in sql
    assert "array_contains(b.LABELS, 'Lab')" in sql
    # multi-hop optional chains route through the same nested emission
    # (all-or-nothing clause semantics)
    sql2 = cypher_to_sql(
        "MATCH (a:X) OPTIONAL MATCH (a)-[:T]->(b)-[:T]->(c) "
        "RETURN a.ID AS i, c.ID AS j",
        "n", "e",
    )
    assert sql2.count("LEFT JOIN") == 1


def test_optional_match_end_to_end(client):
    # suppliers have IN_NATION edges; BOUGHT_BY does not exist -> all null
    job = client.cypher(
        "MATCH (s:Supplier) OPTIONAL MATCH (s)-[r:NO_SUCH_TYPE]->(x) "
        "RETURN s.ID AS sid, x.ID AS xid"
    )
    rows = client.stream(job, 60).collect()
    assert len(rows) == 10  # sf0.001 supplier count preserved by left join
    assert all(r.xid is None for r in rows)
    # and a real optional hop keeps matched targets
    job2 = client.cypher(
        "MATCH (s:Supplier) OPTIONAL MATCH (s)-[r:IN_NATION]->(x) "
        "RETURN count(*) AS n, count(x.ID) AS matched"
    )
    r = client.stream(job2, 60).collect()[0]
    assert r.n == 10 and r.matched == 10


def test_varlength_translation():
    sql = cypher_to_sql(
        "MATCH (a:X)-[:T*1..2]->(b) RETURN b.ID AS id, count(*) AS n", "n", "e"
    )
    assert "UNION ALL" in sql
    assert sql.count("JOIN e AS") == 3  # 1 + 2 rel joins across branches
    assert "b.ID AS b_ID" in sql and "GROUP BY b_ID" in sql
    # exact length *2: single branch, two joins, no union
    sql2 = cypher_to_sql("MATCH (a)-[:T*2]->(b) RETURN count(*) AS n", "n", "e")
    assert "UNION ALL" not in sql2 and sql2.count("JOIN e AS") == 2


def test_varlength_rejections():
    # binding the rel var compiles since r6 (size(r) splices to the
    # branch hop count; an unreferenced binding is plain legal Cypher)
    sql = cypher_to_sql(
        "MATCH (a)-[r:T*1..2]->(b) RETURN a.ID AS i, size(r) AS h", "n", "e"
    )
    # per-branch constants feed the marker column
    assert "1 AS _pathlen" in sql and "2 AS _pathlen" in sql
    with pytest.raises(CypherUnsupported, match="supports only"):
        cypher_to_sql("MATCH (a)-[r:T*1..2]->(b) RETURN r.w AS w", "n", "e")
    # deep bounds past the join-chain cap compile via the recursive CTE
    # since r7, stopped at EXACTLY the declared maxlen (no hop-guard
    # truncation)
    sql = cypher_to_sql(
        "MATCH (a)-[:T*1..9]->(b) RETURN DISTINCT b.ID AS i", "n", "e"
    )
    assert "WITH RECURSIVE" in sql and "_hops < 9" in sql
    # undirected bounded varlength is SUPPORTED since r6 (each hop joins
    # the natural+reverse union view) — assert it compiles, not rejects
    sql = cypher_to_sql("MATCH (a)-[:T*1..2]-(b) RETURN a.ID", "n", "e")
    assert "UNION ALL" in sql


def test_type_alternation_translation():
    sql = cypher_to_sql("MATCH (a)-[r:A|B]->(b) RETURN a.ID", "n", "e")
    assert "r.TYPE IN ('A', 'B')" in sql


def test_varlength_end_to_end(client):
    # chain graph: 1->2->3->4 (type T); *1..3 from node 1 = 3 paths
    spark = client.spark
    nodes = spark.createDataFrame(
        [(i, ["N"]) for i in (1, 2, 3, 4)], "ID long, LABELS array<string>"
    )
    rels = spark.createDataFrame(
        [(1, 2, "T"), (2, 3, "T"), (3, 4, "T")],
        "START_ID long, END_ID long, TYPE string",
    )
    client.gds_write_nodes("chain", nodes).result()
    client.gds_write_relationships("chain", rels).result()
    job = client.cypher(
        "MATCH (a {ID: 1})-[:T*1..3]->(b) RETURN b.ID AS target",
        graph="chain",
    )
    got = sorted(r.target for r in client.stream(job, 60).collect())
    assert got == [2, 3, 4]


def test_with_pipeline_translation():
    sql = cypher_to_sql(
        "MATCH (a:X)-[r:T]->(b) WITH b.name AS n, count(*) AS c "
        "WHERE c > 2 RETURN n, c ORDER BY c DESC",
        "n", "e",
    )
    assert ") AS _with" in sql and "WHERE (c > 2)" in sql
    assert "GROUP BY b.name" in sql  # inner aggregation


def test_with_scope_rules():
    with pytest.raises(CypherUnsupported):
        cypher_to_sql(
            "MATCH (a:X) WITH a.ID AS i RETURN a.name", "n", "e"
        )
    with pytest.raises(CypherSyntaxError):
        cypher_to_sql("MATCH (a:X) WITH a.ID AS i RETURN j", "n", "e")


def test_with_end_to_end(client):
    # nations with >=1 member, re-aggregated after WITH
    job = client.cypher(
        "MATCH (s:Supplier)-[r:IN_NATION]->(n:Nation) "
        "WITH n.name AS nation, count(*) AS sups "
        "RETURN count(*) AS n_nations, sum(sups) AS total",
        graph="cy",
    )
    r = client.stream(job, 60).collect()[0]
    assert r.total == 10  # all sf0.001 suppliers counted exactly once
    assert 1 <= r.n_nations <= 10


def test_multi_with_chain(client):
    job = client.cypher(
        "MATCH (c:Customer)-[r:IN_NATION]->(n:Nation) "
        "WITH n.name AS nation, count(*) AS members "
        "WITH nation, members WHERE members > 1 "
        "RETURN count(*) AS n_nations, sum(members) AS covered",
        graph="cy",
    )
    r = client.stream(job, 60).collect()[0]
    # sf0.001: 150 customers over nations; only multi-member nations
    assert r.covered <= 150 and r.n_nations >= 1


def test_match_after_with_translation():
    sql = cypher_to_sql(
        "MATCH (c:Customer)-[r:IN_NATION]->(n:Nation) "
        "WITH n AS nid, count(*) AS members WHERE members > 2 "
        "MATCH (nid)<-[r2:IN_NATION]-(s:Supplier) "
        "RETURN nid.name AS nation, members, count(*) AS sups",
        "gn", "ge",
    )
    assert "JOIN gn AS nid ON nid.ID = _scope0.nid" in sql
    assert "WHERE (members > 2)" in sql
    assert "GROUP BY nid.name, members" in sql


def test_match_after_with_fresh_anchor():
    # a fresh (non-alias) anchor compiles since r6: no props makes it
    # Cypher's cartesian product against the stage
    sql = cypher_to_sql(
        "MATCH (a:X) WITH a.ID AS i MATCH (z)-[r:T]->(b) RETURN i, count(*) AS k",
        "n", "e",
    )
    assert "CROSS JOIN n AS z" in sql
    # with a property equality it becomes a keyed re-join, the carried
    # alias qualified against the stage
    sql2 = cypher_to_sql(
        "MATCH (a:X) WITH a.name AS name MATCH (z:X {name: name}) "
        "RETURN count(*) AS k",
        "n", "e",
    )
    assert "z.name = _scope0.name" in sql2


def test_match_after_with_end_to_end(client):
    # nations that have customers -> count their suppliers
    job = client.cypher(
        "MATCH (c:Customer)-[r:IN_NATION]->(n:Nation) "
        "WITH n AS nid, count(*) AS members WHERE members > 0 "
        "MATCH (nid)<-[r2:IN_NATION]-(s:Supplier) "
        "RETURN count(*) AS pairs",
        graph="cy",
    )
    pairs = client.stream(job, 60).collect()[0].pairs
    # every supplier counted once per customer-bearing nation it is in
    assert pairs >= 1


def test_arithmetic_and_functions_translation():
    sql = cypher_to_sql(
        "MATCH (c:Customer) WHERE c.acctbal * 2 >= 1000 "
        "RETURN upper(c.name) AS uname, round(c.acctbal + 10, 1) AS score",
        "gn", "ge",
    )
    assert "UPPER(c.name) AS uname" in sql
    assert "ROUND((c.acctbal + 10), 1) AS score" in sql
    assert "((c.acctbal * 2) >= 1000)" in sql


def test_arithmetic_in_aggregate_and_precedence():
    sql = cypher_to_sql(
        "MATCH (c:Customer) RETURN sum(c.acctbal * 2 + 1) AS s", "gn", "ge"
    )
    assert "SUM(((c.acctbal * 2) + 1)) AS s" in sql


def test_computed_item_auto_alias():
    # r8: computed RETURN items auto-name by expression text
    # (openCypher behavior); WITH still requires an explicit alias
    sql = cypher_to_sql("MATCH (c:X) RETURN c.acctbal + 1", "gn", "ge")
    assert "AS `c.acctbal+1`" in sql
    duck = cypher_to_sql(
        "MATCH (c:X) RETURN c.acctbal + 1", "gn", "ge", dialect="duckdb"
    )
    assert 'AS "c.acctbal+1"' in duck
    with pytest.raises(CypherUnsupported):
        cypher_to_sql("MATCH (c:X) WITH c.acctbal + 1 RETURN 1", "gn", "ge")


def test_unknown_function_rejected():
    # cbrt joined the whitelist in r6; use a genuinely unknown name
    with pytest.raises((CypherUnsupported, CypherSyntaxError)):
        cypher_to_sql("MATCH (c:X) RETURN frobnicate(c.acctbal) AS r", "gn", "ge")


def test_arithmetic_end_to_end(client):
    job = client.cypher(
        "MATCH (c:Customer) WHERE length(c.name) > 0 "
        "RETURN upper(c.name) AS uname, round(c.acctbal / 2, 2) AS half "
        "ORDER BY uname LIMIT 5",
        graph="cy",
    )
    rows = client.stream(job, 60).collect()
    assert len(rows) == 5
    assert all(r.uname == r.uname.upper() for r in rows)


def test_unwind_collect_dialect_fork():
    q = (
        "MATCH (n:Customer) UNWIND labels(n) AS lbl "
        "RETURN lbl, collect(n.name) AS names"
    )
    spark_sql = cypher_to_sql(q, "gn", "ge", dialect="spark")
    duck_sql = cypher_to_sql(q, "gn", "ge", dialect="duckdb")
    assert "LATERAL VIEW explode(n.LABELS) _u0 AS lbl" in spark_sql
    assert "array_join(sort_array(collect_list(n.name)), ',')" in spark_sql
    assert "CROSS JOIN unnest(n.LABELS) AS _u0(lbl)" in duck_sql
    # r9: the duck emission FILTERs NULLs and COALESCEs the empty
    # aggregate to '' (Spark collect_list / openCypher null-skipping)
    assert (
        "COALESCE(array_to_string(list_sort(list(n.name) "
        "FILTER ((n.name) IS NOT NULL)), ','), '')" in duck_sql
    )
    # everything else must be dialect-neutral: strip the two forked
    # fragments and the queries agree
    assert spark_sql.count("GROUP BY lbl") == duck_sql.count("GROUP BY lbl") == 1


def test_unwind_requires_labels_and_bound_var():
    with pytest.raises(CypherUnsupported):
        cypher_to_sql("MATCH (n:X) UNWIND foo(n) AS a RETURN a", "gn", "ge")
    with pytest.raises(CypherSyntaxError):
        cypher_to_sql("MATCH (n:X) UNWIND labels(z) AS a RETURN a", "gn", "ge")


def test_unwind_feeds_with_pipeline():
    # r6: UNWIND before the first WITH feeds the pipeline's first stage
    sql = cypher_to_sql(
        "MATCH (n:X) UNWIND labels(n) AS a WITH a AS b RETURN b",
        "gn", "ge",
    )
    assert "LATERAL VIEW explode" in sql and "a AS b" in sql


def test_unwind_after_with():
    # supported since r6: a lateral explode over the stage rows
    sql = cypher_to_sql(
        "MATCH (n:X) WITH n.ID AS i UNWIND [1, 2] AS x RETURN i, x",
        "gn", "ge",
    )
    assert "LATERAL VIEW explode" in sql
    # labels(var) is correctly out of scope past the WITH boundary
    with pytest.raises(CypherSyntaxError, match="unbound"):
        cypher_to_sql(
            "MATCH (n:X) WITH n.ID AS i UNWIND labels(n) AS x RETURN x",
            "gn", "ge",
        )


def test_unwind_end_to_end(client):
    job = client.cypher(
        "MATCH (n)-[r:IN_NATION]->(m:Nation) UNWIND labels(n) AS lbl "
        "RETURN lbl, count(*) AS n ORDER BY lbl",
        graph="cy",
    )
    rows = client.stream(job, 60).collect()
    got = {r.lbl: r.n for r in rows}
    # every customer carries Customer + its mktsegment label; suppliers
    # carry Supplier — label counts cover both node families
    assert got["Customer"] == 150 and got["Supplier"] == 10


def test_shortest_path_min_over_lengths(spark):
    from neo4j_arrow_spark.cypher import cypher_to_sql

    # diamond: 1 -> 2 -> 4 and 1 -> 4 direct; shortest 1->4 is 1 hop
    nodes = spark.createDataFrame(
        [(i, ["N"], f"n{i}") for i in (1, 2, 4)],
        "ID long, LABELS array<string>, name string",
    )
    rels = spark.createDataFrame(
        [(1, 2, "E"), (2, 4, "E"), (1, 4, "E")],
        "START_ID long, END_ID long, TYPE string",
    )
    nodes.createOrReplaceTempView("sp_nodes")
    rels.createOrReplaceTempView("sp_rels")
    sql = cypher_to_sql(
        "MATCH p = shortestPath((a:N)-[:E*1..3]->(b:N)) "
        "RETURN a.ID AS src, b.ID AS dst, length(p) AS hops",
        "sp_nodes",
        "sp_rels",
    )
    got = {(r.src, r.dst): r.hops for r in spark.sql(sql).collect()}
    assert got[(1, 4)] == 1      # direct edge wins over the 2-hop path
    assert got[(1, 2)] == 1 and got[(2, 4)] == 1


def test_shortest_path_without_length_dedups(spark):
    from neo4j_arrow_spark.cypher import cypher_to_sql

    sql = cypher_to_sql(
        "MATCH p = shortestPath((a:N)-[:E*1..3]->(b:N)) "
        "RETURN a.ID AS src, b.ID AS dst",
        "sp_nodes",
        "sp_rels",
    )
    rows = spark.sql(sql).collect()
    # one row per endpoint pair even when two path lengths exist
    assert len(rows) == len({(r.src, r.dst) for r in rows})


def test_shortest_path_rejections():
    import pytest as _pytest

    from neo4j_arrow_spark.cypher import CypherUnsupported, cypher_to_sql

    with _pytest.raises(CypherUnsupported, match="variable-length"):
        cypher_to_sql(
            "MATCH p = shortestPath((a:N)-[:E]->(b:N)) RETURN a",
            "n", "r",
        )
    with _pytest.raises(CypherUnsupported, match="WHERE"):
        cypher_to_sql(
            "MATCH p = shortestPath((a:N)-[:E*1..2]->(b:N)) "
            "WHERE length(p) > 1 RETURN a",
            "n", "r",
        )
    # plain path vars over BOUNDED varlength are supported since r6;
    # only unbounded (*) still requires shortestPath
    with _pytest.raises(CypherUnsupported, match="shortestPath"):
        cypher_to_sql(
            "MATCH p = (a:N)-[:E*]->(b:N) RETURN length(p) AS lp", "n", "r"
        )


def test_exists_pattern_rejections():
    import pytest as _pytest

    from neo4j_arrow_spark.cypher import CypherUnsupported, cypher_to_sql

    with _pytest.raises(CypherUnsupported, match="bound"):
        cypher_to_sql(
            "MATCH (a:N) WHERE EXISTS((z)-[:E]->(b)) RETURN a", "n", "r"
        )
    with _pytest.raises(CypherUnsupported, match="variable-length"):
        cypher_to_sql(
            "MATCH (a:N) WHERE EXISTS((a)-[:E*1..2]->(b)) RETURN a", "n", "r"
        )


def test_exists_semi_anti_semantics(spark):
    from neo4j_arrow_spark.cypher import cypher_to_sql

    nodes = spark.createDataFrame(
        [(1, ["N"]), (2, ["N"]), (3, ["N"])], "ID long, LABELS array<string>"
    )
    rels = spark.createDataFrame(
        [(1, 2, "E")], "START_ID long, END_ID long, TYPE string"
    )
    nodes.createOrReplaceTempView("ex_nodes")
    rels.createOrReplaceTempView("ex_rels")
    semi = spark.sql(
        cypher_to_sql(
            "MATCH (a:N) WHERE EXISTS((a)-[:E]->(b)) RETURN a.ID AS id",
            "ex_nodes",
            "ex_rels",
        )
    ).collect()
    assert {r.id for r in semi} == {1}
    anti = spark.sql(
        cypher_to_sql(
            "MATCH (a:N) WHERE NOT EXISTS((a)-[:E]->(b)) RETURN a.ID AS id",
            "ex_nodes",
            "ex_rels",
        )
    ).collect()
    assert {r.id for r in anti} == {2, 3}
    # undirected checks both orientations
    und = spark.sql(
        cypher_to_sql(
            "MATCH (a:N) WHERE EXISTS((a)-[:E]-(b)) RETURN a.ID AS id",
            "ex_nodes",
            "ex_rels",
        )
    ).collect()
    assert {r.id for r in und} == {1, 2}


def test_cypher_params_transpile_markers():
    from neo4j_arrow_spark.cypher import cypher_to_sql

    used: set = set()
    sql = cypher_to_sql(
        "MATCH (c:Customer) WHERE c.acctbal > $minbal AND c.name = $nm "
        "RETURN c.ID AS id",
        "n",
        "r",
        params_out=used,
    )
    assert used == {"minbal", "nm"}
    assert ":minbal" in sql and ":nm" in sql and "$" not in sql
    duck = cypher_to_sql(
        "MATCH (c:Customer) WHERE c.acctbal > $minbal RETURN c.ID AS id",
        "n",
        "r",
        dialect="duckdb",
    )
    assert "$minbal" in duck


def test_cypher_params_end_to_end(client):
    job = client.cypher(
        "MATCH (c:Customer) WHERE c.acctbal > $minbal RETURN count(*) AS n",
        params={"minbal": 5000.0},
        graph="cy",
    )
    n_param = client.stream(job, 60).collect()[0].n
    job2 = client.cypher(
        "MATCH (c:Customer) WHERE c.acctbal > 5000.0 RETURN count(*) AS n",
        graph="cy",
    )
    assert n_param == client.stream(job2, 60).collect()[0].n > 0


def test_cypher_params_missing_binding_rejected(client):
    with pytest.raises(ValueError, match="unbound parameters.*minbal"):
        client.cypher(
            "MATCH (c:Customer) WHERE c.acctbal > $minbal RETURN count(*) AS n",
            graph="cy",
        )


def test_cypher_params_in_node_props(client):
    job = client.cypher(
        "MATCH (n:Nation {name: $nm})<-[r:IN_NATION]-(c:Customer) "
        "RETURN count(*) AS n",
        params={"nm": "NATION_3"},
        graph="cy",
    )
    assert client.stream(job, 60).collect()[0].n > 0


# -- UNION ----------------------------------------------------------------

def test_union_transpile_shapes():
    sql = cypher_to_sql(
        "MATCH (n:Nation) RETURN n.name AS name "
        "UNION ALL MATCH (s:Supplier) RETURN s.name AS name",
        "n", "e",
    )
    assert "UNION ALL" in sql and sql.count("SELECT") == 2
    sql = cypher_to_sql(
        "MATCH (n:Nation) RETURN n.name AS name "
        "UNION MATCH (s:Supplier) RETURN s.name AS name",
        "n", "e",
    )
    assert "\nUNION\n" in sql


def test_union_mismatched_columns_rejected():
    with pytest.raises(CypherUnsupported, match="same column names"):
        cypher_to_sql(
            "MATCH (n:Nation) RETURN n.name AS a "
            "UNION MATCH (s:Supplier) RETURN s.name AS b",
            "n", "e",
        )


def test_union_inside_string_literal_not_split():
    sql = cypher_to_sql(
        "MATCH (n:Nation {name: 'UNION JACK'}) RETURN n.ID AS id", "n", "e"
    )
    assert "UNION JACK" in sql and "\nUNION\n" not in sql


def test_union_end_to_end(client):
    # distinct union dedups ids that appear via both arms
    job = client.cypher(
        "MATCH (c:Customer)-[r:IN_NATION]->(n:Nation) RETURN c.ID AS id "
        "UNION MATCH (c2:Customer)-[b:BUYS_FROM]->(s:Supplier) "
        "RETURN c2.ID AS id",
        graph="cy",
    )
    distinct_rows = client.stream(job, 60).count()
    job_all = client.cypher(
        "MATCH (c:Customer)-[r:IN_NATION]->(n:Nation) RETURN c.ID AS id "
        "UNION ALL MATCH (c2:Customer)-[b:BUYS_FROM]->(s:Supplier) "
        "RETURN c2.ID AS id",
        graph="cy",
    )
    all_rows = client.stream(job_all, 60).count()
    assert 0 < distinct_rows < all_rows


def test_union_params_collected_across_arms(client):
    job = client.cypher(
        "MATCH (c:Customer) WHERE c.acctbal > $lo RETURN c.ID AS id "
        "UNION ALL MATCH (s:Supplier) WHERE s.acctbal > $hi RETURN s.ID AS id",
        params={"lo": 9000.0, "hi": 9990.0},
        graph="cy",
    )
    assert client.stream(job, 60).count() > 0


# -- plain path variables --------------------------------------------------

def test_path_var_length_and_nodes_transpile():
    sql = cypher_to_sql(
        "MATCH p = (a:Customer)-[r:BUYS_FROM]->(b) "
        "RETURN nodes(p) AS ids, length(p) AS hops",
        "n", "e",
    )
    assert "concat_ws(',', a.ID, b.ID) AS ids" in sql
    assert "(0 + 1) AS hops" in sql


def test_path_var_length_groups_as_expression_not_ordinal():
    sql = cypher_to_sql(
        "MATCH p = (a)-[r:T]->(b)-[r2:T]->(c) "
        "RETURN length(p) AS hops, count(*) AS n",
        "n", "e",
    )
    # (0 + 2), never a bare 2 that GROUP BY would read as an ordinal
    assert "GROUP BY (0 + 2)" in sql


def test_path_var_rejections():
    # bounded-varlength path vars compile since r6; binding the rel
    # variable itself (a list of relationships) is still rejected
    cypher_to_sql(
        "MATCH p = (a)-[r:T*1..2]->(b) RETURN length(p) AS h", "n", "e"
    )  # rel + path var both bound, rel unreferenced: legal since r6
    # r8: bare `RETURN p` compiles to the path struct {nodes, length},
    # aliased by the path variable's own name
    sql_p = cypher_to_sql("MATCH p = (a)-[r:T]->(b) RETURN p", "n", "e")
    assert "named_struct" in sql_p and " AS p" in sql_p
    # non-item uses of the path variable still reject
    with pytest.raises(CypherUnsupported, match="path variable"):
        cypher_to_sql(
            "MATCH p = (a)-[r:T]->(b) RETURN p.weird AS x", "n", "e"
        )
    # r8: unaliased path-function items auto-alias like any computed
    # item (the name reflects the spliced emission, not the source
    # text — write AS for a pretty column name)
    sql = cypher_to_sql("MATCH p = (a)-[r:T]->(b) RETURN nodes(p)", "n", "e")
    assert "concat_ws" in sql


def test_path_var_end_to_end(client):
    job = client.cypher(
        "MATCH p = (c:Customer)-[b:BUYS_FROM]->(s:Supplier) "
        "WHERE c.acctbal > 9900.0 "
        "RETURN nodes(p) AS ids, length(p) AS hops",
        graph="cy",
    )
    rows = client.stream(job, 60).collect()
    assert rows and all(r.hops == 1 for r in rows)
    assert all("," in r.ids for r in rows)


# -- map projections -------------------------------------------------------

def test_map_projection_transpile_both_dialects():
    q = "MATCH (n:Nation) RETURN n {.ID, .name} AS props"
    assert "named_struct('ID', n.ID, 'name', n.name)" in cypher_to_sql(
        q, "gn", "gr", "spark"
    )
    assert "struct_pack(ID := n.ID, name := n.name)" in cypher_to_sql(
        q, "gn", "gr", "duckdb"
    )


def test_map_projection_end_to_end(client):
    job = client.cypher(
        "MATCH (n:Nation) RETURN n {.ID, .name} AS props "
        "ORDER BY props LIMIT 2",
        graph="cy",
    )
    rows = client.stream(job, 60).collect()
    assert len(rows) == 2
    assert rows[0].props.ID is not None and rows[0].props.name


# -- id()/labels() graph accessors ----------------------------------------

def test_id_labels_fn_transpile():
    q = "MATCH (n:Customer) RETURN id(n) AS nid, labels(n) AS lbls"
    s1 = cypher_to_sql(q, "gn", "gr", "spark")
    assert "n.ID AS nid" in s1
    assert "array_join(sort_array(n.LABELS), ',')" in s1
    s2 = cypher_to_sql(q, "gn", "gr", "duckdb")
    assert "array_to_string(list_sort(n.LABELS), ',')" in s2


def test_id_labels_fn_end_to_end(client):
    job = client.cypher(
        "MATCH (n:Nation) RETURN labels(n) AS lbls, count(*) AS m",
        graph="cy",
    )
    rows = client.stream(job, 60).collect()
    assert rows == [("Nation", 25)] or rows[0].lbls == "Nation"


# -- string predicates + casts --------------------------------------------

def test_string_predicates_transpile():
    sql = cypher_to_sql(
        "MATCH (n) WHERE n.name STARTS WITH 'ab' AND n.name ENDS WITH 'yz' "
        "AND n.name CONTAINS 'm' RETURN n.ID AS id",
        "gn", "gr",
    )
    assert "substring(n.name, 1, 2) = 'ab'" in sql
    assert "substring(n.name, length(n.name) - 1, 2) = 'yz'" in sql
    assert "instr(n.name, 'm') > 0" in sql


def test_string_predicate_expression_rhs():
    # expression RHS compiles to the runtime-length substring-equality
    # shape (was literal-only before round 6)
    sql = cypher_to_sql(
        "MATCH (n) WHERE n.name STARTS WITH n.other RETURN n.ID AS i",
        "gn", "gr",
    )
    assert "substring(n.name, 1, length(n.other)) = n.other" in sql


def test_cast_functions_dialect_split():
    q = "MATCH (n) RETURN toString(n.ID) AS s, toFloat(n.ID) AS f"
    assert "CAST(n.ID AS STRING)" in cypher_to_sql(q, "gn", "gr", "spark")
    assert "CAST(n.ID AS VARCHAR)" in cypher_to_sql(q, "gn", "gr", "duckdb")
    assert "CAST(n.ID AS DOUBLE)" in cypher_to_sql(q, "gn", "gr", "spark")


def test_string_predicates_end_to_end(client):
    job = client.cypher(
        "MATCH (n:Nation) WHERE n.name STARTS WITH 'NATION_1' "
        "RETURN count(*) AS n",
        graph="cy",
    )
    # NATION_1 and NATION_10..19 = 11 of the 25 synthetic nations
    assert client.stream(job, 60).collect()[0].n == 11


# -- rel-property patterns + per-clause OPTIONAL WHERE ---------------------

def test_rel_props_transpile_and_reject_varlength():
    sql = cypher_to_sql(
        "MATCH (a)-[r:T {weight: 2.5, kind: 'x'}]->(b) RETURN a.ID AS i",
        "n", "e",
    )
    assert "r.weight = 2.5" in sql and "r.kind = 'x'" in sql
    # r6: props on a varlength segment apply to EVERY hop (golden
    # g111-g113 pin the semantics; here just check the emission)
    vsql = cypher_to_sql(
        "MATCH (a)-[:T*1..2 {w: 1}]->(b) RETURN count(*) AS c", "n", "e"
    )
    assert vsql.count(".w = 1") >= 2  # per-hop equality in the L2 branch


def test_optional_where_is_null_preserving(client):
    # impossible filter: every nation still appears, with count 0
    job = client.cypher(
        "MATCH (n:Nation) OPTIONAL MATCH (n)<-[r:IN_NATION]-(c) "
        "WHERE c.acctbal > 99999999.0 "
        "RETURN n.ID AS id, count(c.ID) AS m",
        graph="cy",
    )
    rows = client.stream(job, 60).collect()
    assert len(rows) == 25 and all(r.m == 0 for r in rows)


def test_optional_varlength_bounded_supported():
    # bounded varlength in OPTIONAL MATCH: the length-union derived
    # table and the target node join as ONE nested parenthesized LEFT
    # join (r7 — target label/prop conds ride the inner ON, so a failed
    # test nulls the clause instead of dropping or ghost-extending)
    sql = cypher_to_sql(
        "MATCH (n:Nation) OPTIONAL MATCH (n)<-[:T*1..2]-(c) "
        "RETURN n.ID AS i, count(c.ID) AS reach",
        "n", "e",
    )
    assert "LEFT JOIN ((SELECT _h1.END_ID AS _oa" in sql
    assert "UNION ALL" in sql
    assert "JOIN n AS c ON c.ID = _ovl0._ob" in sql


def test_optional_varlength_unbounded_supported():
    # r7: unbounded varlength under OPTIONAL MATCH compiles to a
    # distinct-frontier recursive CTE nested as the LEFT-join branch
    sql = cypher_to_sql(
        "MATCH (n:Nation) OPTIONAL MATCH (n)<-[:T*]-(c) "
        "RETURN n.ID AS i, count(c.ID) AS reach",
        "n", "e",
    )
    # the derived table opens with the recursive CTE (the spark dialect
    # carries the driver-loop marker comment in front of the keyword)
    assert re.search(
        r"LEFT JOIN \(\((?:/\*rec\[_ovlp0\]\*/)?WITH RECURSIVE _ovlp0", sql
    )
    assert "SELECT DISTINCT _oa, _ob FROM _ovlp0" in sql


# -- comma-separated patterns / cycles -------------------------------------

def test_comma_patterns_shared_var_joins():
    sql = cypher_to_sql(
        "MATCH (c:Customer)-[r1:IN_NATION]->(n:Nation), "
        "(s:Supplier)-[r2:IN_NATION]->(n) RETURN count(*) AS c",
        "gn", "gr",
    )
    # second chain's rel pins BOTH endpoint keys (shared n is bound)
    assert "r2.START_ID = s.ID AND n.ID = r2.END_ID" in sql
    # n introduced exactly once
    assert sql.count("gn AS n") == 1


def test_comma_patterns_cartesian_when_disjoint():
    sql = cypher_to_sql("MATCH (a:Nation), (b:Supplier) RETURN count(*) AS c", "gn", "gr")
    assert "CROSS JOIN gn AS b" in sql


def test_cycle_within_one_chain():
    sql = cypher_to_sql(
        "MATCH (a:Customer)-[x:BUYS_FROM]->(s:Supplier)<-[y:BUYS_FROM]-(a) "
        "RETURN count(*) AS c", "gn", "gr",
    )
    # the closing rel joins on both bound endpoints, no re-introduction
    assert sql.count("gn AS a") == 1
    assert "y.END_ID = s.ID AND a.ID = y.START_ID" in sql


def test_comma_pattern_rejections():
    with pytest.raises(CypherUnsupported):  # varlength + comma
        cypher_to_sql(
            "MATCH (a:X)-[r:T*1..2]->(b), (c:Y) RETURN count(*) AS c", "gn", "gr"
        )
    with pytest.raises(CypherUnsupported):  # rel var bound twice
        cypher_to_sql(
            "MATCH (a)-[r:T]->(b), (c)-[r:U]->(d) RETURN count(*) AS c", "gn", "gr"
        )
    with pytest.raises(CypherUnsupported):  # comma outside main MATCH
        cypher_to_sql(
            "MATCH (n:Nation) OPTIONAL MATCH (n)<-[r:T]-(s), (q:Z) "
            "RETURN n.ID AS id", "gn", "gr"
        )
    with pytest.raises(CypherUnsupported):  # cycle on a varlength chain
        cypher_to_sql(
            "MATCH (a:X)-[r:T*1..2]->(a) RETURN count(*) AS c", "gn", "gr"
        )


def test_comma_patterns_end_to_end(client):
    rows = client.stream(
        client.cypher(
            "MATCH (c:Customer)-[r1:IN_NATION]->(n:Nation), "
            "(s:Supplier)-[r2:IN_NATION]->(n) "
            "RETURN n.name AS nation, count(*) AS pairs "
            "ORDER BY pairs DESC, nation LIMIT 3",
            graph="cy",
        )
    ).collect()
    assert len(rows) == 3 and rows[0].pairs >= rows[-1].pairs


def test_cycle_end_to_end_matches_expanded_form(client):
    # closed triangle (c buys from s, both in n) must equal the same
    # count computed by the equivalent WHERE-joined two-chain query
    cyc = client.stream(
        client.cypher(
            "MATCH (c:Customer)-[b:BUYS_FROM]->(s:Supplier)-[i:IN_NATION]->"
            "(n:Nation), (c)-[i2:IN_NATION]->(n) RETURN count(*) AS c",
            graph="cy",
        )
    ).collect()[0].c
    two = client.stream(
        client.cypher(
            "MATCH (c:Customer)-[i2:IN_NATION]->(n:Nation), "
            "(c)-[b:BUYS_FROM]->(s:Supplier), (s)-[i:IN_NATION]->(n) "
            "RETURN count(*) AS c",
            graph="cy",
        )
    ).collect()[0].c
    assert cyc == two > 0


# -- scalar/aggregate function additions -----------------------------------

def test_type_fn_transpile():
    sql = cypher_to_sql(
        "MATCH (a)-[r:A|B]->(b) RETURN type(r) AS t, count(*) AS c", "gn", "gr"
    )
    assert "r.TYPE AS t" in sql and "GROUP BY r.TYPE" in sql


def test_toupper_tolower_map_to_shared_names():
    sql = cypher_to_sql("MATCH (a:X) RETURN toUpper(a.name) AS u", "gn", "gr")
    assert "UPPER(a.name)" in sql
    sql = cypher_to_sql("MATCH (a:X) RETURN toLower(a.name) AS l", "gn", "gr")
    assert "LOWER(a.name)" in sql


def test_stdev_percentile_dialect_split():
    q = ("MATCH (a:X) RETURN stDev(a.acctbal) AS sd, "
         "stDevP(a.acctbal) AS sdp, percentileCont(a.acctbal, 0.5) AS med")
    s = cypher_to_sql(q, "gn", "gr", "spark")
    assert "STDDEV_SAMP" in s and "STDDEV_POP" in s and "percentile(a.acctbal, 0.5)" in s
    d = cypher_to_sql(q, "gn", "gr", "duckdb")
    assert "quantile_cont(a.acctbal, 0.5)" in d


def test_type_fn_end_to_end(client):
    rows = client.stream(
        client.cypher(
            "MATCH (a)-[r:IN_NATION|BUYS_FROM]->(b) "
            "RETURN type(r) AS t, count(*) AS c ORDER BY t",
            graph="cy",
        )
    ).collect()
    assert [r.t for r in rows] == ["BUYS_FROM", "IN_NATION"]
    assert rows[0].c == 6000 and rows[1].c == 160


# -- UNWIND over list literals and params ----------------------------------

def test_unwind_literal_only_query():
    sql = cypher_to_sql("UNWIND [1, 2] AS x RETURN x AS v", "gn", "gr")
    assert "explode(array(1, 2))" in sql and "FROM (SELECT" in sql
    d = cypher_to_sql("UNWIND [1, 2] AS x RETURN x AS v", "gn", "gr", "duckdb")
    assert "unnest([1, 2])" in d


def test_unwind_param_with_match():
    sql = cypher_to_sql(
        "UNWIND $ids AS w MATCH (n:Nation) WHERE n.ID = w "
        "RETURN n.ID AS id", "gn", "gr",
    )
    assert "LATERAL VIEW explode(:ids) _u0 AS w" in sql
    d = cypher_to_sql(
        "UNWIND $ids AS w MATCH (n:Nation) WHERE n.ID = w "
        "RETURN n.ID AS id", "gn", "gr", "duckdb",
    )
    assert "CROSS JOIN unnest($ids) AS _u0(w)" in d


def test_unwind_rejections():
    with pytest.raises(CypherUnsupported):
        cypher_to_sql("UNWIND [] AS x RETURN x AS v", "gn", "gr")
    with pytest.raises(CypherUnsupported):
        cypher_to_sql(
            "MATCH (n:X) UNWIND nodes(n) AS x RETURN x AS v", "gn", "gr"
        )


def test_unwind_param_end_to_end(client):
    rows = client.stream(
        client.cypher(
            "UNWIND $ids AS w MATCH (n:Nation) WHERE n.ID = w "
            "RETURN n.ID AS id ORDER BY id",
            graph="cy",
            params={"ids": [2000001, 2000002, 9999999]},
        )
    ).collect()
    assert [r.id for r in rows] == [2000001, 2000002]  # missing key drops


# -- consecutive MATCH clauses ----------------------------------------------

def test_consecutive_match_clauses_join_on_shared_var():
    q = ("MATCH (c:Customer)-[r1:IN_NATION]->(n:Nation) "
         "MATCH (s:Supplier)-[r2:IN_NATION]->(n) "
         "RETURN n.name AS nation, count(*) AS pairs")
    sql = cypher_to_sql(q, "gn", "gr")
    assert sql.count("gn AS n") == 1
    assert "r2.START_ID = s.ID AND n.ID = r2.END_ID" in sql
    # separate MATCH clauses: NO relationship-uniqueness predicate
    # (Cypher scopes the rule to one clause)
    assert "NOT (" not in sql
    # the comma spelling is one clause, so r1/r2 (same type, same
    # direction) get the pairwise not-same-edge predicate
    comma = ("MATCH (c:Customer)-[r1:IN_NATION]->(n:Nation), "
             "(s:Supplier)-[r2:IN_NATION]->(n) "
             "RETURN n.name AS nation, count(*) AS pairs")
    csql = cypher_to_sql(comma, "gn", "gr")
    assert (
        "NOT (r1.START_ID = r2.START_ID AND r1.END_ID = r2.END_ID "
        "AND r1.TYPE = r2.TYPE)" in csql
    )
    # everything else matches
    assert sql == csql.replace(
        " AND NOT (r1.START_ID = r2.START_ID AND r1.END_ID = r2.END_ID "
        "AND r1.TYPE = r2.TYPE)", ""
    )


def test_where_between_match_clauses_conjunctive():
    # a WHERE attached to a non-final MATCH clause is ANDed into the
    # global filter (conjunctive equivalence across inner joins)
    sql = cypher_to_sql(
        "MATCH (a:X) WHERE a.ID > 1 MATCH (b:Y) WHERE b.ID < 9 "
        "RETURN count(*) AS c",
        "gn", "gr",
    )
    assert "(a.ID > 1)" in sql and "(b.ID < 9)" in sql
    assert sql.index("WHERE") < sql.index("(a.ID > 1)")


def test_consecutive_match_end_to_end(client):
    rows = client.stream(
        client.cypher(
            "MATCH (c:Customer)-[r1:IN_NATION]->(n:Nation) "
            "MATCH (c)-[b:BUYS_FROM]->(s:Supplier) "
            "RETURN n.name AS nation, count(*) AS purchases ORDER BY nation",
            graph="cy",
        )
    ).collect()
    assert sum(r.purchases for r in rows) == 6000


def test_size_labels_dialect_split():
    q = "MATCH (n) RETURN size(labels(n)) AS n_labels, count(*) AS c"
    assert "size(n.LABELS)" in cypher_to_sql(q, "gn", "gr", "spark")
    assert "len(n.LABELS)" in cypher_to_sql(q, "gn", "gr", "duckdb")
    # r7: size(<expr>) is the generic list length (carried collect
    # aliases, split(), literals); a string-typed argument surfaces the
    # engine's own type error — use length() for strings
    assert "size(n.name)" in cypher_to_sql(
        "MATCH (n) RETURN size(n.name) AS s", "gn", "gr"
    )


def test_size_labels_end_to_end(client):
    rows = client.stream(
        client.cypher(
            "MATCH (n) RETURN size(labels(n)) AS n_labels, count(*) AS c "
            "ORDER BY n_labels",
            graph="cy",
        )
    ).collect()
    # customers carry [Customer, <segment>] = 2; suppliers/nations 1
    assert [(r.n_labels, r.c) for r in rows] == [(1, 35), (2, 150)]


# -- allShortestPaths -------------------------------------------------------

def test_all_shortest_paths_transpile():
    q = ("MATCH p = allShortestPaths((a:X)-[:T*1..3]->(b:Y)) "
         "RETURN a.ID AS s, b.ID AS t, length(p) AS hops, count(*) AS n")
    sql = cypher_to_sql(q, "gn", "gr")
    assert "MIN(_pathlen) OVER (PARTITION BY _ep_a, _ep_b)" in sql
    assert "_pathlen = _minlen" in sql
    # the plain shortestPath form keeps the per-pair MIN aggregation
    sp = cypher_to_sql(
        "MATCH p = shortestPath((a:X)-[:T*1..3]->(b:Y)) "
        "RETURN a.ID AS s, length(p) AS hops", "gn", "gr",
    )
    assert "MIN(_pathlen)" in sp and "OVER" not in sp


def test_all_shortest_paths_end_to_end(client):
    spark = client.spark
    # diamond: 1->2->4, 1->3->4 — two shortest 2-hop paths 1=>4,
    # plus a longer 3-hop route 1->2->3->4 that must be filtered
    nodes = spark.createDataFrame(
        [(i, ["N"]) for i in (1, 2, 3, 4)], "ID long, LABELS array<string>"
    )
    rels = spark.createDataFrame(
        [(1, 2, "T"), (1, 3, "T"), (2, 4, "T"), (3, 4, "T"), (2, 3, "T")],
        "START_ID long, END_ID long, TYPE string",
    )
    client.catalog.register("asp", nodes, rels, overwrite=True)
    rows = client.stream(
        client.cypher(
            "MATCH p = allShortestPaths((a {ID: 1})-[:T*1..3]->(b {ID: 4})) "
            "RETURN b.ID AS target, length(p) AS hops, count(*) AS n_paths",
            graph="asp",
        )
    ).collect()
    assert [(r.target, r.hops, r.n_paths) for r in rows] == [(4, 2, 2)]


# -- unbounded variable-length (recursive CTE) -------------------------------

def test_unbounded_varlength_emits_recursive_cte():
    sql = cypher_to_sql(
        "MATCH (a:Customer)-[:BUYS_FROM*]->(b) RETURN b.ID AS id, count(*) AS n",
        "gn", "gr",
    )
    assert "WITH RECURSIVE _vlp(_sid, _tid, _hops) AS" in sql
    assert "_p._hops < 10" in sql  # default UNBOUNDED_HOP_GUARD
    assert "_vlp._sid = a.ID" in sql


def test_unbounded_varlength_open_lower_bound_and_guard():
    sql = cypher_to_sql(
        "MATCH (a)-[:T*3..]->(b) RETURN count(*) AS n",
        "gn", "gr", max_hops=6,
    )
    assert "_vlp._hops >= 3" in sql
    assert "_p._hops < 6" in sql


def test_unbounded_varlength_reverse_direction_swaps_endpoints():
    sql = cypher_to_sql(
        "MATCH (a)<-[:T*]-(b) RETURN count(*) AS n", "gn", "gr"
    )
    # traversal walks a -> b in pattern order over reversed edges
    assert "SELECT END_ID AS _sid, START_ID AS _tid" in sql


def test_unbounded_varlength_rejections():
    with pytest.raises(CypherUnsupported):  # undirected
        cypher_to_sql("MATCH (a)-[:T*]-(b) RETURN count(*) AS n", "gn", "gr")
    # binding to a variable is supported since r6 for size(r)/length(r)
    # (and an unused binding is legal); the LIST itself is not
    sql = cypher_to_sql(
        "MATCH (a)-[r:T*]->(b) RETURN count(*) AS n", "gn", "gr"
    )
    assert "WITH RECURSIVE" in sql
    sql = cypher_to_sql(
        "MATCH (a)-[r:T*]->(b) RETURN b.ID AS i, min(size(r)) AS h",
        "gn", "gr",
    )
    assert "_vlp._hops" in sql
    with pytest.raises(CypherUnsupported):  # the rel LIST is unsupported
        cypher_to_sql(
            "MATCH (a)-[r:T*]->(b) UNWIND r AS x RETURN count(*) AS n",
            "gn", "gr",
        )
    with pytest.raises(CypherUnsupported):  # two unbounded segments
        cypher_to_sql(
            "MATCH (a)-[:T*]->(b)-[:T*]->(c) RETURN count(*) AS n", "gn", "gr"
        )
    with pytest.raises(CypherUnsupported):  # mixed with bounded varlength
        cypher_to_sql(
            "MATCH (a)-[:T*]->(b)-[:T*1..2]->(c) RETURN count(*) AS n",
            "gn", "gr",
        )
    with pytest.raises(CypherUnsupported):  # comma patterns
        cypher_to_sql(
            "MATCH (a)-[:T*]->(b), (a)-[:K]->(c) RETURN count(*) AS n",
            "gn", "gr",
        )
    # unbounded shortestPath is supported since late r6 (min-hops CTE
    # over the distinct frontier — golden g129-g131 pin the semantics)
    sql = cypher_to_sql(
        "MATCH p = shortestPath((a)-[:T*]->(b)) "
        "RETURN b.ID AS i, length(p) AS hops", "gn", "gr",
    )
    assert "_svlp" in sql and "MIN(_hops)" in sql
    with pytest.raises(CypherUnsupported):  # allShortestPaths stays bounded
        cypher_to_sql(
            "MATCH p = allShortestPaths((a)-[:T*]->(b)) "
            "RETURN length(p) AS hops", "gn", "gr",
        )


def test_unbounded_varlength_fixed_suffix_chain(client):
    # unbounded segment followed by a fixed rel: c -[:BUYS_FROM*]-> s
    # -[:IN_NATION]-> n — equivalent to the bounded 1..1 expansion here
    rows = client.stream(
        client.cypher(
            "MATCH (c:Customer)-[:BUYS_FROM*]->(s:Supplier)"
            "-[i:IN_NATION]->(n:Nation) "
            "RETURN n.name AS nation, count(*) AS paths ORDER BY nation",
            graph="cy",
        )
    ).collect()
    bounded = client.stream(
        client.cypher(
            "MATCH (c:Customer)-[:BUYS_FROM*1..1]->(s:Supplier)"
            "-[i:IN_NATION]->(n:Nation) "
            "RETURN n.name AS nation, count(*) AS paths ORDER BY nation",
            graph="cy",
        )
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in bounded]


# -- undirected rel properties + list comprehensions -------------------------

def test_undirected_rel_property_carries_through_union_view():
    sql = cypher_to_sql(
        "MATCH (a)-[r:T {qty: 3}]-(b) WHERE r.price > 10.0 "
        "RETURN b.ID AS id, sum(r.price) AS total",
        "gn", "gr",
    )
    assert (
        "SELECT START_ID, END_ID, TYPE, price, qty,"
        " START_ID AS _OS, END_ID AS _OE FROM gr" in sql
    )
    assert "START_ID AS END_ID, TYPE, price, qty" in sql
    # directed rels keep the bare view (no union subquery)
    sql2 = cypher_to_sql(
        "MATCH (a)-[r:T]->(b) RETURN sum(r.price) AS total", "gn", "gr"
    )
    assert "UNION ALL" not in sql2


def test_undirected_without_prop_refs_stays_narrow():
    sql = cypher_to_sql(
        "MATCH (a)-[r:T]-(b) RETURN count(*) AS n", "gn", "gr"
    )
    # narrow = id/type columns plus the physical-identity pair only
    assert "SELECT START_ID, END_ID, TYPE, START_ID AS _OS" in sql


def test_list_comprehension_translation():
    sql = cypher_to_sql(
        "MATCH (c:Customer) RETURN c.ID AS id, "
        "size([x IN [1, 2, 3] WHERE x > 1 | x * 2]) AS k",
        "gn", "gr",
    )
    assert "size(transform(filter(array(1, 2, 3), x -> (x > 1)), x -> (x * 2)))" in sql
    dsql = cypher_to_sql(
        "MATCH (c:Customer) RETURN c.ID AS id, "
        "size([x IN [1, 2, 3] WHERE x > 1 | x * 2]) AS k",
        "gn", "gr", dialect="duckdb",
    )
    assert "len(list_transform(list_filter([1, 2, 3], x -> (x > 1)), x -> (x * 2)))" in dsql


def test_list_comprehension_over_labels_array():
    sql = cypher_to_sql(
        "MATCH (n:Nation) RETURN n.ID AS id, "
        "size([lbl IN n.LABELS WHERE lbl = 'Nation']) AS k",
        "gn", "gr",
    )
    assert "filter(n.LABELS, lbl -> (lbl = 'Nation'))" in sql
    assert "transform(" not in sql  # identity body elided


def test_list_comprehension_end_to_end(client):
    rows = client.stream(
        client.cypher(
            "MATCH (n:Nation) RETURN n.name AS name, "
            "size([x IN [1, 2, 3, 4] WHERE x > 2 | x]) AS k "
            "ORDER BY name LIMIT 2",
            graph="cy",
        )
    ).collect()
    assert [r.k for r in rows] == [2, 2]


def test_undirected_rel_props_end_to_end(client):
    # undirected + weight access: every BUYS_FROM edge seen from both
    # endpoints, so the weighted sum doubles the directed sum
    und = client.stream(
        client.cypher(
            "MATCH (a)-[r:BUYS_FROM]-(b) RETURN round(sum(r.weight), 2) AS s",
            graph="cy",
        )
    ).collect()[0].s
    nat = client.stream(
        client.cypher(
            "MATCH (a)-[r:BUYS_FROM]->(b) RETURN round(sum(r.weight), 2) AS s",
            graph="cy",
        )
    ).collect()[0].s
    assert abs(und - 2 * nat) < 0.05


# -- range() / leading WITH / map literals -----------------------------------

def test_range_translation_both_dialects():
    s = cypher_to_sql("UNWIND range(1, 50) AS i RETURN i AS id", "gn", "gr")
    assert "explode(sequence(1, 50)) AS i" in s
    d = cypher_to_sql(
        "UNWIND range(1, 50) AS i RETURN i AS id", "gn", "gr", dialect="duckdb"
    )
    assert "unnest(generate_series(1, 50)) AS i" in d
    s3 = cypher_to_sql(
        "UNWIND range(0, 10, 2) AS i RETURN i AS id", "gn", "gr"
    )
    assert "sequence(0, 10, 2)" in s3


def test_leading_with_unwind_translation():
    sql = cypher_to_sql(
        "WITH [x IN range(1, 8) | x * 2] AS emb UNWIND emb AS v "
        "RETURN toInteger(sum(v)) AS total",
        "gn", "gr",
    )
    assert "(SELECT transform(sequence(1, 8), x -> (x * 2)) AS emb) AS _w0" in sql
    assert "LATERAL VIEW explode(emb) _u0 AS v" in sql


def test_manifesto_benchmark_query_transpiles():
    # the reference's headline benchmark Cypher, verbatim shape
    # (MANIFESTO.md:239-242) — rand() keeps it out of the oracle set
    sql = cypher_to_sql(
        "WITH [ _ IN range(1, 256) | rand() ] AS fauxEmbedding "
        "UNWIND range(1, 1000) AS nodeId "
        "RETURN nodeId, fauxEmbedding",
        "gn", "gr",
    )
    assert "rand()" in sql and "sequence(1, 1000)" in sql


def test_manifesto_benchmark_query_runs(client):
    rows = client.stream(
        client.cypher(
            "WITH [ _ IN range(1, 16) | rand() ] AS fauxEmbedding "
            "UNWIND range(1, 100) AS nodeId "
            "RETURN nodeId, fauxEmbedding",
            graph="cy",
        )
    ).collect()
    assert len(rows) == 100
    assert all(len(r.fauxEmbedding) == 16 for r in rows)
    assert all(0.0 <= x < 1.0 for x in rows[0].fauxEmbedding)


def test_leading_with_match_supported():
    # r6: leading-WITH constants CROSS JOIN into the pattern
    sql = cypher_to_sql(
        "WITH 1 AS x MATCH (n:P) WHERE n.ID > x RETURN n.ID AS id",
        "gn", "gr",
    )
    assert "(SELECT 1 AS x) AS _w0 CROSS JOIN gn AS n" in sql


def test_leading_with_rejections():
    with pytest.raises(CypherUnsupported):  # aggregate in leading WITH
        cypher_to_sql("WITH count(*) AS c RETURN c", "gn", "gr")


def test_map_literal_translation():
    s = cypher_to_sql(
        "MATCH (n:Nation) RETURN {name: n.name, id: n.ID} AS m", "gn", "gr"
    )
    assert "named_struct('name', n.name, 'id', n.ID)" in s
    d = cypher_to_sql(
        "MATCH (n:Nation) RETURN {name: n.name, id: n.ID} AS m",
        "gn", "gr", dialect="duckdb",
    )
    assert "struct_pack(name := n.name, id := n.ID)" in d


def test_trim_replace_whitelisted():
    sql = cypher_to_sql(
        "MATCH (n:Nation) WHERE trim(n.name) = 'X' "
        "RETURN replace(n.name, '_', '-') AS r",
        "gn", "gr",
    )
    assert "TRIM(n.name)" in sql and "REPLACE(n.name, '_', '-')" in sql


def test_simple_case_translation():
    sql = cypher_to_sql(
        "MATCH (n:Nation) RETURN "
        "CASE n.ID % 2 WHEN 0 THEN 'e' ELSE 'o' END AS par",
        "gn", "gr",
    )
    assert "(CASE (n.ID % 2) WHEN 0 THEN 'e' ELSE 'o' END)" in sql
    # searched form unchanged
    sql2 = cypher_to_sql(
        "MATCH (n:Nation) RETURN "
        "CASE WHEN n.ID > 3 THEN 'big' ELSE 'small' END AS t",
        "gn", "gr",
    )
    assert "(CASE WHEN (n.ID > 3) THEN 'big' ELSE 'small' END)" in sql2


def test_math_string_whitelist():
    sql = cypher_to_sql(
        "MATCH (n:Nation) WHERE sign(n.ID) = 1 "
        "RETURN ltrim(reverse(n.name)) AS r, ceil(n.ID / 2) AS c",
        "gn", "gr",
    )
    assert "SIGN(n.ID)" in sql and "LTRIM(REVERSE(n.name))" in sql
    assert "CEIL(" in sql


def test_unbounded_varlength_anchor_seeded_by_start_node():
    # predicates don't push through the recursive union loop, so the
    # start node's label/prop conditions must seed the anchor
    sql = cypher_to_sql(
        "MATCH (c:Customer {acctbal: 5.0})-[:BUYS_FROM*]->(x) "
        "RETURN x.ID AS id, count(*) AS n",
        "gn", "gr",
    )
    assert (
        "_e.START_ID IN (SELECT ID FROM gn WHERE "
        "array_contains(LABELS, 'Customer') AND acctbal = 5.0)" in sql
    )
    # bare start node: no seed subquery
    sql2 = cypher_to_sql(
        "MATCH (c)-[:BUYS_FROM*]->(x) RETURN count(*) AS n", "gn", "gr"
    )
    assert "IN (SELECT ID FROM" not in sql2
