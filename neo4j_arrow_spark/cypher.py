"""Cypher-subset → ANSI SQL transpiler.

The reference's query language is Cypher, delegated to Neo4j's own
engine (it only *parses* for validation — ``common/.../CypherMessage.
java:36-52``, SURVEY §3.1). This engine's native language is Spark SQL,
but the pattern-matching shapes reference users actually stream through
neo4j-arrow translate mechanically onto the graph-table convention, so
``cypher()`` accepts them directly:

    MATCH (a:Label {prop: lit})-[r:TYPE]->(b)[-[r2:T2]->(c) ...]
    WHERE <comparisons on var.prop, AND/OR/NOT, IS [NOT] NULL, IN>
    RETURN [DISTINCT] items [AS alias] | count(*) | sum/avg/min/max/count(x.p)
    [ORDER BY item [ASC|DESC], ...] [SKIP n] [LIMIT n]

Implicit grouping follows Cypher: aggregate + non-aggregate return
items ⇒ GROUP BY the non-aggregates. ``RETURN a`` returns the node id
(``a.ID``) — the columnar engine has no "node object".

Out of scope (raise :class:`CypherUnsupported`): undirected /
variable-length / optional matches, multiple comma patterns, WITH
chains, mutation clauses, path variables. The generated SQL uses only
constructs DuckDB executes identically (``array_contains``, ANSI
joins), so transpiled queries plug into the oracle harness unchanged.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class CypherSyntaxError(ValueError):
    pass


class CypherUnsupported(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<kw>(?i:OPTIONAL|MATCH|WHERE|RETURN|DISTINCT|ORDER|BY|SKIP|LIMIT|ASC|DESC|AND|OR|NOT|IS|NULL|IN|AS|TRUE|FALSE)\b)
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<str>'(?:[^'\\]|\\.)*')
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<arrow_r>->)
  | (?P<arrow_l><-)
  | (?P<cmp><=|>=|<>|!=|=|<|>)
  | (?P<punct>[(){}\[\],.:*-])
    """,
    re.VERBOSE,
)


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            raise CypherSyntaxError(f"cannot tokenize at: {q[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "kw":
            text = text.upper()
        out.append((kind, text))
    out.append(("eof", ""))
    return out


@dataclass
class _NodePat:
    var: str
    labels: list[str] = field(default_factory=list)
    props: list[tuple[str, str]] = field(default_factory=list)  # (key, sql literal)


@dataclass
class _RelPat:
    var: str
    rtype: str | None
    direction: str  # '->' or '<-'


class _Parser:
    def __init__(self, query: str):
        self.toks = _tokenize(query)
        self.pos = 0

    # -- token helpers -----------------------------------------------------
    def peek(self) -> tuple[str, str]:
        return self.toks[self.pos]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def accept(self, text: str) -> bool:
        if self.peek()[1] == text:
            self.pos += 1
            return True
        return False

    def expect(self, text: str) -> None:
        kind, tok = self.next()
        if tok != text:
            raise CypherSyntaxError(f"expected {text!r}, got {tok!r}")

    def expect_name(self) -> str:
        kind, tok = self.next()
        if kind != "name":
            raise CypherSyntaxError(f"expected identifier, got {tok!r}")
        return tok

    # -- literals ----------------------------------------------------------
    def literal(self) -> str:
        kind, tok = self.next()
        if kind == "num":
            return tok
        if kind == "str":
            return tok
        if tok in ("TRUE", "FALSE"):
            return tok
        if tok == "NULL":
            return "NULL"
        raise CypherSyntaxError(f"expected literal, got {tok!r}")

    # -- pattern -----------------------------------------------------------
    def node(self) -> _NodePat:
        self.expect("(")
        kind, tok = self.peek()
        if kind != "name":
            raise CypherUnsupported("anonymous nodes are not supported; name every node")
        var = self.expect_name()
        n = _NodePat(var)
        while self.accept(":"):
            n.labels.append(self.expect_name())
        if self.accept("{"):
            while True:
                key = self.expect_name()
                self.expect(":")
                n.props.append((key, self.literal()))
                if not self.accept(","):
                    break
            self.expect("}")
        self.expect(")")
        return n

    def rel(self) -> _RelPat:
        # '-' already consumed or '<-' start
        if self.accept("<-"):
            direction = "<-"
        else:
            self.expect("-")
            direction = "?"
        var, rtype = "", None
        if self.accept("["):
            kind, tok = self.peek()
            if kind == "name":
                var = self.expect_name()
            if self.accept(":"):
                rtype = self.expect_name()
            self.expect("]")
        if direction == "<-":
            self.expect("-")
            return _RelPat(var, rtype, "<-")
        if self.accept("->"):
            return _RelPat(var, rtype, "->")
        if self.accept("-"):
            return _RelPat(var, rtype, "-")
        raise CypherSyntaxError("malformed relationship pattern")

    def pattern(self) -> tuple[list[_NodePat], list[_RelPat]]:
        nodes = [self.node()]
        rels: list[_RelPat] = []
        while self.peek()[1] in ("-", "<-"):
            rels.append(self.rel())
            nodes.append(self.node())
        if self.peek()[1] == ",":
            raise CypherUnsupported("multiple MATCH patterns are not supported (v1)")
        return nodes, rels

    # -- expressions (WHERE) -----------------------------------------------
    def expr(self) -> str:
        return self.or_expr()

    def or_expr(self) -> str:
        left = self.and_expr()
        while self.accept("OR"):
            left = f"({left} OR {self.and_expr()})"
        return left

    def and_expr(self) -> str:
        left = self.not_expr()
        while self.accept("AND"):
            left = f"({left} AND {self.not_expr()})"
        return left

    def not_expr(self) -> str:
        if self.accept("NOT"):
            return f"(NOT {self.not_expr()})"
        return self.comparison()

    def operand(self) -> str:
        kind, tok = self.peek()
        if kind == "name":
            var = self.expect_name()
            if self.accept("."):
                prop = self.expect_name()
                return f"{var}.{prop}"
            return f"{var}.ID"
        return self.literal()

    def comparison(self) -> str:
        if self.accept("("):
            inner = self.expr()
            self.expect(")")
            return f"({inner})"
        left = self.operand()
        kind, tok = self.peek()
        if tok == "IS":
            self.next()
            if self.accept("NOT"):
                self.expect("NULL")
                return f"({left} IS NOT NULL)"
            self.expect("NULL")
            return f"({left} IS NULL)"
        if tok == "IN":
            self.next()
            self.expect("[")
            items = [self.literal()]
            while self.accept(","):
                items.append(self.literal())
            self.expect("]")
            return f"({left} IN ({', '.join(items)}))"
        if kind != "cmp":
            raise CypherSyntaxError(f"expected comparison after {left}, got {tok!r}")
        self.next()
        op = "<>" if tok == "!=" else tok
        return f"({left} {op} {self.operand()})"

    # -- RETURN items --------------------------------------------------------
    _AGGS = ("COUNT", "SUM", "AVG", "MIN", "MAX")

    def return_item(self) -> tuple[str, str, bool]:
        """-> (sql_expr, alias, is_aggregate)"""
        kind, tok = self.peek()
        if kind == "name" and tok.upper() in self._AGGS and self.toks[self.pos + 1][1] == "(":
            fn = self.next()[1].upper()
            self.expect("(")
            if fn == "COUNT" and self.accept("*"):
                inner = "*"
            else:
                distinct = self.accept("DISTINCT")
                inner = self.operand()
                if distinct:
                    inner = f"DISTINCT {inner}"
            self.expect(")")
            expr, default_alias = f"{fn}({inner})", fn.lower()
            is_agg = True
        else:
            expr = self.operand()
            default_alias = expr.replace(".", "_")
            is_agg = False
        alias = self.expect_name() if self.accept("AS") else default_alias
        return expr, alias, is_agg

    # -- full query ----------------------------------------------------------
    def parse(self) -> dict:
        self.expect("MATCH")
        nodes, rels = self.pattern()
        bound = {n.var for n in nodes}
        optionals: list[tuple[list[_NodePat], list[_RelPat]]] = []
        while self.peek()[1] == "OPTIONAL":
            self.next()
            self.expect("MATCH")
            onodes, orels = self.pattern()
            anchor = onodes[0]
            if anchor.var not in bound:
                raise CypherUnsupported(
                    f"OPTIONAL MATCH must start from a bound variable; "
                    f"{anchor.var!r} is not bound"
                )
            if anchor.labels or anchor.props:
                raise CypherUnsupported(
                    "labels/properties on the bound anchor of OPTIONAL MATCH "
                    "are not supported; put them on the original MATCH"
                )
            if not orels:
                raise CypherUnsupported("OPTIONAL MATCH needs a relationship pattern")
            for n in onodes[1:]:
                if n.var in bound:
                    raise CypherUnsupported(
                        f"OPTIONAL MATCH re-binding {n.var!r} is not supported"
                    )
                bound.add(n.var)
            optionals.append((onodes, orels))
        where = None
        if self.accept("WHERE"):
            # applies post-join (global filter); Cypher's per-OPTIONAL
            # WHERE is out of scope — document divergence
            where = self.expr()
        self.expect("RETURN")
        distinct = self.accept("DISTINCT")
        items = [self.return_item()]
        while self.accept(","):
            items.append(self.return_item())
        order = []
        if self.accept("ORDER"):
            self.expect("BY")
            while True:
                # a bare name references a RETURN alias; var.prop maps
                # through _order_ref; anything else is a syntax error
                kind, tok = self.peek()
                if kind != "name":
                    raise CypherSyntaxError(f"ORDER BY expects a name, got {tok!r}")
                name = self.expect_name()
                e = f"{name}.{self.expect_name()}" if self.accept(".") else name
                direction = "DESC" if self.accept("DESC") else ("ASC" if self.accept("ASC") else "ASC")
                order.append((e, direction))
                if not self.accept(","):
                    break
        skip = limit = None
        if self.accept("SKIP"):
            skip = self.next()[1]
        if self.accept("LIMIT"):
            limit = self.next()[1]
        if self.peek()[0] != "eof":
            raise CypherSyntaxError(f"unexpected trailing input: {self.peek()[1]!r}")
        return {
            "nodes": nodes,
            "rels": rels,
            "optionals": optionals,
            "where": where,
            "distinct": distinct,
            "items": items,
            "order": order,
            "skip": skip,
            "limit": limit,
        }


def cypher_to_sql(query: str, nodes_view: str, rels_view: str) -> str:
    """Transpile the Cypher subset to one ANSI SQL string over the
    graph views (executable identically by Spark and DuckDB)."""
    ast = _Parser(query).parse()
    nodes, rels = ast["nodes"], ast["rels"]

    seen = set()
    for n in nodes:
        if n.var in seen:
            raise CypherUnsupported(f"repeated node variable {n.var!r} (no cycles in v1)")
        seen.add(n.var)

    def rel_source(r: _RelPat, rv: str) -> str:
        if r.direction == "-":
            # undirected: join against the natural+reverse union view —
            # the reference's own projection trick (KHOP.md:55-70).
            # Each physical edge matches in both orientations, exactly
            # Cypher's undirected semantics. Only (ids, TYPE) survive
            # the swap, so rel-property access on an undirected rel is
            # rejected at parse level (var kept for pattern syntax).
            return (
                f"(SELECT START_ID, END_ID, TYPE FROM {rels_view}"
                f" UNION ALL"
                f" SELECT END_ID AS START_ID, START_ID AS END_ID, TYPE"
                f" FROM {rels_view}) AS {rv}"
            )
        return f"{rels_view} AS {rv}"

    def rel_keys(r: _RelPat, rv: str, a: str, b: str) -> tuple[str, str]:
        if r.direction == "<-":
            return f"{rv}.END_ID = {a}.ID", f"{b}.ID = {rv}.START_ID"
        return f"{rv}.START_ID = {a}.ID", f"{b}.ID = {rv}.END_ID"

    from_sql = f"{nodes_view} AS {n0Var(nodes)}"
    joins: list[str] = []
    conds: list[str] = []
    for i, r in enumerate(rels):
        rv = r.var or f"_r{i}"
        a, b = nodes[i].var, nodes[i + 1].var
        on, on2 = rel_keys(r, rv, a, b)
        joins.append(f"JOIN {rel_source(r, rv)} ON {on}")
        joins.append(f"JOIN {nodes_view} AS {b} ON {on2}")
        if r.rtype:
            conds.append(f"{rv}.TYPE = '{r.rtype}'")
    for n in nodes:
        for lbl in n.labels:
            conds.append(f"array_contains({n.var}.LABELS, '{lbl}')")
        for key, lit in n.props:
            conds.append(f"{n.var}.{key} = {lit}")

    for oi, (onodes, orels) in enumerate(ast["optionals"]):
        # LEFT-JOIN chain: pattern conditions live in the ON clause
        # (WHERE would defeat the null-preservation). Non-anchor nodes
        # must be bare — a failed label test on an optional target
        # would have to null the whole pattern, which needs derived-
        # table joins; out of scope v1.
        for n in onodes[1:]:
            if n.labels or n.props:
                raise CypherUnsupported(
                    "labels/properties on OPTIONAL MATCH target nodes are "
                    "not supported (v1) — filter in WHERE with IS NULL guards"
                )
        for i, r in enumerate(orels):
            rv = r.var or f"_o{oi}_{i}"
            a, b = onodes[i].var, onodes[i + 1].var
            on, on2 = rel_keys(r, rv, a, b)
            if r.rtype:
                on = f"{on} AND {rv}.TYPE = '{r.rtype}'"
            joins.append(f"LEFT JOIN {rel_source(r, rv)} ON {on}")
            joins.append(f"LEFT JOIN {nodes_view} AS {b} ON {on2}")

    if ast["where"]:
        conds.append(ast["where"])

    select_parts = [f"{e} AS {a}" for e, a, _ in ast["items"]]
    select_sql = ("DISTINCT " if ast["distinct"] else "") + ", ".join(select_parts)
    # group by the underlying expressions, not the aliases: an alias
    # that shadows a joined-table column (`id` vs a.ID/b.ID) makes
    # GROUP BY <alias> ambiguous in Spark
    group_cols = [e for e, _a, agg in ast["items"] if not agg]
    has_agg = any(agg for _, _, agg in ast["items"])

    sql = f"SELECT {select_sql}\nFROM {from_sql}"
    for j in joins:
        sql += f"\n{j}"
    if conds:
        sql += "\nWHERE " + " AND ".join(conds)
    if has_agg and group_cols:
        sql += "\nGROUP BY " + ", ".join(group_cols)
    if ast["order"] or ast["limit"] is not None or ast["skip"] is not None:
        # ORDER BY/LIMIT apply over the aliased projection in an outer
        # query: a bare alias in ORDER BY would otherwise resolve
        # ambiguously against same-named columns of the joined tables
        # (e.g. alias `id` vs a.ID/b.ID).
        sql = f"SELECT * FROM (\n{sql}\n) AS _projected"
        if ast["order"]:
            parts = []
            for e, d in ast["order"]:
                parts.append(f"{_order_ref(e, ast['items'])} {d}")
            sql += "\nORDER BY " + ", ".join(parts)
        if ast["limit"] is not None:
            sql += f"\nLIMIT {ast['limit']}"
        if ast["skip"] is not None:
            sql += f"\nOFFSET {ast['skip']}"
    return sql


def n0Var(nodes: list[_NodePat]) -> str:
    return nodes[0].var


def _order_ref(expr: str, items: list[tuple[str, str, bool]]) -> str:
    """ORDER BY may reference a return item by var.prop — map to its
    alias so the sort applies after aggregation/projection."""
    for e, alias, _ in items:
        if expr == e:
            return alias
    return expr


def is_cypher(query: str) -> bool:
    """Cheap dispatch: the reference's job API is Cypher-first; we
    accept both and route on the leading keyword."""
    return bool(re.match(r"\s*MATCH\b", query, re.IGNORECASE))
