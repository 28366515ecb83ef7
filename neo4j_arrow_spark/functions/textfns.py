"""Text normalization, tokenization, and shingling — dual-dialect.

Semantics (identical on both engines, verified byte-for-byte):
- normalize: lowercase, collapse every non-alphanumeric run to one space
- tokens: split on single spaces, drop empties
- shingles: n-token windows joined by one space; docs with fewer than
  n tokens yield an empty list (NOT a partial shingle)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[^a-zA-Z0-9]+"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(F.regexp_replace(c, TOKEN_RE, " ")), " "),
        lambda x: x != "",
    )


def duck_tokens(expr: str) -> str:
    return (
        "list_filter(string_split_regex(lower(regexp_replace("
        f"{expr}, '{TOKEN_RE}', ' ', 'g')), ' '), x -> x <> '')"
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles. Guard against Spark's descending
    ``sequence(1, 0)`` for short docs."""
    toks = tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def duck_shingles(expr: str, n: int = 3) -> str:
    toks = duck_tokens(expr)
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 1} + 1), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
        "ELSE [] END"
    )
