"""Skew-handling: deterministic salted equi-join.

AQE's skew-join splitting (on by default in the session) handles most
hot-key joins by splitting oversized partitions at runtime. Salting is
the explicit, planner-independent fallback for the pathological case —
a single key so hot that even a split partition's rows must all meet
the same right-side rows (the reference's supernode scenario,
``KHOP.md:157-184``, which it solves with an in-memory adjacency cache
``SuperNodeCache.java:11-44``; in a shuffle engine the equivalent is
spreading the hot key across reducers).

Mechanics: every LEFT row gets a deterministic salt in [0, salts)
hashed from its full row content (not rand() — retries and both sides
of a speculative task must agree); the RIGHT side is replicated
``salts`` times. Join key becomes (key, salt): the hot key's rows now
land on ``salts`` reducers instead of one, at the cost of
|right| × salts shuffle volume — use for hot-left / small-right
shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join ``left ⋈ right`` on ``on`` with the left side's hot
    keys spread over ``salts`` reducers. Semantics identical to
    ``left.join(right, on, how)`` for ``inner``/``left`` joins
    (duplicates preserved; deterministic)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts))
    l_salted = left.withColumn("_salt", salt)
    r_rep = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return l_salted.join(r_rep, keys + ["_salt"], how).drop("_salt")
