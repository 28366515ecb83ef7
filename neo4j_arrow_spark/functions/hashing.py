"""Cross-engine deterministic hashing.

Spark's native ``xxhash64``/``hash`` and DuckDB's ``hash`` are
different functions, so operators whose OUTPUT depends on hash values
(minhash, simhash, LSH buckets) use an md5-derived 60-bit integer that
both engines compute identically:

    Spark : conv(substring(md5(concat(seed, ':', x)), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(seed || ':' || x), 1, 15))::BIGINT

15 hex chars = 60 bits — always positive, no overflow games. md5 is
uniform enough for sketching; cryptographic strength is irrelevant
here. (Internal-only hashes — shuffle partitioning, exact-dup
grouping where the hash never leaves the plan — can use xxhash64,
which is faster; see ``exact_dedup``.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MASK_BITS = 60


def hash64(col: Column | str, seed: int = 0, hex_chars: int = 15) -> Column:
    """Deterministic md5-derived hash of a string column (Spark side).
    ``hex_chars`` controls width: 15 → 60 bits (default), 7 → 28 bits
    (for double-hashing schemes that must not overflow int64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c)), 1, hex_chars), 16, 10
    ).cast("long")


def duck_hash64(expr: str, seed: int = 0, hex_chars: int = 15) -> str:
    """The identical hash as a DuckDB SQL snippet."""
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, {hex_chars}))::BIGINT"


def hash_bit(col: Column, bit: int) -> Column:
    """Bit ``bit`` of a hash value as ±1 (simhash contribution)."""
    return (F.shiftright(col, bit).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")


def duck_hash_bit(expr: str, bit: int) -> str:
    return f"(((({expr}) >> {bit}) & 1) * 2 - 1)"
