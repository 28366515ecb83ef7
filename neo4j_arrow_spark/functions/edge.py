"""Edge packing — the reference's 64-bit edge encoding as Spark
column expressions.

Reference: ``plugin/src/main/java/org/neo4j/arrow/gds/Edge.java:6-52``
packs (source, target, flags) into one long — bits 0-29 target,
30-59 source, 60-62 rel-type code, 63 "natural" orientation — under
the assumption ids < 2³⁰ (``KHOP.md:193-217``). In the Spark engine the
columnar (src, dst) longs are already primitive, so packing is an
OPTIONAL micro-optimization (e.g. a single-column dedup key or a
compact set representation), kept for capability parity with the
reference's EdgePackingTest semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_ID_BITS = 30
MAX_ID = (1 << MAX_ID_BITS) - 1
FLAG_NATURAL = 1 << 63  # sign bit; Edge.java uses bit 63 for orientation


def pack_edge(src: Column, dst: Column, natural: Column | bool = True) -> Column:
    """(src, dst, natural) -> packed long: src<<30 | dst, orientation in
    the sign bit (Edge.java:13-31). Caller must guarantee ids < 2^30 —
    validate with :func:`packable`."""
    nat = F.lit(natural) if isinstance(natural, bool) else natural
    base = F.shiftleft(src.cast("long"), MAX_ID_BITS).bitwiseOR(dst.cast("long"))
    return F.when(nat, base.bitwiseOR(F.lit(-(1 << 63)).cast("long"))).otherwise(base)


def unpack_source(packed: Column) -> Column:
    """Edge.java:33-36."""
    return F.shiftrightunsigned(
        packed.bitwiseAND(F.lit((1 << 60) - 1)), MAX_ID_BITS
    ).bitwiseAND(F.lit(MAX_ID))


def unpack_target(packed: Column) -> Column:
    """Edge.java:38-41."""
    return packed.bitwiseAND(F.lit(MAX_ID))


def is_natural(packed: Column) -> Column:
    """Edge.java:48-51 — orientation flag (sign bit)."""
    return packed < 0


def packable(src: Column, dst: Column) -> Column:
    """True when both ids fit the 30-bit budget."""
    return (
        (src >= 0) & (src <= MAX_ID) & (dst >= 0) & (dst <= MAX_ID)
    )
