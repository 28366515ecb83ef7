"""S4 — GDS relationship scan: type filter + long-form property melt.

Reference: ``GdsReadJob.handleRelationshipsJob`` (``plugin/src/main/
java/org/neo4j/arrow/job/GdsReadJob.java:235-360``) — validates the
type filter (:236-243), errors if a requested property exists on no
type (:246-267), expands (relType × property × graphView) triples
(:289-309), and emits **one row per (edge × property)**:
``(START_ID, END_ID, TYPE, property, value)`` with ``Double.NaN`` as
the missing-property fallback (:337; record shape
``GdsRelationshipRecord.java:71-73``).

Spark translation: ``filter(TYPE.isin(types))`` + an unpivot via
``stack()`` — a single narrow projection, no shuffle at all. The
type×property cross product the reference materializes as nested loops
becomes literal stack arms that Catalyst folds into one pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_arrow_spark.graph import RelField


class PropertyNotFound(ValueError):
    """Parity with CallStatus.NOT_FOUND (GdsReadJob.java:246-267)."""


def gds_relationships(
    rels: DataFrame,
    properties: Sequence[str] | None = None,
    filters: Sequence[str] | None = None,
    include_propertyless: bool = True,
) -> DataFrame:
    """Scan a relationship table into the reference's long form.

    - ``filters``: relationship types to keep (GdsReadJob.java:236-243).
    - ``properties``: rel properties to melt; None = all non-reserved
      columns. Missing → PropertyNotFound (:246-267).
    - ``include_propertyless``: when the table has no property columns
      (or none requested), emit bare ``(START_ID, END_ID, TYPE)`` rows
      with property=NULL/value=NaN — mirroring the reference's
      "relationship sans property" rows (GdsReadJob.java:311-324).

    Output: ``(START_ID long, END_ID long, TYPE string,
    property string, value double)``.
    """
    prop_cols = [c for c in rels.columns if c not in RelField.RESERVED]
    if properties:
        missing = [p for p in properties if p not in prop_cols]
        if missing:
            raise PropertyNotFound(f"rel properties not found: {missing}")
        prop_cols = list(properties)

    out = rels
    if filters:
        out = out.filter(F.col(RelField.TYPE).isin(list(filters)))

    base = [F.col(RelField.START_ID), F.col(RelField.END_ID), F.col(RelField.TYPE)]
    if not prop_cols:
        if not include_propertyless:
            raise PropertyNotFound("no relationship properties to stream")
        return out.select(
            *base,
            F.lit(None).cast("string").alias("property"),
            F.lit(float("nan")).alias("value"),
        )

    # stack('n', 'p1', v1, 'p2', v2, ...) — one output row per property.
    # NaN fallback for null values matches GdsReadJob.java:337.
    arms = []
    for p in prop_cols:
        arms.append(F.lit(p))
        arms.append(F.coalesce(F.col(p).cast("double"), F.lit(float("nan"))))
    melted = out.select(
        *base,
        F.stack(F.lit(len(prop_cols)), *arms).alias("property", "value"),
    )
    return melted
