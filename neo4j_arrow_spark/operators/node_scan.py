"""S3 — GDS node scan: label filter + property projection + id remap.

Reference: ``GdsReadJob.handleNodeJob`` (``plugin/src/main/java/org/
neo4j/arrow/job/GdsReadJob.java:362-432``) — builds a filtered graph
view from requested labels (:362-368), validates requested properties
(:372-381, NOT_FOUND on missing), resolves property columns + optional
node-id remap (:383-394), then streams rows in parallel (:413-417).

Spark translation: one Catalyst plan — ``filter(arrays_overlap(LABELS,
labels)).select(ID, LABELS, *props)``. Column pruning reaches the
parquet scan (only requested property columns are read) and the label
filter is a predicate the optimizer can push; no custom execution
needed. Client signature parity: ``python/neo4j_arrow.py:182-198``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_arrow_spark.graph import NodeField


class PropertyNotFound(ValueError):
    """Parity with the reference's CallStatus.NOT_FOUND on bad property
    names (GdsReadJob.java:373-381)."""


def gds_nodes(
    nodes: DataFrame,
    properties: Sequence[str] | None = None,
    filters: Sequence[str] | None = None,
    node_id: str | None = None,
) -> DataFrame:
    """Scan a node table.

    - ``properties``: projection; None/empty = all properties
      (ANY_PROPERTIES semantics, GdsMessage.java:59-69).
    - ``filters``: keep nodes having ANY of the listed labels
      (GdsReadJob.java:363-368).
    - ``node_id``: property substituted as the exported ID
      (GdsReadJob.java:281-283,388-394).

    Output schema: ``(ID, LABELS, *properties)``.
    """
    prop_cols = [c for c in nodes.columns if c not in NodeField.RESERVED]
    if properties:
        missing = [p for p in properties if p not in prop_cols]
        if missing:
            raise PropertyNotFound(f"node properties not found: {missing}")
        prop_cols = list(properties)

    out = nodes
    if filters:
        out = out.filter(
            F.arrays_overlap(
                F.col(NodeField.LABELS),
                F.array(*[F.lit(l) for l in filters]),
            )
        )

    if node_id is not None:
        if node_id not in nodes.columns:
            raise PropertyNotFound(f"node_id property not found: {node_id}")
        id_col = F.col(node_id).cast("long").alias(NodeField.ID)
    else:
        id_col = F.col(NodeField.ID)

    return out.select(id_col, F.col(NodeField.LABELS), *[F.col(c) for c in prop_cols])
