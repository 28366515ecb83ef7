"""neo4j_arrow_spark — a PySpark-native analytics engine with the
capabilities of neo4j-field/neo4j-arrow.

The reference (/root/reference) is an Arrow Flight RPC server embedded in
Neo4j that streams property-graph data as columnar batches. This package
re-expresses the same capability surface Spark-first:

- property graph = two DataFrames (nodes, relationships) with the
  reference's reserved column names (``plugin/src/main/java/org/neo4j/
  arrow/Neo4jDefaults.java:7-20``);
- scans/filters/projections = declarative DataFrame plans that Catalyst
  optimizes (pushdown, pruning, codegen);
- the GDS graph catalog = :class:`~neo4j_arrow_spark.catalog.GraphCatalog`;
- jobs = a thin async-lifecycle registry over Spark actions
  (``src/main/java/org/neo4j/arrow/job/Job.java:21-44``);
- k-hop = a skew-aware self-join plan (``plugin/.../gds/KHop.java``);
- ingest/bulk-import = DataFrame writes (``plugin/.../job/GdsWriteJob.java``,
  ``BulkImportJob.java``).

Beyond reference parity, :mod:`neo4j_arrow_spark.operators` adds the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB-scale execution.
"""

from neo4j_arrow_spark.graph import Graph, NodeField, RelField
from neo4j_arrow_spark.catalog import GraphCatalog
from neo4j_arrow_spark.session import get_session

__all__ = ["Graph", "GraphCatalog", "NodeField", "RelField", "get_session"]
__version__ = "0.1.0"
