"""Operators — DataFrame-in / DataFrame-out, one module per family.

Reference inventory mapping in SURVEY.md §2; every operator here is a
declarative Catalyst plan unless the semantics genuinely require a
Pandas-UDF escape hatch.
"""

from neo4j_arrow_spark.operators.node_scan import gds_nodes
from neo4j_arrow_spark.operators.rel_scan import gds_relationships
from neo4j_arrow_spark.operators.khop import khop, khop_flat

__all__ = ["gds_nodes", "gds_relationships", "khop", "khop_flat"]
