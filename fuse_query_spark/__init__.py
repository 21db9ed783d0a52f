"""fuse_query_spark — a PySpark-native analytics engine with the query
capabilities of datafuselabs/fuse-query (reference: /root/reference).

Architecture (SURVEY.md §7): Spark SQL + Catalyst is the executor; this
package supplies the *semantics* — a dialect front-end (ClickHouse-style
SQL → Spark), a function registry (aliases + combinator suffixes like
``sumIf`` / ``countDistinct``), table engines & system tables, and the
large-scale data-pipeline operators (dedup, similarity search, text
analysis) the reference never had but a 100 TB deployment needs.
"""

from fuse_query_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
