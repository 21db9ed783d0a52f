from fuse_query_spark.sources.tables import TABLES, load_tables, table

__all__ = ["TABLES", "load_tables", "table"]
