from fuse_query_spark.dialect.rewriter import rewrite_select

__all__ = ["rewrite_select"]
