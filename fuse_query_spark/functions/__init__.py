from fuse_query_spark.functions.exact import dec, dsum, davg, one_minus, one_plus

__all__ = ["dec", "dsum", "davg", "one_minus", "one_plus"]
