"""Function registry: the declared parity surface (SURVEY §2.8/§2.4)
plus the Spark-side registration of the few helper UDFs the dialect
needs. Scalar/aggregate names listed here feed system.functions
(reference: datasources/system/functions_table.rs:23 exposes the
factory's registered names).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name → (is_aggregate, how it is provided)
SCALAR_FUNCTIONS = {
    # arithmetic (scalars/arithmetics/arithmetic.rs:29-38)
    "plus": "native:+",
    "minus": "native:-",
    "multiply": "native:*",
    "divide": "native:/",
    "modulo": "native:%",
    "negate": "native:unary -",
    # comparison (scalars/comparisons/comparison.rs:32-40)
    "equals": "native:=",
    "notequals": "native:!=",
    "lt": "native:<",
    "gt": "native:>",
    "lte": "native:<=",
    "gte": "native:>=",
    "like": "native:LIKE",
    "notlike": "native:NOT LIKE",
    # logic (scalars/logics/logic.rs:27-29)
    "and": "native:AND",
    "or": "native:OR",
    "not": "native:NOT",
    # strings (scalars/strings/substring.rs)
    "substring": "native:substring",
    # hashes (scalars/hashes/siphash.rs) — mapped to xxhash64, a stable
    # 64-bit hash; NOT byte-compatible with SipHash. For byte parity
    # with the reference (Rust DefaultHasher = zero-key SipHash-1-3)
    # use siphash_exact / siphash_exact_str (pandas UDF slow path).
    "siphash": "dialect:xxhash64",
    "siphash64": "dialect:xxhash64",
    "siphash_exact": "udf:SipHash-1-3 byte parity (functions/siphash.py)",
    "siphash_exact_str": "udf:SipHash-1-3 byte parity (functions/siphash.py)",
    # casts (scalars/expressions/expression.rs:16-27)
    **{f"toint{b}": "dialect:CAST" for b in (8, 16, 32, 64)},
    **{f"touint{b}": "dialect:CAST" for b in (8, 16, 32, 64)},
    "tofloat32": "dialect:CAST",
    "tofloat64": "dialect:CAST",
    "tostring": "dialect:CAST",
    "todate": "dialect:CAST",
    "todatetime": "dialect:CAST",
    # context/udfs (scalars/udfs/udf.rs:22-28)
    "database": "dialect:literal",
    "version": "dialect:literal",
    "sleep": "dialect:driver sleep(<3s) then 0",
    "totypename": "udf:fq_typename(typeof())",
    "exists": "native:EXISTS subquery",
    "cast": "native:CAST",
}

AGGREGATE_FUNCTIONS = {
    # aggregates/aggregator.rs:25-34
    "count": "native:count",
    "sum": "native:sum",
    "min": "native:min",
    "max": "native:max",
    "avg": "native:avg",
    "argmin": "dialect:min_by",
    "argmax": "dialect:max_by",
    "uniq": "dialect:count(DISTINCT)",
    # combinators (aggregate_function_factory.rs:150-196)
    **{f"{b}if": "dialect:FILTER (WHERE)" for b in ("count", "sum", "min", "max", "avg", "uniq")},
    **{f"{b}distinct": "dialect:DISTINCT" for b in ("count", "sum", "avg", "uniq")},
}

# Spark type name → reference-style type name (data_type.rs:16-41).
# Signed widenings of unsigned types report the signed name.
_TYPENAME_MAP = {
    "tinyint": "Int8",
    "smallint": "Int16",
    "int": "Int32",
    "bigint": "Int64",
    "float": "Float32",
    "double": "Float64",
    "string": "Utf8",
    "boolean": "Boolean",
    "date": "Date32",
    "timestamp": "DateTime",
    "binary": "Binary",
    "null": "Null",
    "void": "Null",
}


def _fq_typename(spark_type: str) -> str:
    if spark_type is None:
        return "Null"
    t = spark_type.lower()
    if t.startswith("decimal"):
        return "Float64"  # reference coerces DECIMAL → Float64 (sql_common.rs:29)
    if t.startswith("array"):
        return "List"
    if t.startswith("struct"):
        return "Struct"
    return _TYPENAME_MAP.get(t, spark_type)


def register_udfs(spark: SparkSession) -> None:
    """Register the dialect's helper UDFs (idempotent). These never sit
    in a hot loop — fq_typename runs on constant-folded typeof output,
    and siphash_exact is the opt-in byte-parity path."""
    spark.udf.register("fq_typename", _fq_typename, "string")
    from fuse_query_spark.functions.siphash import register_siphash

    register_siphash(spark)


def all_function_rows() -> list[tuple[str, bool]]:
    rows = [(name, False) for name in sorted(SCALAR_FUNCTIONS)]
    rows += [(name, True) for name in sorted(AGGREGATE_FUNCTIONS)]
    return rows
