"""Dialect-layer queries: fuse-query/ClickHouse-flavoured SQL through
``Engine.sql`` (parse → rewrite → spark.sql), oracle-checked like every
other operator. This is the end-to-end test of the reference's primary
entry point (SURVEY §3.1: SQL text → plan → execute) on Spark.
"""

from __future__ import annotations

from fuse_query_spark.engine import Engine
from fuse_query_spark.queries import register


_ENGINES: dict[tuple[int, str], Engine] = {}


def _engine(spark, sf_dir) -> Engine:
    """One Engine per (session, sf_dir): construction reads every
    table's parquet footer for schemas, which would otherwise repeat
    on each bench iteration. Dialect queries only SELECT, so sharing
    catalog state across them is safe."""
    key = (id(spark), sf_dir)
    if key not in _ENGINES:
        eng = Engine(spark)
        eng.attach_parquet_dir(sf_dir)
        _ENGINES[key] = eng
    return _ENGINES[key]


@register(
    "dialect_combinators",
    oracle="""
    SELECT l_returnflag AS flag,
           COUNT(DISTINCT l_suppkey) AS uniq_supp,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_hidisc,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           ARG_MAX(l_orderkey, l_orderkey) AS last_key
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("dialect", "combinator", "aggregate"),
)
def dialect_combinators(spark, sf_dir):
    """ClickHouse-style `uniq`/`sumIf`/`countIf`/`argMax` through the
    dialect rewriter — the combinator-suffix resolution of
    aggregate_function_factory.rs:150-196 as a name-rewrite layer."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        """
        SELECT l_returnflag AS flag,
               uniq(l_suppkey) AS uniq_supp,
               CAST(sumIf(CAST(l_quantity AS DECIMAL(12,2)), l_discount > 0.05) AS DOUBLE) AS qty_hidisc,
               countIf(l_quantity > 25) AS n_big,
               argMax(l_orderkey, l_orderkey) AS last_key
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "dialect_numbers_groupby",
    oracle="""
    SELECT CAST(number % 3 AS BIGINT) AS g3,
           CAST(MAX(number) AS BIGINT) AS max_n,
           CAST(SUM(number) AS BIGINT) AS sum_n
    FROM (SELECT range AS number FROM range(1000000))
    GROUP BY g3
    """,
    tags=("dialect", "numbers", "aggregate"),
)
def dialect_numbers_groupby(spark, sf_dir):
    """The reference's headline bench shape (`SELECT max(number),
    sum(number) FROM numbers_mt(N) GROUP BY number % 3` — README.md:80)
    through the dialect layer's numbers() rewrite."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT number % 3 AS g3, max(number) AS max_n, sum(number) AS sum_n "
        "FROM numbers_mt(1000000) GROUP BY g3"
    )


@register(
    "dialect_limit_by",
    oracle="""
    SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY user_id, ts, event_id) AS rn
        FROM events
    ) t WHERE rn <= 2
    """,
    tags=("dialect", "limit_by"),
)
def dialect_limit_by(spark, sf_dir):
    """ClickHouse `LIMIT n BY col` through the rewriter's row_number
    transform (plan_limit_by.rs semantics, deterministic ordering)."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT user_id, event_id FROM events ORDER BY user_id, ts, event_id LIMIT 2 BY user_id"
    )


@register(
    "dialect_scalar_surface",
    oracle="""
    SELECT CAST(number AS SMALLINT) AS i16,
           CAST(number * 2 AS BIGINT) AS dbl,
           substring(CAST(number AS VARCHAR), 1, 1) AS first_digit,
           CAST(number AS BIGINT) % 7 AS m7
    FROM (SELECT range AS number FROM range(1000))
    WHERE number BETWEEN 100 AND 900 AND NOT (number % 10 = 0)
    """,
    tags=("dialect", "scalar", "cast"),
)
def dialect_scalar_surface(spark, sf_dir):
    """Named casts (toInt16/toString), substring, BETWEEN desugaring
    (plan_parser.rs:941-961), modulo — the §2.8 scalar surface through
    the dialect."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT toInt16(number) AS i16, toInt64(number * 2) AS dbl, "
        "substring(toString(number), 1, 1) AS first_digit, toInt64(number) % 7 AS m7 "
        "FROM numbers(1000) WHERE number BETWEEN 100 AND 900 AND NOT (number % 10 = 0)"
    )
