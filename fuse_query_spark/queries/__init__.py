"""Query catalog: the correctness surface declared to the driver.

Every operator from SURVEY.md §2 that we claim as implemented appears
here as a named query with (a) a Spark callable ``fn(spark, sf_dir) ->
DataFrame`` and (b) where SQL-expressible, a DuckDB oracle SQL string
over the same parquet tables. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver records rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

_MODULES = [
    "fuse_query_spark.queries.core",
    "fuse_query_spark.queries.tpch",
    "fuse_query_spark.queries.joins",
    "fuse_query_spark.queries.windows",
    "fuse_query_spark.queries.setops",
    "fuse_query_spark.queries.events",
    "fuse_query_spark.queries.text",
    "fuse_query_spark.queries.dedup",
    "fuse_query_spark.queries.sampling",
    "fuse_query_spark.queries.similarity",
    "fuse_query_spark.queries.dialect",
    "fuse_query_spark.queries.misc",
]


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            continue  # module not written yet; registry grows per round
    return REGISTRY
