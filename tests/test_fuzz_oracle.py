"""Differential fuzzing vs DuckDB: 60 seeded random queries over
lineitem (+ a fact-dim join to orders, HAVING, ORDER BY + LIMIT, CASE
and string-length aggregates) must hash-match exactly (SQL subset
valid on both engines, integer-only aggregates)."""

import pytest

from fuse_query_spark.sources.tables import table
from fuse_query_spark.testing_fuzz import gen_query, run_case

SEEDS = list(range(60))


@pytest.fixture(scope="module", autouse=True)
def lineitem_view(spark, sf_dir):
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")


def test_generator_is_deterministic():
    assert gen_query(7) == gen_query(7)
    assert gen_query(7) != gen_query(8)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_case_matches_duckdb(spark, oracle, seed):
    problems = run_case(spark, oracle, seed)
    assert not problems, problems


@pytest.mark.parametrize("seed", list(range(44)))
def test_advanced_fuzz_matches_duckdb(spark, oracle, seed):
    """Window / set-op / subquery grammar — 4 passes over the 11
    templates with varied fills."""
    from fuse_query_spark.testing_fuzz import run_advanced_case

    problems = run_advanced_case(spark, oracle, seed)
    assert not problems, problems


@pytest.fixture(scope="module")
def dialect_engine(spark):
    from fuse_query_spark.engine import Engine

    return Engine(spark=spark)


@pytest.mark.parametrize("seed", list(range(30)))
def test_dialect_fuzz_matches_duckdb(dialect_engine, oracle, seed):
    """Dialect-layer differential fuzzing: ClickHouse-dialect SQL
    through Engine.sql vs an INDEPENDENTLY constructed DuckDB
    equivalent (built from the template, not our rewriter — a rewriter
    bug cannot cancel out of both sides)."""
    from fuse_query_spark.testing_fuzz import run_dialect_case

    problems = run_dialect_case(dialect_engine, oracle, seed)
    assert not problems, problems


@pytest.mark.parametrize("seed", list(range(14)))
def test_dml_fuzz_memory_matches_duckdb(dialect_engine, oracle, seed):
    """Differential DML fuzzing (Memory engine): identical
    INSERT/UPDATE/DELETE sequences on both engines, full-state compare
    after every mutation — NULL-predicate semantics included."""
    from fuse_query_spark.testing_fuzz import run_dml_case

    problems = run_dml_case(dialect_engine, oracle, seed)
    assert not problems, problems


@pytest.mark.parametrize("seed", list(range(4)))
def test_dml_fuzz_partitioned_parquet_matches_duckdb(
    dialect_engine, oracle, seed, tmp_path
):
    """Same, over a partitioned Parquet table: exercises the
    partition-scoped rewrite, partition-only predicates, and
    partition-move updates against DuckDB's plain-table semantics."""
    from fuse_query_spark.testing_fuzz import run_dml_case

    problems = run_dml_case(
        dialect_engine, oracle, seed, parquet_loc=str(tmp_path / f"dmlpq{seed}")
    )
    assert not problems, problems


@pytest.mark.parametrize("seed", range(10))
def test_dml_fuzz_snapshot_time_travel_matches_duckdb(
    dialect_engine, oracle, seed, tmp_path
):
    """MVCC differential fuzz: every random DML sequence must leave a
    history where VERSION AS OF k equals DuckDB's state after op k —
    the whole version chain is checked, not just the final table."""
    from fuse_query_spark.testing_fuzz import run_snapshot_dml_case

    problems = run_snapshot_dml_case(
        dialect_engine, oracle, seed, str(tmp_path / f"snapfuzz{seed}")
    )
    assert not problems, "\n".join(problems)
