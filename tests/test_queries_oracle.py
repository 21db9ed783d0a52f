"""Every registered query must match its DuckDB oracle at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

import pytest

from fuse_query_spark.queries import load_registry
from fuse_query_spark.testing import compare_query

REGISTRY = load_registry()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, oracle, sf_dir, name):
    spec = REGISTRY[name]
    n_rows, problems = compare_query(spark, oracle, spec, sf_dir)
    assert not problems, f"{name}: {problems}"
    if spec.oracle is None:
        # rows-only checks must at least run and return a stable schema
        assert n_rows >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    # driver view = registry minus the hidden xxhash64 fast-path twins
    from fuse_query_spark.queries import DRIVER_HIDDEN

    assert set(qs) == set(REGISTRY) - DRIVER_HIDDEN
