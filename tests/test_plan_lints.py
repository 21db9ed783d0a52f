"""Registry-wide plan lints: scale-hardening invariants over EVERY query.

The per-query plan gates in test_plans.py check specific shapes
(pushdown, broadcast choice, top-k). This module is the complement: a
sweep over the whole registry asserting the *absence* of the plan
patterns that silently break at 100 TB even though they pass every
small-SF correctness check:

- ``CartesianProduct`` — O(n*m) row explosion; never acceptable.
- ``BatchEvalPython`` — row-at-a-time Python UDF in the plan; the only
  sanctioned Python execution is Arrow-batched (ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas), per SCALE.md "UDF policy".
- nondeterministic expressions (rand / uuid / monotonically_increasing_id)
  in the *optimized* plan — they break retry semantics: a recomputed
  task would emit different rows, so any operator relying on them is
  only correct until the first executor loss. All sampling/split ops
  here are hash-deterministic by design (operators/sampling.py).
- ``BroadcastNestedLoopJoin`` whose broadcast side is NOT a keyless
  aggregate — keyless agg == guaranteed exactly-1-row build side (the
  scalar-subquery pattern: q11/q22 thresholds, corpus-total joins),
  which is a constant-size broadcast at any scale. Anything else being
  BNLJ'd would ship an unbounded build side to every executor.
- a *forced* broadcast hint (ResolvedHint in the analyzed plan) whose
  subtree scans a fact table (lineitem/orders/events/documents/
  embeddings) without an intervening Aggregate. Statistics-driven
  broadcasts at sf0.001 are fine — AQE re-decides at real scale — but
  an explicit hint overrides statistics forever, so a hinted fact scan
  must be reduced (aggregated) before broadcast.

Reference posture: fuse-query picks join/shuffle strategy statically in
its planner (fusequery/query/src/interpreters/plan_scheduler.rs); we
delegate the choice to Catalyst/AQE, so THE thing to gate is that no
query takes the choice away from AQE in a way that can't scale.
"""

from __future__ import annotations

import pytest

from fuse_query_spark.queries import load_registry

SF_DIR = "/root/testdata/sf0.001"

FACT_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}

KEYLESS_AGG_MARKERS = (
    "HashAggregate(keys=[]",
    "SortAggregate(keys=[]",
    "ObjectHashAggregate(keys=[]",
)

NONDETERMINISTIC_MARKERS = ("rand(", "uuid()", "monotonically_increasing_id")


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.length()):
        yield from _walk(children.apply(i))


def _lint(df):
    """Return a list of issue strings for one DataFrame's plans."""
    issues = []
    qe = df._jdf.queryExecution()
    spark_plan = qe.sparkPlan()
    plan_str = spark_plan.treeString()
    optimized_str = qe.optimizedPlan().treeString()

    if "CartesianProduct" in plan_str:
        issues.append("CartesianProduct in physical plan")
    if "BatchEvalPython" in plan_str:
        issues.append("row-at-a-time Python UDF (BatchEvalPython) in physical plan")
    for marker in NONDETERMINISTIC_MARKERS:
        if marker in optimized_str:
            issues.append(f"nondeterministic expression {marker!r} in optimized plan")

    for node in _walk(spark_plan):
        if "BroadcastNestedLoopJoin" not in node.getClass().getSimpleName():
            continue
        build_left = "BuildLeft" in str(node.buildSide())
        build = node.children().apply(0 if build_left else 1)
        build_str = build.treeString()
        if not any(m in build_str for m in KEYLESS_AGG_MARKERS):
            issues.append(
                "BroadcastNestedLoopJoin with non-keyless-aggregate build side "
                "(unbounded broadcast)"
            )

    for node in _walk(qe.analyzed()):
        if node.getClass().getSimpleName() != "ResolvedHint":
            continue
        subtree = node.treeString().lower()
        hinted_facts = sorted(t for t in FACT_TABLES if t in subtree)
        if hinted_facts and "aggregate" not in subtree:
            issues.append(
                f"forced broadcast hint over unreduced fact table(s) {hinted_facts}"
            )

    return issues


@pytest.fixture(scope="module")
def registry():
    return load_registry()


def test_registry_plan_lints(spark, registry):
    """Every registry query's plan passes every lint (one sweep, one report)."""
    failures = {}
    for name, spec in registry.items():
        df = spec.fn(spark, SF_DIR)
        issues = _lint(df)
        if issues:
            failures[name] = issues
    assert not failures, "plan lints failed:\n" + "\n".join(
        f"  {n}: {'; '.join(iss)}" for n, iss in sorted(failures.items())
    )


# Registry queries whose physical plan contains a PARTITION-LESS window
# (Spark's "Moving all data to a single partition" warning — an executor
# OOM at 100 TB). Each entry must be the ORACLE-PORTABILITY form of an
# operator that ALSO ships a window-free scale path; the lint verifies
# that claim by building the named variant and asserting its plan has
# no Window at all, so a justification can never go stale into fiction
# (the r6 verdict caught exactly that: a docstring pointing to an
# approx variant that didn't exist).
GLOBAL_WINDOW_JUSTIFIED = {
    # exact ntile banding is the DuckDB-hashable twin; bands="approx"
    # (percentile_approx thresholds + CASE) is the 100 TB path
    "text_perplexity_bands": lambda spark: __import__(
        "fuse_query_spark.operators.text", fromlist=["perplexity_bands"]
    ).perplexity_bands(
        __import__(
            "fuse_query_spark.sources.tables", fromlist=["table"]
        ).table(spark, SF_DIR, "documents"),
        bands="approx",
    ),
    # exact top-frac cut is the hashable twin; cut="approx"
    # (one percentile_approx threshold) is the 100 TB path
    "sample_dsir_importance": lambda spark: __import__(
        "fuse_query_spark.operators.sampling", fromlist=["dsir_select"]
    ).dsir_select(
        __import__(
            "fuse_query_spark.sources.tables", fromlist=["table"]
        ).table(spark, SF_DIR, "documents"),
        cut="approx",
    ),
}

_WINDOW_EXEC_CLASSES = ("WindowExec", "WindowGroupLimitExec", "WindowInPandasExec")


def _global_windows(df) -> list[str]:
    hits = []
    for node in _walk(df._jdf.queryExecution().sparkPlan()):
        cls = node.getClass().getSimpleName()
        if cls in _WINDOW_EXEC_CLASSES and node.partitionSpec().isEmpty():
            hits.append(cls)
    return hits


def test_no_unjustified_global_window(spark, registry):
    """No registry query may move the whole input into ONE partition
    via a partition-less window unless its operator ships a verified
    window-free scale variant (GLOBAL_WINDOW_JUSTIFIED). The allowlist
    is checked both ways: unlisted offenders fail, and stale entries
    (no longer exhibiting a global window) fail too."""
    offenders = {}
    for name, spec in registry.items():
        hits = _global_windows(spec.fn(spark, SF_DIR))
        if hits:
            offenders[name] = hits
    unjustified = {n: h for n, h in offenders.items() if n not in GLOBAL_WINDOW_JUSTIFIED}
    assert not unjustified, (
        "partition-less Window in registry plans without a justified "
        f"scale variant: {unjustified}"
    )
    stale = sorted(set(GLOBAL_WINDOW_JUSTIFIED) - set(offenders))
    assert not stale, f"GLOBAL_WINDOW_JUSTIFIED entries no longer needed: {stale}"
    # every justification must be real: the scale variant's plan holds
    # NO window at all (not merely a partitioned one)
    for name, build in GLOBAL_WINDOW_JUSTIFIED.items():
        variant_plan = (
            build(spark)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in variant_plan, (
            f"{name}: the claimed scale variant still contains a Window"
        )


def test_lint_catches_cartesian(spark):
    """Self-test: the lint actually fires on a genuine cartesian product."""
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    bad = a.crossJoin(b)
    assert any("Cartesian" in i or "BroadcastNestedLoopJoin" in i for i in _lint(bad))


def test_lint_catches_row_udf(spark):
    """Self-test: a row-at-a-time Python UDF is flagged."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())
    bad = spark.range(10).select(slow("id").alias("y"))
    assert any("BatchEvalPython" in i for i in _lint(bad))


def test_lint_catches_nondeterminism(spark):
    """Self-test: rand() in the plan is flagged."""
    from pyspark.sql import functions as F

    bad = spark.range(10).select(F.rand(42).alias("r"))
    assert any("nondeterministic" in i for i in _lint(bad))


def test_lint_accepts_scalar_subquery_pattern(spark):
    """Self-test: the whitelisted 1-row-aggregate broadcast passes."""
    from pyspark.sql import functions as F

    a = spark.range(100).withColumn("v", F.col("id") * 2)
    total = a.agg(F.sum("v").alias("total"))
    ok = a.crossJoin(total).filter(F.col("v") > F.col("total") / 200)
    assert _lint(ok) == []


def test_driver_priority_schemas_atomic(spark):
    """Every driver-facing query emits only atomic, non-decimal columns.

    The driver's correctness gate canonicalizes results through pandas
    (sort_values + per-cell hashing); Array/Map/Struct cells are
    unhashable there (killed agg_approx in r2 and embedding_pq_encode
    in r5) and Decimal cells stringify differently than the DuckDB
    oracle's float64 (killed correlated_scalar_subquery in r5). Gate
    the whole 50-slot prefix so the class can't recur: complex values
    must be exploded to scalars or stringified before the boundary.
    """
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    from fuse_query_spark.queries import DRIVER_PRIORITY, load_registry

    reg = load_registry()
    failures = {}
    for name in DRIVER_PRIORITY:
        df = reg[name].fn(spark, SF_DIR)
        bad = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType, DecimalType))
        ]
        if bad:
            failures[name] = bad
    assert not failures, (
        "driver-facing queries with non-atomic/decimal output columns "
        "(explode or cast at the boundary):\n"
        + "\n".join(f"  {n}: {c}" for n, c in sorted(failures.items()))
    )
