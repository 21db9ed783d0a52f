"""Seeded mini-fuzzer: generates random (but reproducible) SELECTs
over the integer/string columns of the star schema and cross-checks
Spark vs DuckDB — a lightweight sqlsmith for the subset both engines
share. Integer-only aggregates keep value hashing exact.
"""

from __future__ import annotations

import random

AGG_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
KEY_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
FILTERS = [
    "l_quantity > {q}",
    "l_orderkey % {m} = 0",
    "l_returnflag IN ('A', 'R')",
    "l_linenumber <= {ln}",
    "l_shipdate >= TIMESTAMP '1997-0{mo}-01 00:00:00'",
]
AGGS = [
    "COUNT(*)",
    "COUNT(DISTINCT {c})",
    "CAST(SUM({c}) AS BIGINT)",
    "CAST(MIN({c}) AS BIGINT)",
    "CAST(MAX({c}) AS BIGINT)",
    "CAST(SUM({c} % 97) AS BIGINT)",
    # r5 grammar widening — still in the exact-integer shared subset:
    "CAST(SUM(CASE WHEN {c} % {m2} = 0 THEN 1 ELSE 0 END) AS BIGINT)",
    "CAST(SUM(LENGTH(l_returnflag || l_linestatus)) AS BIGINT)",
    "CAST(MAX(LENGTH(CAST({c} AS STRING))) AS BIGINT)",
]


def gen_query(seed: int) -> str:
    """One deterministic random aggregate query (valid in both Spark
    SQL and DuckDB). Seeds cycle through plain aggregates, HAVING,
    ORDER BY + LIMIT (deterministic: group keys are unique), and a
    fact-dim join to orders."""
    rng = random.Random(seed)
    keys = rng.sample(KEY_COLS, rng.randint(0, 2))
    join = rng.random() < 0.3
    aggs = []
    for i in range(rng.randint(1, 3)):
        tmpl = rng.choice(AGGS)
        col = rng.choice(AGG_COLS)
        aggs.append(tmpl.format(c=col, m2=rng.randint(2, 7)) + f" AS a{i}")
    filters = [
        rng.choice(FILTERS).format(
            q=rng.randint(5, 45), m=rng.randint(2, 9), ln=rng.randint(1, 6), mo=rng.randint(1, 9)
        )
        for _ in range(rng.randint(0, 2))
    ]
    if join:
        filters.append("o_orderpriority IN ('1-URGENT', '2-HIGH')")
    sql = "SELECT "
    sql += ", ".join(keys + aggs)
    sql += " FROM lineitem"
    if join:
        sql += " JOIN orders ON o_orderkey = l_orderkey"
    if filters:
        sql += " WHERE " + " AND ".join(filters)
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
        if rng.random() < 0.4:
            sql += " HAVING COUNT(*) > " + str(rng.randint(1, 5))
        if rng.random() < 0.4:
            # group keys are unique per row -> deterministic order/limit
            sql += " ORDER BY " + ", ".join(keys) + f" LIMIT {rng.randint(1, 50)}"
    return sql


def run_case(spark, con, seed: int, views_registered: bool = True) -> list[str]:
    """Execute one fuzz case on both engines; returns problems list."""
    from fuse_query_spark.testing import table_hash

    sql = gen_query(seed)
    sdf = spark.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    ores = con.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    problems = []
    if len(srows) != len(orows):
        problems.append(f"seed {seed}: rowcount {len(srows)} vs {len(orows)} :: {sql}")
    else:
        sh, _ = table_hash(srows, sdf.columns)
        oh, _ = table_hash(orows, ocols)
        if sh != oh:
            problems.append(f"seed {seed}: hash mismatch :: {sql}")
    return problems
