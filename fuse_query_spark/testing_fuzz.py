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
]


def gen_query(seed: int) -> str:
    """One deterministic random aggregate query (valid in both Spark
    SQL and DuckDB)."""
    rng = random.Random(seed)
    keys = rng.sample(KEY_COLS, rng.randint(0, 2))
    aggs = []
    for i in range(rng.randint(1, 3)):
        tmpl = rng.choice(AGGS)
        col = rng.choice(AGG_COLS)
        aggs.append(tmpl.format(c=col) + f" AS a{i}")
    filters = [
        rng.choice(FILTERS).format(
            q=rng.randint(5, 45), m=rng.randint(2, 9), ln=rng.randint(1, 6), mo=rng.randint(1, 9)
        )
        for _ in range(rng.randint(0, 2))
    ]
    sql = "SELECT "
    sql += ", ".join(keys + aggs)
    sql += " FROM lineitem"
    if filters:
        sql += " WHERE " + " AND ".join(filters)
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
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
