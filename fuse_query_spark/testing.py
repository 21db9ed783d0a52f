"""Shared correctness-compare helpers (used by pytest and
tools/check_oracle.py). Mirrors the driver's t2 gate: row count +
column names + order-insensitive value hash, with floats compared via
exact repr (our exact-decimal strategy makes aggregates bit-stable)."""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from fuse_query_spark.sources.tables import TABLES


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(rows, colnames) -> tuple[str, list[str]]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16], lines


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare_query(spark, con, spec, sf_dir: str) -> tuple[int, list[str]]:
    """Returns (spark_row_count, problems). Empty problems == pass."""
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if spec.oracle is None:
        return len(srows), []
    ores = con.execute(spec.oracle)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
    if not problems:
        sh, sl = table_hash(srows, scols)
        oh, ol = table_hash(orows, ocols)
        if sh != oh:
            oset, sset = set(ol), set(sl)
            diff_s = [x for x in sl if x not in oset][:3]
            diff_o = [x for x in ol if x not in sset][:3]
            problems.append(f"hash mismatch; spark-only={diff_s} duckdb-only={diff_o}")
    return len(srows), problems
