"""System tables (reference: datasources/system/*.rs) as DataFrame
factories, built at query time from the engine's catalog/settings —
the same design the reference uses (SHOW is rewritten onto them,
plan_parser.rs:105-127).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_values_df(spark: SparkSession, rows, cols) -> DataFrame:
    """All-STRING table as a VALUES literal — plans as LocalTableScan,
    so .collect() executes ON THE DRIVER with no Spark job and no task
    slot. This is an availability property, not an optimization:
    createDataFrame(python_list) yields an ExistingRDD scan whose
    collect needs a free task slot, so SHOW PROCESSLIST and KILL QUERY
    built that way BLOCK exactly when the pool is saturated by the
    query you are trying to inspect or kill (r5 finding — the
    serving-path deadlock a busy cluster cannot afford)."""

    def lit(v):
        if v is None:
            return "CAST(NULL AS STRING)"
        txt = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return "'" + txt + "'"

    names = ", ".join(cols)
    if not rows:
        nulls = "(" + ", ".join("CAST(NULL AS STRING)" for _ in cols) + ")"
        return spark.sql(f"SELECT * FROM (VALUES {nulls}) AS t({names}) WHERE 1=0")
    vals = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return spark.sql(f"SELECT * FROM (VALUES {vals}) AS t({names})")


def tables_table(spark: SparkSession, catalog) -> DataFrame:
    """system.tables: (database, name, engine) — tables_table.rs:21."""
    rows = [
        (db, name, tdef.engine)
        for db, tables in catalog.databases.items()
        for name, tdef in tables.items()
    ]
    rows += [("system", n, "SystemTables") for n in SYSTEM_TABLE_NAMES]
    return spark.createDataFrame(rows or [("", "", "")], "database STRING, name STRING, engine STRING").filter(
        "database != ''"
    )


def columns_table(spark: SparkSession, catalog) -> DataFrame:
    """system.columns: (database, table, name, type, position,
    is_partition_key) — extension past the reference's system set
    (ClickHouse-style), driven by the declared reader schemas so it
    reflects ALTER TABLE evolution without touching data files."""
    rows = []
    for db, tables in catalog.databases.items():
        for tname, tdef in tables.items():
            if tdef.schema is None:
                continue
            for pos, f in enumerate(tdef.schema.fields):
                rows.append(
                    (
                        db,
                        tname,
                        f.name,
                        f.dataType.simpleString(),
                        pos,
                        f.name in (tdef.partition_by or ()),
                    )
                )
    schema = (
        "database STRING, table STRING, name STRING, type STRING,"
        " position INT, is_partition_key BOOLEAN"
    )
    return spark.createDataFrame(
        rows or [("", "", "", "", 0, False)], schema
    ).filter("database != ''")


_QUERY_LOG_SCHEMA = (
    "query_id LONG, query STRING, state STRING, duration_ms DOUBLE,"
    " event_time STRING"
)


def query_log_table(spark: SparkSession, records=None) -> DataFrame:
    """system.query_log: typed completed-statement history (query_id,
    query, state, duration_ms, event_time) — ClickHouse-style extension
    past the reference's system set; same ring-buffer discipline as
    system.tracing (engine.py Engine._trace_record appends both)."""
    rows = [
        (r["query_id"], r["query"], r["state"], r["duration_ms"], r["event_time"])
        for r in list(records or [])
    ]
    return spark.createDataFrame(rows, _QUERY_LOG_SCHEMA)


def databases_table(spark: SparkSession, catalog) -> DataFrame:
    """system.databases: (name) — databases_table.rs:21."""
    rows = [(db,) for db in sorted(catalog.databases)] + [("system",)]
    return spark.createDataFrame(rows, "name STRING")


def functions_table(spark: SparkSession) -> DataFrame:
    """system.functions: (name, is_aggregate) — functions_table.rs:23."""
    from fuse_query_spark.functions.registry import all_function_rows

    return spark.createDataFrame(all_function_rows(), "name STRING, is_aggregate BOOLEAN")


def settings_table(spark: SparkSession, settings: dict) -> DataFrame:
    """system.settings: (name, value, default_value, description) —
    settings_table.rs:21."""
    rows = [(k, str(v.value), str(v.default), v.description) for k, v in settings.items()]
    return spark.createDataFrame(
        rows, "name STRING, value STRING, default_value STRING, description STRING"
    )


def one_table(spark: SparkSession) -> DataFrame:
    """system.one: single row dummy=0 — one_table.rs:21-88."""
    return spark.range(1).selectExpr("CAST(0 AS TINYINT) AS dummy")


_PROCESSES_SCHEMA = "id STRING, host STRING, state STRING, database STRING, extra_info STRING"


def processes_table(
    spark: SparkSession, current_db: str = "default", statements: dict | None = None
) -> DataFrame:
    """system.processes — LIVE analogue of processes_table.rs:27-41
    (column parity: id/host/state/database/extra_info, all Utf8). The
    reference threads rows-read progress into each ProcessInfo via
    stream_progress.rs:18; Spark's equivalent live source is the
    SparkContext status tracker, so this emits one row per statement
    currently inside Engine.sql() (id, query text, elapsed) plus one
    row per ACTIVE Spark job with stage/task progress in extra_info —
    queryable from another thread while a query runs."""
    import time as _time

    rows = []
    # Snapshot: other threads' Engine._execute mutates this dict while
    # we iterate (concurrent polling is the feature); list() of items
    # is atomic under the GIL.
    for pid, info in list((statements or {}).items()):
        elapsed = _time.time() - info["start"]
        rows.append(
            (
                str(pid),
                "localhost",
                info.get("state", "Executing"),
                info.get("database", current_db),
                f"query={info.get('query', '')[:120]} elapsed={elapsed:.3f}s",
            )
        )
    tracker = spark.sparkContext.statusTracker()
    for jid in tracker.getActiveJobsIds():
        jinfo = tracker.getJobInfo(jid)
        if jinfo is None:  # job finished between the two calls
            continue
        total = done = active = 0
        for sid in jinfo.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                total += sinfo.numTasks
                done += sinfo.numCompletedTasks
                active += sinfo.numActiveTasks
        rows.append(
            (
                f"job-{jid}",
                "localhost",
                str(jinfo.status),
                current_db,
                f"stages={len(jinfo.stageIds)} tasks={done}/{total} active={active}",
            )
        )
    return local_values_df(
        spark, rows, ["id", "host", "state", "database", "extra_info"]
    )


def contributors_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([("fuse-query-spark",)], "name STRING")


def clusters_table(spark: SparkSession, cluster=None) -> DataFrame:
    """Cluster topology (clusters_table.rs reads the Cluster registry):
    the local Spark app plus any nodes registered through the HTTP API
    (/v1/cluster/add — servers/http_api.py). Spark owns EXECUTION
    topology; this is the reference's membership metadata surface."""
    rows = [(spark.sparkContext.applicationId, "local", 0)]
    if cluster is not None:
        rows += [(n["name"], n["address"], n["priority"]) for n in cluster.get_nodes()]
    return spark.createDataFrame(rows, "name STRING, address STRING, priority INT")


_TRACING_SCHEMA = (
    "v BIGINT, name STRING, msg STRING, level TINYINT, hostname STRING, pid BIGINT, time STRING"
)


def tracing_table(spark: SparkSession, records=None) -> DataFrame:
    """system.tracing — LIVE ring buffer of executed statements with
    timings, field-parity with tracing_table.rs:33-41 (the reference
    reads bunyan-style structured log lines: v/name/msg/level/
    hostname/pid/time; its sample row is a per-operator cost span).
    The engine appends one record per statement (Engine._trace_record);
    list() snapshots the deque against concurrent appends."""
    rows = [
        (r["v"], r["name"], r["msg"], r["level"], r["hostname"], r["pid"], r["time"])
        for r in list(records or [])
    ]
    return spark.createDataFrame(rows, _TRACING_SCHEMA) if rows else spark.createDataFrame(
        [], _TRACING_SCHEMA
    )


def metrics_table(spark: SparkSession) -> DataFrame:
    """system.metrics: (metric, value) — the SQL view of the
    process-wide metrics registry the wire servers record into
    (servers/metrics.py; the reference exposes the same counters only
    through its Prometheus endpoint, metric_service.rs:73-87 — a SQL
    surface for them is the natural system-table extension).
    Histograms surface as <name>_sum / <name>_count rows."""
    from fuse_query_spark.servers.metrics import METRICS

    rows = METRICS.snapshot()
    return spark.createDataFrame(
        rows or [("", 0.0)], "metric STRING, value DOUBLE"
    ).filter("metric != ''")


def parts_table(spark: SparkSession, catalog) -> DataFrame:
    """system.parts — file-level storage metadata for file-engine
    tables, one row per partition leaf: (database, name, partition,
    files, bytes, rows). ClickHouse's system.parts analogue at parquet
    granularity (extension — the reference exposes no parts table).

    Reads directory listings and parquet FOOTERS only (num_rows is
    footer metadata), never data pages; on a real deployment this is a
    metastore/manifest listing. `rows` is NULL for non-parquet engines
    (CSV/JSON carry no row count without a scan — a listing table must
    never scan). Pairs with OPTIMIZE TABLE: query system.parts for
    partitions whose file count warrants compaction, then rewrite only
    those subtrees."""
    import os

    import pyarrow.parquet as pq

    out = []
    for db in sorted(catalog.databases):
        for name in sorted(catalog.databases[db]):
            tdef = catalog.databases[db][name]
            if tdef.engine not in ("Parquet", "CSV", "JSONEachRow", "ORC"):
                continue
            if not tdef.location or not os.path.isdir(tdef.location):
                continue
            leaves: dict[str, list] = {}
            for root, _dirs, files in os.walk(tdef.location):
                for f in files:
                    if f.startswith(("_", ".")):
                        continue
                    rel = os.path.relpath(root, tdef.location)
                    leaf = "" if rel == "." else rel
                    e = leaves.setdefault(leaf, [0, 0, 0])
                    p = os.path.join(root, f)
                    e[0] += 1
                    e[1] += os.path.getsize(p)
                    if f.endswith(".parquet"):
                        e[2] += pq.ParquetFile(p).metadata.num_rows
            for leaf in sorted(leaves):
                files_n, bytes_n, rows_n = leaves[leaf]
                out.append(
                    (
                        db,
                        name,
                        leaf,
                        files_n,
                        bytes_n,
                        rows_n if tdef.engine == "Parquet" else None,
                    )
                )
    cols = ["database", "name", "partition", "files", "bytes", "rows"]
    return local_values_df(spark, out, cols).selectExpr(
        "database",
        "name",
        "partition",
        *[f"CAST({c} AS BIGINT) AS {c}" for c in ("files", "bytes", "rows")],
    )


SYSTEM_TABLE_NAMES = (
    "tables",
    "databases",
    "functions",
    "settings",
    "one",
    "processes",
    "contributors",
    "clusters",
    "tracing",
    "metrics",
    "parts",
    "columns",
    "query_log",
)
