"""Remote engine / store analog (sources/remote_store.py): the
reference's fusestore-backed Remote engine (remote_table.rs:27-181,
remote_database.rs) mapped to an HTTP meta service + direct executor
scans of store parquet parts.
"""

from __future__ import annotations

import pytest

from fuse_query_spark.engine import Engine
from fuse_query_spark.errors import FuseQueryError, UnknownDatabase, UnknownTable
from fuse_query_spark.sources.remote_store import FuseStore, StoreClient


@pytest.fixture()
def store(tmp_path):
    s = FuseStore(str(tmp_path / "store"))
    s.start()
    yield s
    s.stop()


def _engine(spark, store) -> Engine:
    eng = Engine(spark)
    eng.attach_store(store.url)
    return eng


class TestRemoteEngine:
    def test_create_shows_remote_engine(self, spark, store):
        eng = _engine(spark, store)
        eng.sql("CREATE DATABASE db1; USE db1; CREATE TABLE t1(a int, b varchar)")
        rows = eng.sql("SELECT * FROM system.tables WHERE database='db1'").collect()
        assert [(r.database, r.name, r.engine) for r in rows] == [("db1", "t1", "remote")]

    def test_local_database_stays_local(self, spark, store):
        # 05_0001 shape: ENGINE = Local bypasses the store entirely
        eng = _engine(spark, store)
        eng.sql("CREATE DATABASE dbl ENGINE = Local; CREATE TABLE dbl.t(c1 int) ENGINE = Null")
        rows = eng.sql("SELECT engine FROM system.tables WHERE database='dbl'").collect()
        assert rows[0].engine == "Null"
        assert "dbl" not in store.state.meta

    def test_insert_select_roundtrip(self, spark, store):
        eng = _engine(spark, store)
        eng.sql(
            "CREATE DATABASE db1; USE db1;"
            "CREATE TABLE nums(n bigint, s varchar);"
            "INSERT INTO nums SELECT number, CAST(number % 3 AS STRING) FROM numbers(1000)"
        )
        out = eng.sql("SELECT COUNT(*) AS c, SUM(n) AS s FROM nums").collect()[0]
        assert (out.c, out.s) == (1000, 499500)

    def test_values_literal_parity(self, spark, store):
        # plan_parser.rs:348-371 renders value tuples via
        # Value::to_string() — quoted strings keep their quotes
        # (09_0001_remote_insert.result pins this)
        eng = _engine(spark, store)
        eng.sql(
            "CREATE DATABASE db1; USE db1;"
            "CREATE TABLE t1(a varchar, b varchar);"
            "INSERT INTO t1(a,b) VALUES('1', 'v1'),('2','v2')"
        )
        rows = sorted((r.a, r.b) for r in eng.sql("SELECT * FROM t1").collect())
        assert rows == [("'1'", "'v1'"), ("'2'", "'v2'")]

    def test_cross_engine_visibility(self, spark, store):
        # the real fusestore semantic: a second query node attaching
        # the same store sees the first node's tables AND data
        a = _engine(spark, store)
        a.sql(
            "CREATE DATABASE shared; "
            "CREATE TABLE shared.t(n bigint);"
            "INSERT INTO shared.t SELECT number FROM numbers(100)"
        )
        b = _engine(spark, store)
        assert b.sql("SELECT COUNT(*) AS c FROM shared.t").collect()[0].c == 100
        assert "shared" in b.catalog.remote_dbs

    def test_store_restart_persists_meta(self, spark, store, tmp_path):
        eng = _engine(spark, store)
        eng.sql(
            "CREATE DATABASE keep; CREATE TABLE keep.t(n bigint);"
            "INSERT INTO keep.t SELECT number FROM numbers(10)"
        )
        root = store.state.root
        store.stop()
        revived = FuseStore(root)
        revived.start()
        try:
            eng2 = Engine(spark)
            eng2.attach_store(revived.url)
            assert eng2.sql("SELECT SUM(n) AS s FROM keep.t").collect()[0].s == 45
        finally:
            revived.stop()

    def test_drop_table_removes_store_files(self, spark, store):
        import os

        eng = _engine(spark, store)
        eng.sql(
            "CREATE DATABASE db1; CREATE TABLE db1.t(n bigint);"
            "INSERT INTO db1.t SELECT number FROM numbers(10)"
        )
        tdir = os.path.join(store.state.root, "db1", "t")
        assert any(p.endswith(".parquet") for p in os.listdir(tdir))
        eng.sql("DROP TABLE db1.t")
        assert not os.path.exists(tdir)
        with pytest.raises(FuseQueryError) as exc:
            eng.sql("DROP TABLE db1.t")
        assert exc.value.code == 25

    def test_drop_database_error_code(self, spark, store):
        eng = _engine(spark, store)
        eng.sql("CREATE DATABASE db1; DROP DATABASE db1")
        with pytest.raises(FuseQueryError) as exc:
            eng.sql("DROP DATABASE db1")
        assert exc.value.code == 3

    def test_remote_scan_pushes_filters(self, spark, store):
        # read_plan returns part paths and Spark scans them directly,
        # so scan-level pushdown must survive the remote indirection
        eng = _engine(spark, store)
        eng.sql(
            "CREATE DATABASE db1; USE db1; CREATE TABLE t(n bigint);"
            "INSERT INTO t SELECT number FROM numbers(10000)"
        )
        df = eng.sql("SELECT n FROM t WHERE n > 9990")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(n), GreaterThan(n,9990)]" in plan
        assert df.count() == 9


class TestStoreClient:
    def test_meta_errors_map_to_reference_codes(self, store):
        c = StoreClient(store.url)
        with pytest.raises(UnknownDatabase):
            c.drop_database("nope")
        c.create_database("db")
        with pytest.raises(UnknownTable):
            c.read_plan("db", "nope")
        with pytest.raises(UnknownTable):
            c.append_parquet("db", "nope", b"")

    def test_illegal_identifiers_rejected(self, store):
        c = StoreClient(store.url)
        with pytest.raises(ConnectionError):
            c.create_database("../evil")
