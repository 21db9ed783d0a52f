"""Snapshot tables: versioned Parquet with time travel, rollback,
MVCC DML, vacuum — the lakehouse table-format surface
(sources/snapshots.py + Engine ENGINE = Snapshot integration)."""

import os

import pytest
from pyspark.sql import functions as F

from fuse_query_spark.engine import Engine
from fuse_query_spark.sources.snapshots import (
    latest_version,
    read_manifest,
    snapshot_commit,
    snapshot_history,
    snapshot_optimize,
    snapshot_read,
    snapshot_read_pruned,
    snapshot_rollback,
    snapshot_vacuum,
    zorder_key,
)


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


def one(df):
    return df.collect()[0][0]


class TestSnapshotLayer:
    def test_commit_read_versions(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, v STRING")
        df2 = spark.createDataFrame([(3, "c")], "id LONG, v STRING")
        assert snapshot_commit(df1, loc) == 0
        assert snapshot_commit(df2, loc, "append") == 1
        assert snapshot_read(spark, loc).count() == 3
        assert snapshot_read(spark, loc, version=0).count() == 2
        assert snapshot_commit(df2, loc, "overwrite") == 2
        assert snapshot_read(spark, loc).count() == 1
        # old versions still intact after the overwrite
        assert snapshot_read(spark, loc, version=1).count() == 3

    def test_data_files_are_immutable(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        snapshot_commit(spark.createDataFrame([(1,)], "id LONG"), loc)
        files_v0 = set(read_manifest(loc, 0)["files"])
        snapshot_commit(spark.createDataFrame([(2,)], "id LONG"), loc, "append")
        snapshot_commit(spark.createDataFrame([(9,)], "id LONG"), loc, "overwrite")
        # v0's physical files still exist, untouched
        for f in files_v0:
            assert os.path.exists(os.path.join(loc, f))
        assert [r["id"] for r in snapshot_read(spark, loc, version=0).collect()] == [1]

    def test_rollback_is_forward_written(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        snapshot_commit(spark.createDataFrame([(1,)], "id LONG"), loc)
        snapshot_commit(spark.createDataFrame([(2,)], "id LONG"), loc, "overwrite")
        v = snapshot_rollback(loc, 0)
        assert v == 2 and latest_version(loc) == 2
        assert [r["id"] for r in snapshot_read(spark, loc).collect()] == [1]
        # the rollback itself shows in history and is reversible
        ops = [r["operation"] for r in snapshot_history(spark, loc).collect()]
        assert ops == ["append", "overwrite", "rollback_to_v0"]
        snapshot_rollback(loc, 1)
        assert [r["id"] for r in snapshot_read(spark, loc).collect()] == [2]

    def test_vacuum_reclaims_unreferenced(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        snapshot_commit(spark.createDataFrame([(1,)], "id LONG"), loc)
        snapshot_commit(spark.createDataFrame([(2,)], "id LONG"), loc, "overwrite")
        deleted = snapshot_vacuum(loc, keep_last=1)
        assert deleted, "v0's files are unreferenced by the kept window"
        assert snapshot_read(spark, loc).count() == 1  # latest unharmed
        with pytest.raises(ValueError):
            snapshot_read(spark, loc, version=0)  # beyond retention

    def test_concurrent_commit_detected(self, spark, tmp_path):
        """Two writers that both planned v1 (same parent): the second
        rename loses and raises — the version file IS the lock."""
        from fuse_query_spark.sources.snapshots import _write_manifest

        loc = str(tmp_path / "t")
        snapshot_commit(spark.createDataFrame([(1,)], "id LONG"), loc)
        planned = dict(read_manifest(loc, 0), version=1, parent=0)
        _write_manifest(loc, planned)  # writer A lands v1
        with pytest.raises(RuntimeError, match="concurrent"):
            _write_manifest(loc, dict(planned))  # writer B loses the race
        # a writer that re-reads latest AFTER the loss commits cleanly
        assert snapshot_commit(
            spark.createDataFrame([(2,)], "id LONG"), loc, "append"
        ) == 2


class TestSnapshotEngine:
    def test_engine_end_to_end(self, engine, tmp_path):
        loc = str(tmp_path / "snap_pq")
        engine.sql("DROP TABLE IF EXISTS snap")
        engine.sql(
            f"CREATE TABLE snap(id bigint, v varchar) ENGINE = Snapshot location = '{loc}'"
        )
        engine.sql("INSERT INTO snap VALUES (1, 'a'), (2, 'b')")
        engine.sql("INSERT INTO snap VALUES (3, 'c')")
        assert one(engine.sql("SELECT count(1) FROM snap")) == 3
        # time travel
        assert one(engine.sql("SELECT count(1) FROM snap VERSION AS OF 0")) == 2
        # MVCC delete: new version, old state travelable
        engine.sql("DELETE FROM snap WHERE id = 2")
        assert one(engine.sql("SELECT count(1) FROM snap")) == 2
        assert one(engine.sql("SELECT count(1) FROM snap VERSION AS OF 1")) == 3
        # MVCC update
        engine.sql("UPDATE snap SET v = 'z' WHERE id = 1")
        assert one(engine.sql("SELECT v FROM snap WHERE id = 1")) == "z"
        assert (
            one(engine.sql("SELECT v FROM snap VERSION AS OF 2 WHERE id = 1")) == "a"
        )
        # history + rollback + vacuum
        hist = engine.sql("SHOW SNAPSHOTS FROM snap").collect()
        assert [r["version"] for r in hist] == [0, 1, 2, 3]
        engine.sql("ROLLBACK TABLE snap TO VERSION 1")
        assert one(engine.sql("SELECT count(1) FROM snap")) == 3
        deleted = engine.sql("VACUUM snap KEEP 1").collect()
        assert deleted  # older versions' files reclaimed
        assert one(engine.sql("SELECT count(1) FROM snap")) == 3
        engine.sql("DROP TABLE snap")

    def test_mixed_versions_in_one_query(self, engine, tmp_path):
        loc = str(tmp_path / "snap2_pq")
        engine.sql("DROP TABLE IF EXISTS snap2")
        engine.sql(
            f"CREATE TABLE snap2(id bigint) ENGINE = Snapshot location = '{loc}'"
        )
        engine.sql("INSERT INTO snap2 VALUES (1), (2)")
        engine.sql("INSERT INTO snap2 VALUES (3)")
        # rows added between v0 and v1, via an anti-join of two pins
        added = engine.sql(
            "SELECT a.id FROM snap2 VERSION AS OF 1 a "
            "LEFT ANTI JOIN snap2 VERSION AS OF 0 b ON a.id = b.id"
        ).collect()
        assert [r["id"] for r in added] == [3]
        engine.sql("DROP TABLE snap2")

    def test_time_travel_rejected_on_plain_engines(self, engine, tmp_path):
        engine.sql("DROP TABLE IF EXISTS plainmem")
        engine.sql("CREATE TABLE plainmem(id bigint) ENGINE = Memory")
        with pytest.raises(Exception, match="Snapshot"):
            engine.sql("SELECT * FROM plainmem VERSION AS OF 0")
        engine.sql("DROP TABLE plainmem")


class TestFileSkipping:
    def test_manifest_stats_prune_files(self, spark, tmp_path):
        from fuse_query_spark.sources.snapshots import snapshot_read_pruned

        loc = str(tmp_path / "t")
        # three commits with disjoint id ranges -> three file groups
        for lo in (0, 100, 200):
            snapshot_commit(
                spark.createDataFrame(
                    [(lo + i, f"s{lo}") for i in range(10)], "id LONG, src STRING"
                ).coalesce(1),
                loc,
                "append",
            )
        df, st = snapshot_read_pruned(spark, loc, [("id", ">=", 200)])
        assert st == {"kept": 1, "pruned": 2}
        assert df.count() == 10 and df.agg({"id": "min"}).collect()[0][0] == 200
        # equality on a string column prunes by string min/max
        df2, st2 = snapshot_read_pruned(spark, loc, [("src", "=", "s100")])
        assert st2["pruned"] == 2 and df2.count() == 10
        # pruning is an optimization, never a filter: predicate still applies
        df3, st3 = snapshot_read_pruned(spark, loc, [("id", "<", 105)])
        assert st3 == {"kept": 2, "pruned": 1}
        assert df3.count() == 15  # 10 from file0 + 5 from file1
        # a predicate matching nothing prunes everything
        df4, st4 = snapshot_read_pruned(spark, loc, [("id", ">", 10_000)])
        assert st4["kept"] == 0 and df4.count() == 0

    def test_stats_survive_rollback_and_time_travel(self, spark, tmp_path):
        from fuse_query_spark.sources.snapshots import snapshot_read_pruned

        loc = str(tmp_path / "t")
        snapshot_commit(
            spark.createDataFrame([(i,) for i in range(10)], "id LONG").coalesce(1),
            loc,
        )
        snapshot_commit(
            spark.createDataFrame([(100 + i,) for i in range(10)], "id LONG").coalesce(1),
            loc,
            "append",
        )
        snapshot_rollback(loc, 0)
        # post-rollback manifest still prunes (stats were carried over)
        df, st = snapshot_read_pruned(spark, loc, [("id", ">=", 100)])
        assert st == {"kept": 0, "pruned": 1} and df.count() == 0
        # pruned read of a PINNED old version
        df1, st1 = snapshot_read_pruned(spark, loc, [("id", ">=", 100)], version=1)
        assert st1 == {"kept": 1, "pruned": 1} and df1.count() == 10


class TestStreamingIngest:
    def test_stream_exactly_once_and_versioned(self, spark, sf_dir, tmp_path):
        from fuse_query_spark.sources.snapshots import (
            snapshot_commit_batch,
            stream_into_snapshot,
        )
        from fuse_query_spark.sources.tables import table

        src = str(tmp_path / "src")
        loc = str(tmp_path / "t")
        ckpt = str(tmp_path / "ckpt")
        ev = table(spark, sf_dir, "events").select("event_id", "event_type")
        ev.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema("event_id LONG, event_type STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_into_snapshot(stream, loc, ckpt)
        q.awaitTermination(120)
        assert q.exception() is None
        total = ev.count()
        assert snapshot_read(spark, loc).count() == total
        # one version per micro-batch; history is queryable
        hist = snapshot_history(spark, loc).collect()
        assert len(hist) >= 2  # 3 files -> up to 3 micro-batches
        # earlier versions hold strictly fewer rows (mid-stream state)
        assert snapshot_read(spark, loc, version=0).count() < total

        # checkpoint replay: same source, same checkpoint -> no growth
        q2 = stream_into_snapshot(
            (
                spark.readStream.schema("event_id LONG, event_type STRING")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            ),
            loc,
            ckpt,
        )
        q2.awaitTermination(120)
        assert snapshot_read(spark, loc).count() == total

        # direct idempotence: re-committing an already-seen batch id is a no-op
        v_before = latest_version(loc)
        assert (
            snapshot_commit_batch(
                spark.createDataFrame([(1, "x")], "event_id LONG, event_type STRING"),
                loc,
                batch_id=0,
            )
            is None
        )
        assert latest_version(loc) == v_before

    def test_batch_ids_survive_interleaved_dml_and_rollback(self, spark, tmp_path):
        from fuse_query_spark.sources.snapshots import snapshot_commit_batch

        loc = str(tmp_path / "t")
        assert snapshot_commit_batch(
            spark.createDataFrame([(1,)], "id LONG"), loc, batch_id=0
        ) == 0
        # interleaved non-batch commit (a DML-style overwrite)
        snapshot_commit(spark.createDataFrame([(9,)], "id LONG"), loc, "overwrite")
        snapshot_rollback(loc, 0)
        # replaying batch 0 after DML + rollback must STILL be a no-op
        v = latest_version(loc)
        assert snapshot_commit_batch(
            spark.createDataFrame([(1,)], "id LONG"), loc, batch_id=0
        ) is None
        assert latest_version(loc) == v
        # a genuinely new batch lands
        assert snapshot_commit_batch(
            spark.createDataFrame([(2,)], "id LONG"), loc, batch_id=1
        ) == v + 1


def test_ctas_snapshot(engine, tmp_path):
    """CREATE TABLE … ENGINE = Snapshot AS SELECT: the CTAS write is
    snapshot v0 and immediately time-travelable."""
    loc = str(tmp_path / "ctas_t")
    engine.sql("DROP TABLE IF EXISTS ctas_snap")
    engine.sql(
        f"CREATE TABLE ctas_snap ENGINE = Snapshot location = '{loc}'"
        " AS SELECT number AS n FROM numbers(10)"
    )
    assert one(engine.sql("SELECT count(1) FROM ctas_snap")) == 10
    engine.sql("INSERT INTO ctas_snap SELECT number + 100 FROM numbers(5)")
    assert one(engine.sql("SELECT count(1) FROM ctas_snap")) == 15
    assert one(engine.sql("SELECT count(1) FROM ctas_snap VERSION AS OF 0")) == 10
    engine.sql("DROP TABLE ctas_snap")


class TestAdviceRegressions:
    """r6: regressions for the judge-advisor findings (ADVICE.md r5)."""

    def test_history_after_vacuum(self, spark, tmp_path):
        """SHOW SNAPSHOTS must survive vacuum: history enumerates the
        manifests that EXIST, not range(latest+1)."""
        loc = str(tmp_path / "t")
        for i in range(4):
            snapshot_commit(spark.createDataFrame([(i,)], "id LONG"), loc, "overwrite" if i else "append")
        snapshot_vacuum(loc, keep_last=2)
        hist = snapshot_history(spark, loc).collect()
        assert [r["version"] for r in hist] == [2, 3]

    def test_batch_id_lands_in_atomic_commit(self, spark, tmp_path):
        """The batch id is in the manifest written by the atomic commit
        itself — no stamp-after-commit window (double-ingest on crash)."""
        from fuse_query_spark.sources.snapshots import snapshot_commit_batch

        loc = str(tmp_path / "t")
        v = snapshot_commit_batch(spark.createDataFrame([(1,)], "id LONG"), loc, batch_id=7)
        assert v == 0
        assert read_manifest(loc, 0)["batch_ids"] == [7]
        # replay is a no-op
        assert snapshot_commit_batch(spark.createDataFrame([(1,)], "id LONG"), loc, batch_id=7) is None
        assert latest_version(loc) == 0

    def test_manifest_commit_is_create_exclusive(self, tmp_path, spark):
        """os.link-based commit point: a racer who lost cannot silently
        replace the winner's manifest (os.rename would)."""
        from fuse_query_spark.sources.snapshots import _write_manifest, _manifest_path
        import json

        loc = str(tmp_path / "t")
        m = {"version": 0, "parent": None, "operation": "append", "files": [],
             "stats": {}, "schema_ddl": "id BIGINT", "added_files": 0,
             "committed_at": "x"}
        _write_manifest(loc, m)
        loser = dict(m, committed_at="LOSER")
        with pytest.raises(RuntimeError, match="concurrent"):
            _write_manifest(loc, loser)
        with open(_manifest_path(loc, 0)) as f:
            assert json.load(f)["committed_at"] == "x"  # winner intact
        # no temp litter left behind
        snapdir = os.path.dirname(_manifest_path(loc, 0))
        assert not [p for p in os.listdir(snapdir) if p.startswith(".tmp-")]

    def test_drop_view_name_containing_view(self, engine):
        """'DROP VIEW page_views' must not mangle the identifier."""
        engine.sql("DROP TABLE IF EXISTS pv_src")
        engine.sql("CREATE TABLE pv_src(id bigint) ENGINE = Memory")
        engine.sql("INSERT INTO pv_src VALUES (1), (2)")
        engine.sql("CREATE VIEW page_views AS SELECT id FROM pv_src")
        assert engine.sql("SELECT count(*) AS n FROM page_views").collect()[0]["n"] == 2
        engine.sql("DROP VIEW page_views")
        # the view is gone, the source table is untouched
        assert engine.sql("SELECT count(*) AS n FROM pv_src").collect()[0]["n"] == 2

    def test_delete_escaped_and_null_partitions(self, engine, tmp_path):
        """Partition-scoped DELETE finds leaves whose values need Hive
        path escaping (':' -> %3A) and NULL partitions."""
        loc = str(tmp_path / "pesc")
        engine.sql("DROP TABLE IF EXISTS pesc")
        engine.sql(
            f"CREATE TABLE pesc(id bigint, k varchar) ENGINE = Parquet"
            f" PARTITION BY (k) location = '{loc}'"
        )
        engine.sql(
            "INSERT INTO pesc VALUES (1, 'a:b'), (2, 'plain'), (3, NULL), (4, 'a:b')"
        )
        engine.sql("DELETE FROM pesc WHERE k = 'a:b'")
        rows = sorted(r["id"] for r in engine.sql("SELECT id FROM pesc").collect())
        assert rows == [2, 3], f"escaped-partition delete left {rows}"
        engine.sql("DELETE FROM pesc WHERE k IS NULL")
        rows = sorted(r["id"] for r in engine.sql("SELECT id FROM pesc").collect())
        assert rows == [2], f"NULL-partition delete left {rows}"


class TestOptimize:
    """OPTIMIZE compaction + Z-ORDER clustering (r6)."""

    def _make_fragmented(self, spark, tmp_path, n_commits=6):
        loc = str(tmp_path / "opt_table")
        for i in range(n_commits):
            df = spark.range(i * 100, (i + 1) * 100).select(
                F.col("id"),
                (F.col("id") % 17).alias("x"),
                (F.col("id") % 23).alias("y"),
            ).repartition(4)
            snapshot_commit(df, loc, mode="append")
        return loc

    def test_compaction_preserves_rows_and_shrinks_files(self, spark, tmp_path):
        loc = self._make_fragmented(spark, tmp_path)
        before = read_manifest(loc, latest_version(loc))
        pre_rows = sorted(r["id"] for r in snapshot_read(spark, loc).collect())
        v = snapshot_optimize(spark, loc)
        after = read_manifest(loc, v)
        assert len(after["files"]) < len(before["files"])
        post_rows = sorted(r["id"] for r in snapshot_read(spark, loc).collect())
        assert post_rows == pre_rows == list(range(600))
        # forward-written: the pre-optimize version is still readable
        pre = snapshot_read(spark, loc, version=v - 1)
        assert pre.count() == 600
        # and the history labels the rewrite
        ops = {r["version"]: r["operation"] for r in snapshot_history(spark, loc).collect()}
        assert ops[v] == "optimize"

    def test_zorder_multiplies_box_pruning(self, spark, tmp_path):
        """Z-ordered rewrite must let manifest min/max skipping prune
        files for a 2-D box predicate that an unclustered layout
        cannot prune at all (every random file spans the full x/y
        range)."""
        loc = str(tmp_path / "z_table")
        import random

        random.seed(5)
        rows = [(i, random.randint(0, 1000), random.randint(0, 1000)) for i in range(20000)]
        df = spark.createDataFrame(rows, "id LONG, x LONG, y LONG").repartition(8)
        snapshot_commit(df, loc, mode="append")
        preds = [("x", "<", 200), ("y", "<", 200)]
        _, before = snapshot_read_pruned(spark, loc, preds)
        assert before["pruned"] == 0  # random layout: nothing prunable
        v = snapshot_optimize(spark, loc, zorder_by=["x", "y"], n_files=16)
        m = read_manifest(loc, v)
        dfp, after = snapshot_read_pruned(spark, loc, preds)
        assert after["kept"] + after["pruned"] == len(m["files"])
        assert after["pruned"] > 0  # tight boxes: most files skipped
        # pruning is an optimization, never a filter: exact answer
        want = sorted(i for i, x, y in rows if x < 200 and y < 200)
        got = sorted(r["id"] for r in dfp.collect())
        assert got == want
        assert ("optimize_zorder(x,y)" ==
                read_manifest(loc, v)["operation"])

    def test_zorder_key_locality(self, spark):
        """Morton-key ordering groups spatial neighbors: the key of
        (0,0)-corner points must all sort below the key of the
        opposite corner."""
        df = spark.createDataFrame(
            [(i, i % 100, (i * 7) % 100) for i in range(1000)],
            "id LONG, x LONG, y LONG",
        )
        key, stats = zorder_key(df, ["x", "y"], bits=8)
        rows = df.withColumn("k", key).collect()
        lo = [r["k"] for r in rows if r["x"] < 10 and r["y"] < 10]
        hi = [r["k"] for r in rows if r["x"] > 90 and r["y"] > 90]
        assert lo and hi and max(lo) < min(hi)

    def test_zorder_key_bits_clamped_to_int64(self, spark):
        """4+ columns at the default bits=16 would interleave past bit
        63 and flip the key's sign (breaking the range partitioning);
        per-column bits must clamp to 63 // len(cols) and every key
        stay non-negative."""
        df = spark.createDataFrame(
            [(i, i % 7, (i * 3) % 11, (i * 5) % 13, (i * 9) % 17) for i in range(500)],
            "id LONG, a LONG, b LONG, c LONG, d LONG",
        )
        key, _ = zorder_key(df, ["a", "b", "c", "d"])  # default bits=16 -> clamp 15
        ks = [r["k"] for r in df.withColumn("k", key).collect()]
        assert min(ks) >= 0
        assert max(ks) < 1 << 63

    def test_zorder_key_all_null_column_is_constant(self, spark):
        """An all-null (min/max None) column must not crash the key
        build — it contributes a constant coordinate and the other
        columns still order the key."""
        df = spark.createDataFrame(
            [(i, i % 100, None) for i in range(200)],
            "id LONG, x LONG, y LONG",
        )
        key, _ = zorder_key(df, ["x", "y"], bits=8)
        rows = df.withColumn("k", key).collect()
        lo = [r["k"] for r in rows if r["x"] < 10]
        hi = [r["k"] for r in rows if r["x"] > 90]
        assert lo and hi and max(lo) < min(hi)

    def test_zorder_too_many_columns_raises(self, spark):
        df = spark.createDataFrame([(1,) * 64], ", ".join(f"c{i} LONG" for i in range(64)))
        with pytest.raises(ValueError, match="too many ZORDER columns"):
            zorder_key(df, [f"c{i}" for i in range(64)])


class TestOptimizeSql:
    def test_optimize_table_snapshot_sql(self, engine, tmp_path, spark):
        loc = str(tmp_path / "sql_opt")
        engine.sql("CREATE DATABASE IF NOT EXISTS optdb")
        engine.sql(
            f"CREATE TABLE optdb.snap (id BIGINT, x BIGINT, y BIGINT) "
            f"ENGINE = Snapshot location = '{loc}'"
        )
        for i in range(4):
            engine.sql(
                f"INSERT INTO optdb.snap SELECT number + {i * 50} AS id, "
                f"number % 11 AS x, number % 13 AS y FROM numbers(50)"
            )
        row = engine.sql("OPTIMIZE TABLE optdb.snap ZORDER BY (x, y)").collect()[0]
        assert row["files_after"] <= row["files_before"]
        assert row["operation"] == "optimize_zorder(x,y)"
        assert engine.sql("SELECT count(*) FROM optdb.snap").collect()[0][0] == 200
        engine.sql("DROP TABLE optdb.snap")
        engine.sql("DROP DATABASE optdb")

    def test_zorder_on_parquet_engine_rejected(self, engine, tmp_path):
        import pytest as _pytest

        from fuse_query_spark.errors import UnsupportedStatement

        loc = str(tmp_path / "plain_parquet")
        engine.sql("CREATE DATABASE IF NOT EXISTS optdb2")
        engine.sql(
            f"CREATE TABLE optdb2.plain (id BIGINT) ENGINE = Parquet "
            f"location = '{loc}'"
        )
        engine.sql("INSERT INTO optdb2.plain SELECT number AS id FROM numbers(10)")
        with _pytest.raises(UnsupportedStatement, match="ZORDER"):
            engine.sql("OPTIMIZE TABLE optdb2.plain ZORDER BY (id)")
        engine.sql("DROP TABLE optdb2.plain")
        engine.sql("DROP DATABASE optdb2")


class TestReviewHardening:
    """code-review r8: vacuum data-loss and pruning-correctness traps."""

    def _make(self, spark, tmp_path, n_commits=3):
        from fuse_query_spark.sources.snapshots import snapshot_commit

        loc = str(tmp_path / "tbl")
        for i in range(n_commits):
            snapshot_commit(
                spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "x"),
                loc,
                "append",
            )
        return loc

    def test_vacuum_keep_zero_rejected(self, spark, tmp_path):
        """KEEP 0 would unlink the LIVE version's data files and leave
        the table unreadable — it must raise before touching disk."""
        import pytest as _pytest

        from fuse_query_spark.sources.snapshots import snapshot_read, snapshot_vacuum

        loc = self._make(spark, tmp_path)
        with _pytest.raises(ValueError, match="keep_last"):
            snapshot_vacuum(loc, keep_last=0)
        assert snapshot_read(spark, loc).count() == 30  # untouched

    def test_vacuum_after_tighter_vacuum(self, spark, tmp_path):
        """A later vacuum with a LARGER keep window than an earlier one
        must keep what exists instead of raising on the gap."""
        from fuse_query_spark.sources.snapshots import (
            snapshot_commit,
            snapshot_read,
            snapshot_vacuum,
        )

        loc = self._make(spark, tmp_path, n_commits=4)
        snapshot_vacuum(loc, keep_last=1)  # drops manifests v0-v2
        snapshot_commit(
            spark.range(100, 110).withColumnRenamed("id", "x"), loc, "append"
        )
        deleted = snapshot_vacuum(loc, keep_last=3)  # window spans the gap
        assert isinstance(deleted, list)
        assert snapshot_read(spark, loc).count() == 50

    def test_optimize_empty_table_clear_error(self, spark, tmp_path):
        import pytest as _pytest

        from fuse_query_spark.sources.snapshots import snapshot_optimize

        loc = str(tmp_path / "empty")
        with _pytest.raises(ValueError, match="no commits"):
            snapshot_optimize(spark, loc)

    def test_zorder_rejects_string_column(self, spark, tmp_path):
        import pytest as _pytest

        from fuse_query_spark.sources.snapshots import zorder_key

        df = spark.createDataFrame([(1, "a")], "x LONG, name STRING")
        with _pytest.raises(ValueError, match="only numeric"):
            zorder_key(df, ["name"])
        with _pytest.raises(ValueError, match="not in schema"):
            zorder_key(df, ["nope"])
