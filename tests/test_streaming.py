"""Streaming end-to-end: file-source stream → watermarked windows →
memory sink, cross-checked against the batch formulation."""

import shutil

import pytest
from pyspark.sql import functions as F

from fuse_query_spark.sources.tables import table
from fuse_query_spark.streaming.events import (
    read_events_stream,
    run_to_memory_sink,
    sessionized_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-write events as a 3-file parquet directory so the file source
    has multiple triggers to chew through."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(out, ignore_errors=True)
    table(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(out)
    return out


def test_tumbling_stream_matches_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    run_to_memory_sink(tumbling_counts(stream), "tumbling_test")
    got = {
        (r["hour_start"], r["event_type"]): r["n"]
        for r in spark.table("tumbling_test").collect()
    }
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["hour_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_session_stream_total_events_conserved(spark, sf_dir, events_dir):
    # files arrive in arbitrary ts order, so conservation only holds
    # with a watermark wider than the cross-file disorder (the 2h
    # default correctly DROPS late data — that's the contract)
    stream = read_events_stream(spark, events_dir)
    run_to_memory_sink(sessionized_counts(stream, watermark="40 days"), "session_test")
    total = spark.table("session_test").agg(F.sum("n_events")).collect()[0][0]
    assert total == table(spark, sf_dir, "events").count()


def test_session_stream_drops_late_data_past_watermark(spark, events_dir):
    # tight watermark + out-of-order files → some events are late and
    # dropped; assert the drop actually happens (watermark is working)
    stream = read_events_stream(spark, events_dir)
    run_to_memory_sink(sessionized_counts(stream, watermark="2 hours"), "session_tight")
    total = spark.table("session_tight").agg(F.sum("n_events")).collect()[0][0]
    assert total < 1000


def test_hopping_stream_matches_batch(spark, sf_dir, events_dir):
    from fuse_query_spark.streaming.events import hopping_counts

    stream = read_events_stream(spark, events_dir)
    run_to_memory_sink(hopping_counts(stream), "hopping_test")
    got = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in spark.table("hopping_test").collect()
    }
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    want = {(r["win_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_streaming_dedup_matches_batch(spark, sf_dir, events_dir, tmp_path):
    """dropDuplicatesWithinWatermark over a corpus with injected exact
    duplicates keeps one row per event_id — cross-checked against the
    batch distinct count."""
    import shutil

    from fuse_query_spark.streaming.events import dedup_events_stream

    dup_dir = str(tmp_path / "events_dup")
    shutil.rmtree(dup_dir, ignore_errors=True)
    e = table(spark, sf_dir, "events")
    # duplicate a slice of events (same event_id/ts) on top of the corpus
    e.unionAll(e.limit(500)).repartition(3).write.mode("overwrite").parquet(dup_dir)

    # watermark must span the corpus: the 3 files arrive in arbitrary
    # order, and dropDuplicatesWithinWatermark DROPS rows older than
    # (max seen ts - watermark) as late data — with the default 2h
    # bound a multi-day corpus loses every old-file row (observed
    # 787/1000 before this was widened)
    stream = dedup_events_stream(read_events_stream(spark, dup_dir), watermark="365 days")
    run_to_memory_sink(stream, "dedup_sink", output_mode="append")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_sink").collect()[0]
    batch_distinct = e.select("event_id").distinct().count()
    assert got.n == got.d == batch_distinct


def test_rate_limited_counts_conserve_events(spark, sf_dir, events_dir):
    from fuse_query_spark.streaming.events import rate_limited_counts

    stream = rate_limited_counts(read_events_stream(spark, events_dir))
    run_to_memory_sink(stream, "rate_sink")
    total = spark.sql("SELECT CAST(sum(n) AS BIGINT) AS t FROM rate_sink").collect()[0].t
    assert total == table(spark, sf_dir, "events").count()


def test_funnel_stream_join_matches_batch_pairs(spark, sf_dir, events_dir):
    """Stream-stream interval join (purchase ⋈ preceding clicks) must
    produce exactly the batch join's pairs when the watermark is wide
    enough to keep all cross-file disorder in state."""
    from fuse_query_spark.streaming.events import funnel_join_stream

    stream = read_events_stream(spark, events_dir)
    joined = funnel_join_stream(stream, watermark="40 days")
    run_to_memory_sink(joined, "funnel_test", output_mode="append")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("funnel_test").collect()
    }
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") > F.col("p_ts") - F.expr("interval 30 minutes")),
        ).collect()
    }
    assert got == want and want, f"stream={len(got)} batch={len(want)}"


def test_stream_to_partitioned_parquet_exactly_once(spark, sf_dir, events_dir, tmp_path):
    """File sink + checkpoint = exactly-once: a second run over the
    same source with the same checkpoint must add NOTHING, and the
    layout must partition-prune on read."""
    from fuse_query_spark.streaming.events import stream_to_partitioned_parquet

    out, ckpt = str(tmp_path / "landed"), str(tmp_path / "ckpt")
    stream_to_partitioned_parquet(read_events_stream(spark, events_dir), out, ckpt)
    n_src = table(spark, sf_dir, "events").count()
    landed = spark.read.parquet(out)
    assert landed.count() == n_src

    # idempotent restart: same checkpoint, no new source files
    stream_to_partitioned_parquet(read_events_stream(spark, events_dir), out, ckpt)
    assert spark.read.parquet(out).count() == n_src

    pruned = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "click" in plan
    assert pruned.count() == table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).count()


def test_stream_overwrite_partitions_idempotent_replay(
    spark, sf_dir, events_dir, tmp_path
):
    """foreachBatch + dynamic partition overwrite: replaying the same
    snapshot with a FRESH checkpoint (redelivery / checkpoint loss /
    deliberate backfill) converges to the same table — append mode
    would have doubled it. The landed layout is a plain hive directory
    (no _spark_metadata), readable by any engine."""
    import os

    from fuse_query_spark.streaming.events import (
        read_events_snapshot_stream,
        stream_overwrite_partitions,
    )

    out = str(tmp_path / "landed_ovw")
    n_src = table(spark, sf_dir, "events").count()
    stream_overwrite_partitions(
        read_events_snapshot_stream(spark, events_dir), out, str(tmp_path / "ck1")
    )
    assert spark.read.parquet(out).count() == n_src
    # replay with a fresh checkpoint: same final state, not 2x
    stream_overwrite_partitions(
        read_events_snapshot_stream(spark, events_dir), out, str(tmp_path / "ck2")
    )
    assert spark.read.parquet(out).count() == n_src
    # plain directory: no streaming-sink transaction log
    assert not os.path.isdir(os.path.join(out, "_spark_metadata"))


def test_stream_overwrite_partitions_guards_cross_batch_clash(
    spark, events_dir, tmp_path
):
    """A partition whose content spans two micro-batches (events are
    split randomly across the 3 source files, one file per trigger)
    would be silently truncated by overwrite landing — the writer must
    detect the clash and fail the query instead."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from fuse_query_spark.streaming.events import stream_overwrite_partitions

    with pytest.raises(StreamingQueryException, match="span multiple micro-batches"):
        stream_overwrite_partitions(
            read_events_stream(spark, events_dir),  # 1 file per trigger
            str(tmp_path / "landed_clash"),
            str(tmp_path / "ck_clash"),
        )


@pytest.fixture(scope="module")
def documents_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("documents_stream"))
    shutil.rmtree(out, ignore_errors=True)
    table(spark, sf_dir, "documents").repartition(3).write.mode("overwrite").parquet(out)
    return out


def test_streaming_curation_matches_batch(spark, sf_dir, documents_dir):
    """The stateless curation pass (redact + quality + tokens +
    fingerprint) produces identical rows in streaming and batch — the
    same Column expressions run in both modes."""
    from fuse_query_spark.streaming.documents import (
        curate_documents,
        read_documents_stream,
    )

    stream = read_documents_stream(spark, documents_dir)
    assert stream.isStreaming
    run_to_memory_sink(curate_documents(stream), "curated_docs", output_mode="append")
    got = spark.table("curated_docs")
    batch = curate_documents(spark.read.parquet(documents_dir))
    s_rows = {tuple(r) for r in got.collect()}
    b_rows = {tuple(r) for r in batch.collect()}
    assert s_rows == b_rows and len(s_rows) == batch.count()


def test_streaming_curation_quality_filter(spark, documents_dir):
    """min_quality drops rows in-flight; surviving stream rows equal
    the batch filter's."""
    from fuse_query_spark.streaming.documents import (
        curate_documents,
        read_documents_stream,
    )

    full = curate_documents(spark.read.parquet(documents_dir))
    cutoff = full.approxQuantile("quality", [0.5], 0.0)[0]  # exact median
    stream = read_documents_stream(spark, documents_dir)
    run_to_memory_sink(
        curate_documents(stream, min_quality=cutoff), "curated_docs_q", output_mode="append"
    )
    got = spark.table("curated_docs_q")
    batch = curate_documents(spark.read.parquet(documents_dir), min_quality=cutoff)
    assert got.count() == batch.count()
    assert 0 < got.count() < full.count()


def test_streaming_ann_index_ingest(spark, sf_dir, tmp_path):
    """Freshness: vectors streamed into the IVF index after the batch
    build are found by search without a rebuild; ingest is exactly-once
    on checkpointed replay; probed search still partition-prunes."""
    from fuse_query_spark.operators.similarity import ivf_index_write
    from fuse_query_spark.streaming.ann_index import (
        index_vectors_fresh,
        ingest_into_index,
        ivf_index_search_fresh,
        read_embeddings_stream,
    )

    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 2 == 0)
    late = e.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf_index")
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "ckpt")

    centroids = ivf_index_write(base, idx, k_cells=8, iters=1)
    n_base = spark.read.parquet(f"{idx}/vectors").count()
    late.repartition(2).write.parquet(src)

    q = ingest_into_index(read_embeddings_stream(spark, src), centroids, idx, ckpt)
    q.awaitTermination(120)
    assert q.exception() is None
    assert index_vectors_fresh(spark, idx).count() == n_base + late.count()

    # a streamed vector is now its own nearest neighbour in the index
    probe_id = late.select("vec_id").orderBy("vec_id").first()["vec_id"]
    qv = [float(x) for x in late.filter(F.col("vec_id") == probe_id).first()["embedding"]]
    hits = ivf_index_search_fresh(spark, idx, qv, k=3, n_probe=3).collect()
    assert hits[0]["vec_id"] == probe_id

    # exactly-once: same checkpoint, no new source files -> no growth
    q2 = ingest_into_index(read_embeddings_stream(spark, src), centroids, idx, ckpt)
    q2.awaitTermination(120)
    assert index_vectors_fresh(spark, idx).count() == n_base + late.count()

    # probe-pruned scan: both zones prune on the cell predicate
    pruned = index_vectors_fresh(spark, idx).filter(F.col("cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_ann_index_compaction_folds_delta(spark, sf_dir, tmp_path):
    """compact_index: base+delta become one re-trained base; the delta
    zone is gone; search results survive the swap."""
    from fuse_query_spark.operators.similarity import ivf_index_write
    from fuse_query_spark.streaming.ann_index import (
        compact_index,
        index_vectors_fresh,
        ingest_into_index,
        ivf_index_search_fresh,
        read_embeddings_stream,
    )

    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 2 == 0)
    late = e.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf_index")
    src = str(tmp_path / "late_src")

    centroids = ivf_index_write(base, idx, k_cells=8, iters=1)
    late.write.parquet(src)
    q = ingest_into_index(
        read_embeddings_stream(spark, src), centroids, idx, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    total = e.count()
    assert index_vectors_fresh(spark, idx).count() == total

    compact_index(spark, idx, k_cells=8, iters=1)
    import os

    assert not os.path.exists(f"{idx}/vectors_delta")
    assert spark.read.parquet(f"{idx}/vectors").count() == total
    # search still finds a formerly-delta vector post-swap
    probe_id = late.select("vec_id").orderBy("vec_id").first()["vec_id"]
    qv = [float(x) for x in late.filter(F.col("vec_id") == probe_id).first()["embedding"]]
    hits = ivf_index_search_fresh(spark, idx, qv, k=3, n_probe=4).collect()
    assert hits[0]["vec_id"] == probe_id


@pytest.fixture(scope="module")
def video_blobs_dir(spark, sf_dir, tmp_path_factory):
    from fuse_query_spark.operators.mp4 import synthesize_mp4_blobs

    out = str(tmp_path_factory.mktemp("video_blobs"))
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    synthesize_mp4_blobs(docs).repartition(3).write.mode("overwrite").parquet(out)
    return out


def test_streaming_mp4_demux_matches_batch(spark, video_blobs_dir):
    """The container demux is a stateless Arrow flat-map: the SAME
    operator runs on a readStream DataFrame and must produce exactly
    the batch rows (append mode, no state, no watermark)."""
    from fuse_query_spark.streaming.video import demux_mp4_stream, read_blob_stream

    stream = read_blob_stream(spark, video_blobs_dir)
    assert stream.isStreaming
    run_to_memory_sink(demux_mp4_stream(stream), "mp4_stream", output_mode="append")
    got = {tuple(r) for r in spark.table("mp4_stream").collect()}
    batch = {
        tuple(r)
        for r in demux_mp4_stream(spark.read.parquet(video_blobs_dir)).collect()
    }
    assert got == batch and len(got) == len(batch) > 0


def test_streaming_keyframe_density_matches_batch(spark, video_blobs_dir):
    """Media-time windowing makes the rollup arrival-order-independent:
    the streaming aggregation (complete mode) equals the batch rollup
    row-for-row, and the per-doc totals obey the synthesizer's closed
    form (keyframes at every 3rd sample)."""
    from fuse_query_spark.streaming.video import (
        demux_mp4_stream,
        keyframe_density,
        read_blob_stream,
    )

    stream = keyframe_density(demux_mp4_stream(read_blob_stream(spark, video_blobs_dir)))
    run_to_memory_sink(stream, "kf_density", output_mode="complete")
    got = {tuple(r) for r in spark.table("kf_density").collect()}
    batch = {
        tuple(r)
        for r in keyframe_density(
            demux_mp4_stream(spark.read.parquet(video_blobs_dir))
        ).collect()
    }
    assert got == batch and got
    # closed form: doc d has n_v = 3 + d%5 video samples, keyframes at
    # i % 3 == 0
    per_doc = {}
    for doc_id, _w, kf, n, _sf in got:
        a, b, c = per_doc.get(doc_id, (0, 0, 0))
        per_doc[doc_id] = (a + kf, b + n, 0)
    for d in range(60):
        n_v = 3 + d % 5
        want_kf = len([i for i in range(n_v) if i % 3 == 0])
        assert per_doc[d][:2] == (want_kf, n_v), d
