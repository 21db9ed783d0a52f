"""Stream-vs-batch perf parity probe (r12 verdict ask #6).

The streaming operators (streaming/events.py) share their window/
sessionize logic with the batch queries but their own TOPOLOGIES were
never bench-measured — "not on the bench path" was unfalsifiable.
This probe runs, on the SAME sf events input:

  - the batch twin (queries/events.py form) to a noop sink, timed;
  - the streaming topology (readStream -> watermarked agg -> memory
    sink, availableNow trigger) drained end-to-end, timed;
  - a row-parity check between the two results first.

Streaming is measured in two source shapes: `snapshot` (whole backlog
in one micro-batch — the fair throughput comparison) and `per-file`
(maxFilesPerTrigger=1 over an 8-file directory — surfaces per-trigger
overhead, the latency-oriented production shape).

Usage: python tools/stream_parity.py [sf_dir] [rounds]
Writes nothing to the repo; numbers go to SCALE.md by hand.
"""

import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from fuse_query_spark.session import get_spark
from fuse_query_spark.sources.tables import table
from fuse_query_spark.streaming.events import (
    read_events_snapshot_stream,
    read_events_stream,
    run_to_memory_sink,
    sessionized_counts,
    tumbling_counts,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("fq-stream-parity")
spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

# file-source stream needs a directory; 8 files gives the per-file
# shape several triggers without making trigger count the whole story
stage_dir = tempfile.mkdtemp(prefix="fq_stream_parity_")
events_dir = f"{stage_dir}/events"
table(spark, SF_DIR, "events").repartition(8).write.mode("overwrite").parquet(events_dir)


def batch_tumbling():
    e = spark.read.parquet(events_dir)
    return e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
    ).select(F.col("w.start").alias("hour_start"), "event_type", "n", "sum_value")


def time_batch(fn):
    fn().write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(ROUNDS):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    return ts


def time_stream(make_stream, name, rounds=ROUNDS):
    run_to_memory_sink(make_stream(), f"{name}_warm")  # warm
    spark.catalog.dropTempView(f"{name}_warm")
    ts = []
    for i in range(rounds):
        t0 = time.time()
        run_to_memory_sink(make_stream(), f"{name}_{i}")
        ts.append(time.time() - t0)
        spark.catalog.dropTempView(f"{name}_{i}")
    return ts


def key_rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---- parity first (tumbling; watermark wide enough that nothing drops
# on the snapshot shape — one micro-batch sees everything anyway) ----
run_to_memory_sink(tumbling_counts(read_events_snapshot_stream(spark, events_dir)), "par_t")
stream_rows = key_rows(spark.table("par_t"))
batch_rows = key_rows(batch_tumbling())
print(f"tumbling parity: {'IDENTICAL' if stream_rows == batch_rows else 'MISMATCH !!!'} "
      f"({len(stream_rows)} rows)", flush=True)
spark.catalog.dropTempView("par_t")

run_to_memory_sink(
    sessionized_counts(read_events_snapshot_stream(spark, events_dir), watermark="40 days"),
    "par_s",
)
n_sess_stream = spark.table("par_s").agg(F.sum("n_events")).first()[0]
n_total = spark.read.parquet(events_dir).count()
print(f"sessionize conservation: stream sum(n_events)={n_sess_stream} "
      f"vs input rows={n_total} -> {'OK' if n_sess_stream == n_total else 'MISMATCH !!!'}",
      flush=True)
spark.catalog.dropTempView("par_s")

# ---- timings ----
bt = time_batch(batch_tumbling)
st_snap = time_stream(
    lambda: tumbling_counts(read_events_snapshot_stream(spark, events_dir)), "t_snap"
)
st_file = time_stream(
    lambda: tumbling_counts(read_events_stream(spark, events_dir)), "t_file"
)
ss_snap = time_stream(
    lambda: sessionized_counts(read_events_snapshot_stream(spark, events_dir), watermark="40 days"),
    "s_snap",
)


def fmt(label, ts):
    med = statistics.median(ts)
    print(f"{label:42s} median={med:6.3f}s runs={[round(x, 2) for x in ts]}", flush=True)
    return med


print(f"\nsf={SF_DIR} input_rows={n_total} rounds={ROUNDS}")
mb = fmt("batch tumbling (noop sink)", bt)
ms = fmt("stream tumbling snapshot (1 micro-batch)", st_snap)
mf = fmt("stream tumbling per-file (8 triggers)", st_file)
fmt("stream sessionize snapshot", ss_snap)
print(f"\nstream/batch ratio: snapshot={ms / mb:.2f}x  per-file={mf / mb:.2f}x")

shutil.rmtree(stage_dir, ignore_errors=True)
