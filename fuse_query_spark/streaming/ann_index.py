"""Streaming ANN-index maintenance: keep the IVF cell-partitioned
index (operators/similarity.ivf_index_write) FRESH as new embeddings
arrive, without rebuilding it.

The key property making this streamable: once centroids are trained,
cell assignment is a pure per-row function (nearest centroid — the
centroids ride along as a broadcast-sized constant), so the ingest
path is a stateless stream: readStream → assign cell → writeStream
partitionBy(cell). New vectors land in exactly the directories a
search already prunes to, so a query issued after any micro-batch
commit sees the new vectors with the same probe cost — no index
rebuild, no reader coordination beyond parquet's atomic file commit.

Centroid drift is the standing trade-off (same as every IVF system):
the streamed vectors are quantized by the FROZEN codebook, so cell
balance decays as the distribution shifts; production re-trains
centroids periodically as a batch pass (ivf_index_write) and swaps
the index directory — the lambda split documented for the
corpus-relative text stages in streaming/documents.py.

The reference has no streaming (SURVEY §2.10); capability extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fuse_query_spark.operators.similarity import _assign_cells

EMBEDDINGS_SCHEMA = "vec_id LONG, embedding ARRAY<FLOAT>, label INT"


def read_embeddings_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of embedding rows (one file per trigger for
    deterministic tests; production points at the encoder's drop)."""
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def assign_cells_stream(stream: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid assignment on a stream — the SAME Arrow kernel
    the batch index build uses (_assign_cells is stateless per row, so
    it streams verbatim)."""
    return _assign_cells(stream, centroids, "embedding")


def ingest_into_index(
    stream: DataFrame,
    centroids: list[list[float]],
    index_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Append-mode ingest into the index's DELTA zone
    (`vectors_delta/`, partitionBy(cell)) — a base+delta layout, the
    same shape LSM-ish ANN systems use. The delta zone is a pure
    streaming file sink, so its `_spark_metadata` commit log gives
    exactly-once on replay; it deliberately does NOT share a directory
    with the batch-built `vectors/` zone (a streaming sink's metadata
    log would otherwise shadow the batch files on read — the classic
    mixed-writer pitfall). Search unions both zones with the same cell
    pruning (ivf_index_search_fresh); periodic compaction folds the
    delta into the base with ivf_index_write and truncates the delta —
    the batch re-train pass described in the module docstring.
    Returns the StreamingQuery."""
    assigned = assign_cells_stream(stream, centroids)
    writer = (
        assigned.writeStream.format("parquet")
        .option("path", f"{index_path}/vectors_delta")
        .option("checkpointLocation", checkpoint)
        .partitionBy("cell")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def index_vectors_fresh(spark: SparkSession, index_path: str) -> DataFrame:
    """Base + delta union of the index's vector zones. Both sides are
    cell-partitioned parquet, so a `cell` predicate partition-prunes
    each zone independently; the union adds no shuffle (it is a scan
    concat). Missing delta (nothing streamed yet) degrades to base."""
    from pyspark.sql.utils import AnalysisException

    base = spark.read.parquet(f"{index_path}/vectors")
    try:
        delta = spark.read.parquet(f"{index_path}/vectors_delta")
    except AnalysisException:
        return base
    return base.unionByName(delta)


def ivf_index_search_fresh(
    spark: SparkSession,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ivf_index_search over base + streamed delta: rank cells by
    centroid cosine, exact top-k inside the probed cells of BOTH
    zones. A query issued after any micro-batch commit sees the new
    vectors at the same probe cost."""
    from pyspark.sql import functions as F

    from fuse_query_spark.operators.similarity import (
        _rank_probe_cells,
        brute_force_topk,
    )

    crows = spark.read.parquet(f"{index_path}/centroids").collect()
    by_cell = {r["cell"]: r["centroid"] for r in crows}
    centroids = [by_cell[i] for i in sorted(by_cell)]
    probe_cells = _rank_probe_cells(centroids, query_vec, n_probe)
    vectors = index_vectors_fresh(spark, index_path).filter(
        F.col("cell").isin(probe_cells)
    )
    return brute_force_topk(vectors, query_vec, vec_col=vec_col, id_col=id_col, k=k)


def compact_index(
    spark: SparkSession,
    index_path: str,
    k_cells: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """The periodic batch pass that folds the streamed delta into the
    base and RE-TRAINS the quantizer on the union (centroid drift is
    the cost of frozen-codebook ingest; this is where it's paid down).
    Staging discipline: the new index is built into `<path>.staging/`
    first and swapped in with directory renames, so a concurrent
    reader never sees a half-built index; the delta zone and the
    ingest checkpoint must be retired TOGETHER (a replayed micro-batch
    against a compacted index would double-ingest), which is why this
    returns only after both are moved aside. Single-writer assumption:
    stop the ingest query before compacting — same contract as every
    LSM compactor."""
    import shutil

    from fuse_query_spark.operators.similarity import ivf_index_write

    union = index_vectors_fresh(spark, index_path).drop("cell")
    staging = f"{index_path}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    centroids = ivf_index_write(
        union, staging, k_cells=k_cells, iters=iters, vec_col=vec_col, id_col=id_col
    )
    retired = f"{index_path}.retired"
    shutil.rmtree(retired, ignore_errors=True)
    shutil.move(index_path, retired)
    shutil.move(staging, index_path)
    shutil.rmtree(retired, ignore_errors=True)
    return centroids
