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


def probe_ops(spark, docs):
    from fuse_query_spark.operators.dedup import (
        dedup_exact,
        duplicated_spans,
        minhash_dedup_pairs,
    )
    from fuse_query_spark.operators.sampling import (
        contaminated_ids,
        contaminated_ids_bloom,
    )
    from fuse_query_spark.operators.text import repetition_metrics

    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    return {
        "dedup_exact": lambda: dedup_exact(docs),
        "minhash_lsh_pairs": lambda: minhash_dedup_pairs(docs, k=16, bands=4, threshold=0.2),
        "decontaminate": lambda: contaminated_ids(corpus, ev, n=4),
        "decontaminate_bloom": lambda: contaminated_ids_bloom(corpus, ev, n=4, adaptive=True),
        "repetition_metrics": lambda: repetition_metrics(docs),
        "duplicated_spans": lambda: duplicated_spans(docs, k=3),
    }


def main():
    rs = [int(a) for a in sys.argv[1:]] or [4, 16, 64]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling-probe")
    base = table(spark, sf_dir, "documents")
    # warm-up: run every operator once at R=1 so codegen compilation
    # and shuffle-service spin-up don't pollute the smallest R's time
    warm = replicated(base, 1)
    for build in probe_ops(spark, warm).values():
        build().write.format("noop").mode("overwrite").save()
    results: dict[str, dict[int, float]] = {}
    for r in rs:
        docs = replicated(base, r)
        docs.write.format("noop").mode("overwrite").save()  # materialize-cost floor
        for name, build in probe_ops(spark, docs).items():
            t0 = time.monotonic()
            build().write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 3)
            results.setdefault(name, {})[r] = dt
            print(json.dumps({"op": name, "replication": r, "sec": dt}), flush=True)
    # slope between consecutive Rs: t(Rb)/t(Ra) / (Rb/Ra); 1.0 = linear
    slopes = {}
    for name, times in results.items():
        pairs = {}
        for ra, rb in zip(rs, rs[1:]):
            if times.get(ra, 0) > 0:
                pairs[f"{ra}->{rb}"] = round(times[rb] / times[ra] / (rb / ra), 3)
        slopes[name] = pairs
    print(json.dumps({"slope_vs_linear": slopes, "rows_base": base.count(), "rs": rs}))


if __name__ == "__main__":
    main()
