"""Multi-iteration latency harness — the Spark-side counterpart of the
reference's perf suite (tests/perfs/perfs.yaml + perfs.py: named suites,
per-suite `iterations` / `concurrency` overrides, one JSON result file
per suite written by fuse-benchmark's --json).

Differences from bench.py: bench.py is the driver's single-number
feedback loop (best-of-N, one line of JSON). This harness records the
FULL latency distribution per suite — every iteration, min/median/p95 —
and supports concurrent clients: with concurrency=c, c Python threads
submit the same query simultaneously into one SparkSession, exercising
Spark's multi-job scheduling the way the reference's `-c` flag
exercises its session queue.

Usage:
    python tools/perf.py                          # built-in suites, sf0.1
    python tools/perf.py --sf-dir /root/testdata/sf0.01
    python tools/perf.py --queries q01_pricing_summary,dedup_minhash_lsh
    python tools/perf.py --iterations 5 --concurrency 4
    python tools/perf.py --config my_suites.json  # same shape as SUITES
    python tools/perf.py --output /tmp/perf-out   # per-suite JSON files

Each suite result file ({name}-result.json) holds the raw latencies and
summary stats; stdout gets one table row per suite plus a final JSON
summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuse_query_spark.queries import load_registry
from fuse_query_spark.session import get_spark

# Built-in suites — a 1:1 mirror of the reference's perfs.yaml shapes
# (Aggregation avg/count/max/sum are one multi-agg scan here; the
# remaining rows map suite-for-suite), plus the flagship TPC-H query.
SUITES = [
    {"name": "Aggregation multi", "query": "numbers_throughput_100m"},
    {"name": "Aggregation sum3", "query": "numbers_sum_triple_100m"},
    {"name": "Sort", "query": "numbers_topk_sort_100m"},
    {"name": "Substring", "query": "numbers_substring_topk"},
    {"name": "Group By", "query": "numbers_groupby3_100m"},
    {"name": "Pricing summary", "query": "q01_pricing_summary"},
    # extension ops (beyond the reference's perf suite)
    {"name": "MinHash LSH dedup", "query": "dedup_minhash_lsh"},
    {"name": "Decontaminate 4gram", "query": "decontaminate_ngram"},
    {"name": "Decontaminate bloom", "query": "decontaminate_bloom"},
    {"name": "ANN topk bruteforce", "query": "similarity_topk_bruteforce"},
    {"name": "Repetition metrics", "query": "text_repetition_metrics"},
    {"name": "Duplicated spans", "query": "dedup_duplicated_spans"},
    {"name": "Cross-corpus minhash", "query": "dedup_minhash_cross_corpus"},
]

DEFAULTS = {"iterations": 3, "concurrency": 1}


def force(df) -> None:
    # Full execution without driver collect — same sink as bench.py.
    df.write.format("noop").mode("overwrite").save()


def run_suite(spark, registry, suite, sf_dir, iterations, concurrency):
    spec = registry[suite["query"]]
    iters = int(suite.get("iterations", iterations))
    conc = int(suite.get("concurrency", concurrency))
    latencies: list[float] = []

    def one_client(_i: int) -> list[float]:
        out = []
        for _ in range(iters):
            t0 = time.time()
            force(spec.fn(spark, sf_dir))
            out.append(time.time() - t0)
        return out

    wall0 = time.time()
    if conc <= 1:
        latencies = one_client(0)
    else:
        with ThreadPoolExecutor(max_workers=conc) as pool:
            for chunk in pool.map(one_client, range(conc)):
                latencies.extend(chunk)
    wall = time.time() - wall0
    spark.catalog.clearCache()

    lat = sorted(latencies)
    stats = {
        "name": suite["name"],
        "query": suite["query"],
        "iterations": iters,
        "concurrency": conc,
        "executions": len(lat),
        "wall_sec": round(wall, 3),
        "latencies_sec": [round(x, 4) for x in latencies],
        "min_sec": round(lat[0], 4),
        "max_sec": round(lat[-1], 4),
        "mean_sec": round(statistics.fmean(lat), 4),
        "median_sec": round(statistics.median(lat), 4),
        "p95_sec": round(lat[max(0, int(len(lat) * 0.95) - 1)], 4),
        "qps": round(len(lat) / wall, 3) if wall > 0 else None,
    }
    return stats


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iterations", type=int, default=DEFAULTS["iterations"])
    ap.add_argument("--concurrency", type=int, default=DEFAULTS["concurrency"])
    ap.add_argument("--queries", help="comma-separated registry query names (overrides suites)")
    ap.add_argument("--config", help="JSON file: list of {name, query, iterations?, concurrency?}")
    ap.add_argument("--output", help="directory for per-suite {name}-result.json files")
    args = ap.parse_args()

    if args.config:
        with open(args.config) as f:
            suites = json.load(f)
    elif args.queries:
        suites = [{"name": q, "query": q} for q in args.queries.split(",") if q]
    else:
        suites = SUITES

    registry = load_registry()
    unknown = [s["query"] for s in suites if s["query"] not in registry]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("fuse-query-spark-perf")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    if args.output:
        os.makedirs(args.output, exist_ok=True)

    results = []
    for suite in suites:
        stats = run_suite(spark, registry, suite, args.sf_dir, args.iterations, args.concurrency)
        results.append(stats)
        print(
            f"{stats['name']:<24} x{stats['executions']:<3} c{stats['concurrency']:<3}"
            f" min {stats['min_sec']:>8.3f}s  median {stats['median_sec']:>8.3f}s"
            f"  p95 {stats['p95_sec']:>8.3f}s  qps {stats['qps']}",
            file=sys.stderr,
        )
        if args.output:
            fname = re.sub(r"\s+", "-", stats["name"]) + "-result.json"
            with open(os.path.join(args.output, fname), "w") as f:
                json.dump(stats, f, indent=2)

    print(json.dumps({"sf_dir": args.sf_dir, "suites": results}))


if __name__ == "__main__":
    main()
