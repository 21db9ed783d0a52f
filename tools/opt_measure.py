"""Round-12 optimization harness: time single registry queries with the
noop sink and capture their formatted plans.

Usage:
    python tools/opt_measure.py [--sf-dir DIR] [--runs N] [--plans DIR] \
        [--suffix before] query [query ...]

For each query: warm the session once, run `1+N` noop-sink executions
(first run reported as cold), print per-run seconds, and (with --plans)
write `<plans>/<query>_<suffix>.txt` containing `explain("formatted")`.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuse_query_spark.queries import load_registry
from fuse_query_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    registry = load_registry()
    spark = get_spark("fq-opt-measure")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    results = {}
    for name in args.queries:
        spec = registry.get(name)
        if spec is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = spec.fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for i in range(1 + args.runs):
            t0 = time.time()
            spec.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        spark._jvm.System.gc()
        warm = sorted(runs[1:])
        med = warm[len(warm) // 2] if len(warm) % 2 else (warm[len(warm) // 2 - 1] + warm[len(warm) // 2]) / 2
        results[name] = (runs[0], med)
        print(
            f"{name:48s} cold={runs[0]:7.3f} warm_med={med:7.3f} "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )
    print("== summary ==")
    for n, (c, m) in results.items():
        print(f"{m:8.3f}  {n}")


if __name__ == "__main__":
    main()
