"""Interleaved A/B of the r12 spread_table change: within ONE session,
alternate runs with FQ_SPREAD_DISABLE unset (spread ON) and set
(spread OFF) so ambient drift cancels. Prints per-arm medians."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuse_query_spark.queries import load_registry
from fuse_query_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    names = sys.argv[1:]
    registry = load_registry()
    spark = get_spark("fq-ab-spread")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        spec = registry.get(name)
        if spec is None:
            print("unknown", name)
            continue
        on, off = [], []
        # warm both arms once (codegen compile) before timing
        for arm in ("on", "off"):
            os.environ.pop("FQ_SPREAD_DISABLE", None)
            if arm == "off":
                os.environ["FQ_SPREAD_DISABLE"] = "1"
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for _ in range(rounds):
            for arm, sink in (("on", on), ("off", off)):
                os.environ.pop("FQ_SPREAD_DISABLE", None)
                if arm == "off":
                    os.environ["FQ_SPREAD_DISABLE"] = "1"
                t0 = time.time()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                sink.append(time.time() - t0)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        os.environ.pop("FQ_SPREAD_DISABLE", None)
        m_on, m_off = statistics.median(on), statistics.median(off)
        print(
            f"{name:42s} ON={m_on:6.3f} OFF={m_off:6.3f} ratio={m_on/m_off:5.2f} "
            f"on={[round(x,2) for x in on]} off={[round(x,2) for x in off]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
