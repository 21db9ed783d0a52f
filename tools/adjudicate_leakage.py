"""Ad-hoc r12 adjudication: quiet-window re-measure of
sample_split_leakage_safe at sf0.1 (judge r11 ask #1)."""
import json, os, statistics, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fuse_query_spark.queries import load_registry
from fuse_query_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
reg = load_registry()
spark = get_spark("adjudicate-leakage")
spark.range(1_000_000).selectExpr("sum(id)").collect()

def force(df):
    df.write.format("noop").mode("overwrite").save()

def gc_ms(spark):
    try:
        jvm = spark._jvm
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    except Exception:
        return -1

spec = reg["sample_split_leakage_safe"]
runs = []
for i in range(6):
    load = os.getloadavg()[0]
    g0 = gc_ms(spark)
    t0 = time.time()
    force(spec.fn(spark, sf_dir))
    dt = time.time() - t0
    g1 = gc_ms(spark)
    runs.append({"run": i, "sec": round(dt, 3), "load_1m": round(load, 2), "gc_ms": g1 - g0})
    print(json.dumps(runs[-1]), flush=True)
warm = [r["sec"] for r in runs[1:]]
print(json.dumps({"cold": runs[0]["sec"], "warm_median": round(statistics.median(warm), 3),
                  "warm_all": warm}), flush=True)
