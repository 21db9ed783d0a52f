"""r12 SCALE.md measurement: the sort/limit Convergent stage's
fan-out economics — local vs two-peer wall for the top-k headline
shape at growing N, plus the arg-extremum and keys-only/DISTINCT
wire shapes. Run ALONE (bench rules: no parallel Spark jobs)."""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuse_query_spark.engine import Engine
from fuse_query_spark.servers.flight_server import FuseQueryFlightService
from fuse_query_spark.session import get_spark


def wall(engine, sql, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        engine.sql(sql).collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main():
    spark = get_spark("measure-converge")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    servers = []
    for _ in range(2):
        srv = FuseQueryFlightService(Engine(spark), "grpc://0.0.0.0:0")
        threading.Thread(target=srv.serve, daemon=True).start()
        servers.append(srv)
    local = Engine(spark)
    coord = Engine(spark)
    coord.sql("SET min_distributed_rows = 0")
    for i, srv in enumerate(servers):
        coord.cluster.add_node(f"p{i}", 5, f"grpc://localhost:{srv.port}")
    dispatched = []
    coord._dist_after_dispatch = lambda a: dispatched.append(a)
    out = []
    try:
        for n_rows in (10_000_000, 100_000_000, 500_000_000):
            sql = (
                f"SELECT number FROM numbers_mt({n_rows}) "
                "ORDER BY number DESC LIMIT 100"
            )
            lw = wall(local, sql)
            n0 = len(dispatched)
            dw = wall(coord, sql)
            assert len(dispatched) > n0
            out.append({"shape": "topk", "n": n_rows, "local": lw,
                        "two_peer": dw, "premium": round(dw - lw, 3)})
            print(json.dumps(out[-1]), flush=True)
        for name, sql in [
            ("argmax", "SELECT number % 8 AS g, argMax(number % 17, number) AS am "
                       "FROM numbers(100000000) GROUP BY number % 8"),
            ("stddev", "SELECT number % 8 AS g, stddev_samp(number % 9973) AS s "
                       "FROM numbers(100000000) GROUP BY number % 8"),
            ("distinct", "SELECT DISTINCT number % 9973 AS d FROM numbers(100000000)"),
        ]:
            lw = wall(local, sql)
            n0 = len(dispatched)
            dw = wall(coord, sql)
            assert len(dispatched) > n0
            out.append({"shape": name, "n": 100_000_000, "local": lw,
                        "two_peer": dw, "premium": round(dw - lw, 3)})
            print(json.dumps(out[-1]), flush=True)
    finally:
        for srv in servers:
            try:
                srv.shutdown()
            except Exception:
                pass
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
