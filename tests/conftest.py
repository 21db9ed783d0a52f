import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuse_query_spark.session import get_spark
from fuse_query_spark.testing import duckdb_conn

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fuse-query-spark-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


def spawn_peer(cpus: int = 2):
    """Start a peer engine + Flight service in a separate JVM/process;
    returns (Popen, port). Caller terminates. Shared by the Flight
    stage tests and the Engine.sql distributed-select tests."""
    import subprocess
    import threading

    peer_src = f"""
import sys
sys.path.insert(0, ".")
from fuse_query_spark.engine import Engine
from fuse_query_spark.servers.flight_server import FuseQueryFlightService
from fuse_query_spark.session import get_spark

spark = get_spark("flight-peer", cpus={cpus})
srv = FuseQueryFlightService(Engine(spark), "grpc://0.0.0.0:0")
print(f"PORT={{srv.port}}", flush=True)
srv.serve()
"""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c", peer_src],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        cwd=root,
        text=True,
    )
    port_box: list = []
    got_port = threading.Event()

    def _read_port():
        for line in proc.stdout:
            if not got_port.is_set() and line.startswith("PORT="):
                port_box.append(int(line.strip().split("=", 1)[1]))
                got_port.set()
        got_port.set()  # EOF without a port — unblock the waiter

    # the reader thread stays alive DRAINING stdout for the peer's
    # lifetime: stdout is a PIPE, and a peer that later logs more than
    # the OS buffer (~64 KB) would block mid-write and hang its
    # in-flight query (code-review r9); the waiter blocks on the event,
    # not the thread
    t = threading.Thread(target=_read_port, daemon=True)
    t.start()
    got_port.wait(timeout=180)  # JVM + session startup
    if not port_box:
        proc.terminate()
        raise RuntimeError("peer process never reported its port")
    return proc, port_box[0]
