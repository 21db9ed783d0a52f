"""HTTP management API tests (api/http/router.rs parity: /v1/hello,
/v1/configs, /v1/cluster/{list,add,remove}, /debug/home) and the
cluster registry's system.clusters integration."""

import json
import urllib.error
import urllib.request

import pytest

from fuse_query_spark.engine import Engine
from fuse_query_spark.servers import HttpApiServer


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture(scope="module")
def api(engine):
    srv = HttpApiServer(
        config={"version": "fuse-query-spark/0.1.0", "mysql_handler_port": 3307},
        cluster=engine.cluster,
        port=0,
    )
    srv.start()
    yield srv
    srv.stop()


def _get(api, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{api.port}{path}") as r:
        return r.status, r.read().decode()


def _post(api, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{api.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_hello_and_configs(api):
    for path in ("/v1/hello", "/v1/configs"):
        status, body = _get(api, path)
        assert status == 200
        assert json.loads(body)["version"].startswith("fuse-query-spark")


def test_cluster_add_list_remove(api):
    status, _ = _post(api, "/v1/cluster/add", {"name": "n1", "priority": 5, "address": "h1:9090"})
    assert status == 200
    status, body = _get(api, "/v1/cluster/list")
    nodes = json.loads(body)
    assert [n["name"] for n in nodes] == ["n1"]
    assert nodes[0]["priority"] == 5 and nodes[0]["address"] == "h1:9090"
    # duplicate name rejected (cluster.rs add_node Occupied branch)
    status, _ = _post(api, "/v1/cluster/add", {"name": "n1", "priority": 1, "address": "h2:9090"})
    assert status == 400
    # priority out of [0, 10] rejected (cluster.rs:18-20)
    status, _ = _post(api, "/v1/cluster/add", {"name": "n2", "priority": 11, "address": "h2:9090"})
    assert status == 400
    status, _ = _post(api, "/v1/cluster/remove", {"name": "n1"})
    assert status == 200
    _, body = _get(api, "/v1/cluster/list")
    assert json.loads(body) == []


def test_cluster_nodes_visible_in_system_clusters(api, engine):
    _post(api, "/v1/cluster/add", {"name": "sys_n", "priority": 3, "address": "h3:9090"})
    try:
        rows = engine.sql("SELECT name, address, priority FROM system.clusters").collect()
        by_name = {r.name: r for r in rows}
        assert "sys_n" in by_name
        assert by_name["sys_n"].address == "h3:9090"
        assert by_name["sys_n"].priority == 3
        # the local Spark app is always row 0
        assert any(r.address == "local" for r in rows)
    finally:
        _post(api, "/v1/cluster/remove", {"name": "sys_n"})


def test_debug_home_and_404(api):
    status, body = _get(api, "/debug/home")
    assert status == 200 and json.loads(body)["status"] == "ok"
    try:
        status, _ = _get(api, "/v1/nope")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404


def test_non_dict_json_body_rejected_400(api):
    status, body = _post(api, "/v1/cluster/add", [1, 2, 3])
    assert status == 400 and "object" in body
