"""Wire-protocol front-ends over the Engine — the reference's primary
entry points (fusequery/query/src/servers/): the MySQL text protocol
(mysql_server.py, mysql_handler.rs:29), the ClickHouse native TCP
protocol (clickhouse_server.py, clickhouse_handler.rs:28), and the
HTTP API (http_api.py, api/http_service.rs)."""

from fuse_query_spark.servers.clickhouse_server import ClickHouseServer
from fuse_query_spark.servers.http_api import ClusterRegistry, HttpApiServer
from fuse_query_spark.servers.metrics import METRICS, MetricService
from fuse_query_spark.servers.mysql_server import MySQLServer

__all__ = [
    "ClickHouseServer",
    "ClusterRegistry",
    "HttpApiServer",
    "METRICS",
    "MetricService",
    "MySQLServer",
]
