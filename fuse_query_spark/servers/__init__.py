"""Wire-protocol front-ends over the Engine — the reference's primary
entry points (fusequery/query/src/servers/): MySQL today, see
mysql_server.py. The ClickHouse native-TCP handler
(clickhouse_handler.rs:28) remains out of scope (binary columnar
protocol with per-type codecs; the semantics it would expose are the
same Engine.sql surface)."""

from fuse_query_spark.servers.http_api import ClusterRegistry, HttpApiServer
from fuse_query_spark.servers.mysql_server import MySQLServer

__all__ = ["ClusterRegistry", "HttpApiServer", "MySQLServer"]
