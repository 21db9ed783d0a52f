"""HTTP management API + cluster-membership registry.

Mirrors the reference's warp HTTP router (fusequery/query/src/api/
http/router.rs: /v1/hello, /v1/configs, /v1/cluster/{list,add,remove},
/debug/home) and its Cluster registry (clusters/cluster.rs:23-27: a
mutex'd name->node map with priority and address; sequence numbers
assigned on add). On Spark the EXECUTION topology belongs to the
cluster manager — this registry is the metadata surface the reference
exposes over HTTP and through system.clusters; it does not schedule
work (the reference's flight-based stage dispatch maps to Spark's own
shuffle/scheduler, documented out of scope in README).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from fuse_query_spark.cluster import ClusterRegistry  # noqa: F401  (re-export)


class HttpApiServer:
    """Threaded HTTP server with the reference's /v1 route surface."""

    def __init__(self, config: dict | None = None, cluster: ClusterRegistry | None = None,
                 host: str = "127.0.0.1", port: int = 8080):
        self.config = config or {}
        self.cluster = cluster or ClusterRegistry()
        self.host = host
        self.port = port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> int:
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def _send(self, code: int, body: str, ctype: str = "text/plain"):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                # hello.rs / config.rs both render the config
                if self.path in ("/v1/hello", "/v1/configs"):
                    self._send(200, json.dumps(api.config), "application/json")
                elif self.path == "/v1/cluster/list":
                    self._send(200, json.dumps(api.cluster.get_nodes()), "application/json")
                elif self.path == "/debug/home":
                    self._send(200, json.dumps({"status": "ok", "config": api.config}),
                               "application/json")
                else:
                    self._send(404, "not found")

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    # a malformed header previously killed the handler
                    # thread with no response (code-review r8)
                    self._send(400, "invalid Content-Length")
                    return
                if n > 16 * 1024:  # content_length_limit(1024*16), cluster.rs:70
                    self._send(413, "payload too large")
                    return
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self._send(400, "invalid json")
                    return
                if not isinstance(req, dict):
                    # a JSON array/scalar body would TypeError on
                    # req["name"] below and kill the handler thread
                    # with no response — reject it properly
                    self._send(400, "expected a JSON object")
                    return
                if self.path == "/v1/cluster/add":
                    try:
                        api.cluster.add_node(req["name"], int(req["priority"]), req["address"])
                        self._send(200, "")
                    except (ValueError, KeyError, TypeError) as e:
                        # TypeError: int(None) / unhashable JSON values
                        # killed the thread with no response
                        self._send(400, str(e))
                elif self.path == "/v1/cluster/remove":
                    api.cluster.remove_node(req.get("name", ""))
                    self._send(200, "")
                else:
                    self._send(404, "not found")

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
