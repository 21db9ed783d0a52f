"""Metrics registry + Prometheus exposition endpoint.

The reference runs a standalone MetricService (metrics/
metric_service.rs:73-87: a warp server answering EVERY path with the
Prometheus-rendered recorder state) fed by the server handlers:
`mysql.process_request_duration` (servers/mysql/
mysql_interactive_worker.rs:98), `clickhouse.process_request_duration`
(servers/clickhouse/interactive_worker.rs:43;
clickhouse_metrics.rs:5), and `session.connect_numbers` /
`session.close_numbers` (sessions/sessions.rs:73-114;
sessions/metrics.rs:5-6). Same surface here: a process-wide threadsafe
registry the wire servers record into, rendered in the Prometheus text
format with the same dot→underscore name sanitization the reference's
metrics-exporter-prometheus applies.
"""

from __future__ import annotations

import http.server
import threading

# duration buckets in seconds (Prometheus histogram convention)
_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)


class MetricsRegistry:
    """Counters + fixed-bucket histograms, safe across server threads."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, int] = {}
        self._hists: dict[str, dict] = {}

    def counter(self, name: str, value: int = 1) -> None:
        with self._lock:
            self._counters[name] = self._counters.get(name, 0) + value

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            h = self._hists.setdefault(
                name, {"buckets": [0] * len(_BUCKETS), "sum": 0.0, "count": 0}
            )
            h["sum"] += seconds
            h["count"] += 1
            for i, bound in enumerate(_BUCKETS):
                if seconds <= bound:
                    h["buckets"][i] += 1

    def snapshot(self) -> list[tuple[str, float]]:
        """Locked (name, value) snapshot: counters plus histogram
        _sum/_count rows — the read API for non-Prometheus consumers
        (system.metrics), keeping the locking discipline here."""
        with self._lock:
            rows = [(k, float(v)) for k, v in self._counters.items()]
            for k, h in self._hists.items():
                rows.append((f"{k}_sum", float(h["sum"])))
                rows.append((f"{k}_count", float(h["count"])))
            return sorted(rows)

    @staticmethod
    def _sanitize(name: str) -> str:
        # metrics-exporter-prometheus maps every non-[a-zA-Z0-9_:] to _
        return "".join(c if (c.isalnum() or c in "_:") else "_" for c in name)

    def render(self) -> str:
        """Prometheus text exposition format v0.0.4."""
        with self._lock:
            lines: list[str] = []
            for name, v in sorted(self._counters.items()):
                s = self._sanitize(name)
                lines.append(f"# TYPE {s} counter")
                lines.append(f"{s} {v}")
            for name, h in sorted(self._hists.items()):
                s = self._sanitize(name)
                lines.append(f"# TYPE {s} histogram")
                # buckets are stored cumulatively (observe increments
                # every bucket whose bound covers the value)
                for bound, n in zip(_BUCKETS, h["buckets"]):
                    lines.append(f'{s}_bucket{{le="{bound}"}} {n}')
                lines.append(f'{s}_bucket{{le="+Inf"}} {h["count"]}')
                lines.append(f"{s}_sum {h['sum']}")
                lines.append(f"{s}_count {h['count']}")
            return "\n".join(lines) + "\n"


# process-wide registry, like the reference's global metrics recorder
METRICS = MetricsRegistry()

# the reference's metric names, verbatim
METRIC_MYSQL_PROCESSOR_REQUEST_DURATION = "mysql.process_request_duration"
METRIC_CLICKHOUSE_PROCESSOR_REQUEST_DURATION = "clickhouse.process_request_duration"
METRIC_SESSION_CONNECT_NUMBERS = "session.connect_numbers"
METRIC_SESSION_CLOSE_NUMBERS = "session.close_numbers"


class MetricService:
    """HTTP server answering every path with the rendered registry
    (metric_service.rs:75: `warp::any()` — no routing). Start with
    .start() (returns the bound port), stop with .stop()."""

    def __init__(self, registry: MetricsRegistry | None = None, host: str = "127.0.0.1", port: int = 7070):
        self.registry = registry or METRICS
        self.host = host
        self.port = port
        self._server: http.server.ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> int:
        registry = self.registry

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                body = registry.render().encode()
                self.send_response(200)
                self.send_header("content-type", "text/plain; version=0.0.4")
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        self._server = http.server.ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
