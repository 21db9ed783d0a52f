"""Remote-engine analog: a local "fusestore" service + client.

The reference's Remote engine (datasources/remote/remote_table.rs:27-181,
remote_table_do_read.rs, remote_database.rs) backs tables in a separate
store process reached over Arrow Flight: CREATE/DROP go through MetaApi
(store_client_provider.rs), reads call `client.read_plan(db, tbl, scan)`
to get back the partition list, and `append_data` streams blocks to the
store. `CREATE DATABASE` without `ENGINE = Local` lands in the remote
database (09_0000_remote_create_table expects engine `remote`).

The Spark-first mapping, and the scale rationale:

- **Meta plane** — ``FuseStore`` here is a small HTTP/JSON service over
  a root directory: database/table DDL, schema registry (persisted as
  ``_meta.json`` so the store survives restarts), and ``read_plan``
  returning the table's parquet part locations. This mirrors MetaApi's
  create_table/drop_table/get_table and StorageApi::read_plan.
- **Data plane** — the reference streams every data block through the
  store service (Flight do_get per partition). On Spark that would
  funnel a distributed scan through one socket; the idiomatic analog is
  the Hive-metastore/object-store split: ``read_plan`` returns part
  LOCATIONS and Spark executors scan those parquet parts directly, in
  parallel, with pushdown and pruning intact. At cluster scale the
  store root is an object-store prefix (s3a://...) and nothing changes
  structurally: meta over HTTP, data read by executors from storage.
- **Append** — the engine writes blocks as parquet via Spark (rows
  never pass through the driver as rows) and ships the resulting part
  FILES to the store's data endpoint, the stand-in for append_data's
  block stream. At scale this becomes a direct executor write to the
  store prefix; the HTTP hop is the single-process stand-in.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from fuse_query_spark.errors import (
    DatabaseAlreadyExists,
    TableAlreadyExists,
    UnknownDatabase,
    UnknownTable,
)

_SAFE_NAME = re.compile(r"^\w+$")


class _StoreState:
    """Store-side catalog + file layout: <root>/<db>/<table>/part-N.parquet,
    schemas in <root>/_meta.json (Spark StructType.json strings)."""

    def __init__(self, root: str):
        self.root = root
        self.lock = threading.Lock()
        self.meta_path = os.path.join(root, "_meta.json")
        os.makedirs(root, exist_ok=True)
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                self.meta: dict[str, dict[str, str]] = json.load(f)
        else:
            self.meta = {}

    def _flush(self) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, self.meta_path)

    @staticmethod
    def _check_name(*names: str) -> None:
        for n in names:
            if not _SAFE_NAME.match(n or ""):
                raise ValueError(f"illegal identifier: {n!r}")

    def create_database(self, db: str) -> None:
        self._check_name(db)
        with self.lock:
            if db in self.meta:
                raise DatabaseAlreadyExists(f"Database '{db}' already exists")
            self.meta[db] = {}
            os.makedirs(os.path.join(self.root, db), exist_ok=True)
            self._flush()

    def drop_database(self, db: str) -> None:
        self._check_name(db)
        with self.lock:
            if db not in self.meta:
                raise UnknownDatabase(f"Unknown database: '{db}'")
            del self.meta[db]
            shutil.rmtree(os.path.join(self.root, db), ignore_errors=True)
            self._flush()

    def create_table(self, db: str, table: str, schema_json: str) -> None:
        self._check_name(db, table)
        with self.lock:
            if db not in self.meta:
                raise UnknownDatabase(f"Unknown database: '{db}'")
            if table in self.meta[db]:
                raise TableAlreadyExists(f"Table '{db}.{table}' already exists")
            self.meta[db][table] = schema_json
            os.makedirs(os.path.join(self.root, db, table), exist_ok=True)
            self._flush()

    def drop_table(self, db: str, table: str) -> None:
        self._check_name(db, table)
        with self.lock:
            if db not in self.meta:
                raise UnknownDatabase(f"Unknown database: '{db}'")
            if table not in self.meta[db]:
                raise UnknownTable(f"Unknown table: '{db}.{table}'")
            del self.meta[db][table]
            shutil.rmtree(os.path.join(self.root, db, table), ignore_errors=True)
            self._flush()

    def read_plan(self, db: str, table: str) -> dict:
        self._check_name(db, table)
        with self.lock:
            if db not in self.meta:
                raise UnknownDatabase(f"Unknown database: '{db}'")
            if table not in self.meta[db]:
                raise UnknownTable(f"Unknown table: '{db}.{table}'")
            tdir = os.path.join(self.root, db, table)
            parts = sorted(
                os.path.join(tdir, p) for p in os.listdir(tdir) if p.endswith(".parquet")
            ) if os.path.isdir(tdir) else []
            return {"schema": self.meta[db][table], "parts": parts}

    def append_part(self, db: str, table: str, data: bytes) -> str:
        self._check_name(db, table)
        with self.lock:
            if db not in self.meta or table not in self.meta[db]:
                raise UnknownTable(f"Unknown table: '{db}.{table}'")
            tdir = os.path.join(self.root, db, table)
            os.makedirs(tdir, exist_ok=True)
            n = sum(1 for p in os.listdir(tdir) if p.endswith(".parquet"))
            path = os.path.join(tdir, f"part-{n:05d}.parquet")
            while os.path.exists(path):  # dropped-and-recreated gap safety
                n += 1
                path = os.path.join(tdir, f"part-{n:05d}.parquet")
            with open(path, "wb") as f:
                f.write(data)
            return path

    def databases(self) -> dict[str, dict[str, str]]:
        with self.lock:
            return {db: dict(tables) for db, tables in self.meta.items()}


_ERR_CODE = {
    # reference common/exception error codes surfaced over the wire
    "UnknownDatabase": 3,
    "UnknownTable": 25,
    "DatabaseAlreadyExists": 3,
    "TableAlreadyExists": 2,
}


class _StoreHandler(BaseHTTPRequestHandler):
    server_version = "fusestore-analog/0.1"

    def log_message(self, *a):  # silence request logging in tests
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _fail(self, e: Exception) -> None:
        self._json(
            400,
            {"error": str(e), "code": _ERR_CODE.get(type(e).__name__, 1000)},
        )

    def do_GET(self):
        state: _StoreState = self.server.state  # type: ignore[attr-defined]
        url = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(url.query)
        try:
            if url.path == "/v1/meta/read_plan":
                self._json(200, state.read_plan(q["db"][0], q["table"][0]))
            elif url.path == "/v1/meta/databases":
                self._json(200, {"databases": state.databases()})
            else:
                self._json(404, {"error": f"no route {url.path}"})
        except Exception as e:
            self._fail(e)

    def do_POST(self):
        state: _StoreState = self.server.state  # type: ignore[attr-defined]
        url = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(url.query)
        length = int(self.headers.get("Content-Length", "0"))
        body = self.rfile.read(length)
        try:
            if url.path == "/v1/meta":
                req = json.loads(body)
                op = req.get("op")
                if op == "create_database":
                    state.create_database(req["db"])
                elif op == "drop_database":
                    state.drop_database(req["db"])
                elif op == "create_table":
                    state.create_table(req["db"], req["table"], req["schema"])
                elif op == "drop_table":
                    state.drop_table(req["db"], req["table"])
                else:
                    raise ValueError(f"unknown meta op {op!r}")
                self._json(200, {"ok": True})
            elif url.path == "/v1/data/append":
                part = state.append_part(q["db"][0], q["table"][0], body)
                self._json(200, {"ok": True, "part": part})
            else:
                self._json(404, {"error": f"no route {url.path}"})
        except Exception as e:
            self._fail(e)


class FuseStore:
    """The store service: start() binds (port=0 → ephemeral) and
    returns the base URL."""

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self.state = _StoreState(root)
        self.host = host
        self.port = port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> str:
        srv = ThreadingHTTPServer((self.host, self.port), _StoreHandler)
        srv.daemon_threads = True
        srv.state = self.state  # type: ignore[attr-defined]
        self._server = srv
        self.port = srv.server_address[1]
        self._thread = threading.Thread(target=srv.serve_forever, daemon=True)
        self._thread.start()
        return self.url

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


class StoreClient:
    """MetaApi/StorageApi analog over the HTTP store (the reference's
    StoreClientProvider hands out Flight clients; remote_table.rs calls
    read_plan/append_data through it)."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")

    def _request(self, method: str, path: str, body: bytes | None = None, **params) -> dict:
        qs = ("?" + urllib.parse.urlencode(params)) if params else ""
        req = urllib.request.Request(self.url + path + qs, data=body, method=method)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            try:
                payload = json.loads(e.read())
            except Exception:
                raise ConnectionError(f"store error {e.code}") from e
            code, msg = payload.get("code", 1000), payload.get("error", "store error")
            for exc_type, exc_code in (
                (UnknownDatabase, 3),
                (UnknownTable, 25),
                (TableAlreadyExists, 2),
            ):
                if code == exc_code:
                    raise exc_type(msg) from None
            raise ConnectionError(msg) from None

    def create_database(self, db: str) -> None:
        self._request("POST", "/v1/meta", json.dumps({"op": "create_database", "db": db}).encode())

    def drop_database(self, db: str) -> None:
        self._request("POST", "/v1/meta", json.dumps({"op": "drop_database", "db": db}).encode())

    def create_table(self, db: str, table: str, schema_json: str) -> None:
        self._request(
            "POST",
            "/v1/meta",
            json.dumps(
                {"op": "create_table", "db": db, "table": table, "schema": schema_json}
            ).encode(),
        )

    def drop_table(self, db: str, table: str) -> None:
        self._request(
            "POST", "/v1/meta", json.dumps({"op": "drop_table", "db": db, "table": table}).encode()
        )

    def read_plan(self, db: str, table: str) -> dict:
        return self._request("GET", "/v1/meta/read_plan", db=db, table=table)

    def append_parquet(self, db: str, table: str, data: bytes) -> str:
        return self._request("POST", "/v1/data/append", body=data, db=db, table=table)["part"]

    def databases(self) -> dict[str, dict[str, str]]:
        return self._request("GET", "/v1/meta/databases")["databases"]
