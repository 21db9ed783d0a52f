"""Arrow Flight transport for the fusestore analog — the reference
store's ACTUAL wire protocol, as a drop-in alternative to the HTTP
transport in remote_store.py (same `_StoreState`, same client surface,
so `Engine.attach_store("grpc://...")` routes here transparently).

Reference parity (fusestore/store/src/api/rpc/flight_service.rs):
- handshake: BasicAuth payload, only user "root" is known
  (flight_service.rs:84-118); every subsequent call carries the issued
  token and is rejected without it (check_token, :67-79). Mapped onto
  pyarrow's ServerAuthHandler/ClientAuthHandler pair.
- do_action: serde-enum JSON bodies — {"CreateDatabase": {"plan":
  ...}}, CreateTable/DropTable/DropDatabase/GetTable/ReadPlan
  (common/flights/src/store_do_action.rs:47-63; the reference wraps
  the JSON in a one-field protobuf envelope, FlightStoreRequest —
  carried here as the bare JSON, the envelope being transport
  plumbing with no semantic content). Results return JSON bodies.
- do_get: StoreDoGet enum tickets (store_do_get.rs:25-28) —
  {"Read": {"part": ...}} streams one partition's rows as record
  batches (read_partition), {"Pull": {"key": ...}} streams a raw
  file's bytes (do_pull_file).
- do_put: append a stream of record batches to db/table (the
  descriptor path carries the target, standing in for the reference's
  gRPC metadata keys); the appended part name returns in the
  PutResult metadata (flight_service.rs:181-207).
- list_flights/get_flight_info/get_schema/do_exchange/list_actions:
  unimplemented!() in the reference — the base class raises here too.
- ListDatabases is a documented EXTENSION action (the engine's SHOW
  DATABASES over an attached store needs a listing; the reference
  reads its meta state engine-side instead).

Scale note: identical to the HTTP transport's — the meta plane moves
KBs; `read_plan` returns part LOCATIONS and Spark executors scan the
parquet parts directly in parallel (the do_get Read stream exists for
protocol parity and store-side consumers, not for funneling a
distributed scan through one socket).
"""

from __future__ import annotations

import io
import json

import pyarrow as pa
import pyarrow.flight as flight

from fuse_query_spark.errors import (
    DatabaseAlreadyExists,
    TableAlreadyExists,
    UnknownDatabase,
    UnknownTable,
)
from fuse_query_spark.sources.remote_store import _ERR_CODE, _StoreState

_TOKEN = b"fusestore-token-root"


class _ServerAuth(flight.ServerAuthHandler):
    """BasicAuth handshake -> bearer token (flight_service.rs:84-118:
    only user "root" exists; everything else is unauthenticated)."""

    def authenticate(self, outgoing, incoming):
        payload = incoming.read()
        user = bytes(payload).split(b":", 1)[0]
        if user != b"root":
            raise flight.FlightUnauthenticatedError(
                f"Don't know user {user.decode(errors='replace')}"
            )
        outgoing.write(_TOKEN)

    def is_valid(self, token):
        if bytes(token) != _TOKEN:
            raise flight.FlightUnauthenticatedError("Error auth-token-bin is empty")
        return b"root"


class _ClientAuth(flight.ClientAuthHandler):
    def __init__(self, username: str = "root", password: str = ""):
        super().__init__()
        self._payload = f"{username}:{password}".encode()
        self._token = b""

    def authenticate(self, outgoing, incoming):
        outgoing.write(self._payload)
        self._token = incoming.read()

    def get_token(self):
        return self._token


def _wire_err(e: Exception) -> flight.FlightServerError:
    code = _ERR_CODE.get(type(e).__name__, 1000)
    return flight.FlightServerError(json.dumps({"code": code, "error": str(e)}))


class FuseStoreFlight(flight.FlightServerBase):
    """The store service over Flight. `location` grpc://0.0.0.0:0
    picks an ephemeral port (read `.port`)."""

    def __init__(self, root: str, location: str = "grpc://0.0.0.0:0"):
        super().__init__(location, auth_handler=_ServerAuth())
        self.state = _StoreState(root)

    # --- do_action: meta plane ----------------------------------------
    def do_action(self, context, action: flight.Action):
        try:
            body = json.loads(action.body.to_pybytes().decode("utf-8") or "{}")
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise flight.FlightServerError(f"invalid action body: {e}") from None
        if not isinstance(body, dict) or len(body) != 1:
            raise flight.FlightServerError(
                "expected a single-variant StoreDoAction object"
            )
        variant, payload = next(iter(body.items()))
        try:
            if variant == "CreateDatabase":
                self.state.create_database(payload["plan"]["db"])
                out = {}
            elif variant == "DropDatabase":
                self.state.drop_database(payload["plan"]["db"])
                out = {}
            elif variant == "CreateTable":
                p = payload["plan"]
                self.state.create_table(p["db"], p["table"], p["schema"])
                out = {}
            elif variant == "DropTable":
                p = payload["plan"]
                self.state.drop_table(p["db"], p["table"])
                out = {}
            elif variant == "GetTable":
                plan = self.state.read_plan(payload["db"], payload["table"])
                out = {"schema": plan["schema"]}
            elif variant == "ReadPlan":
                sp = payload["scan_plan"]
                out = self.state.read_plan(sp["db"], sp["table"])
            elif variant == "ListDatabases":  # documented extension
                out = {"databases": self.state.databases()}
            else:
                raise NotImplementedError(f"UnImplement action {variant}")
        except (
            UnknownDatabase,
            UnknownTable,
            TableAlreadyExists,
            DatabaseAlreadyExists,
            ValueError,
            KeyError,
        ) as e:
            raise _wire_err(e) from None
        return iter([flight.Result(json.dumps(out).encode("utf-8"))])

    # --- do_get: data plane -------------------------------------------
    def do_get(self, context, ticket: flight.Ticket):
        try:
            t = json.loads(ticket.ticket.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise flight.FlightServerError(f"invalid ticket: {e}") from None
        if "Read" in t:  # stream one partition's rows (read_partition)
            import pyarrow.parquet as pq

            part = t["Read"]["part"]
            if not self._part_ok(part):
                raise flight.FlightServerError("part outside the store root")
            try:
                table = pq.read_table(part)
            except FileNotFoundError:
                raise _wire_err(UnknownTable(f"no such part: {part}")) from None
            return flight.RecordBatchStream(table)
        if "Pull" in t:  # stream a raw file's bytes (do_pull_file)
            key = t["Pull"]["key"]
            if not self._part_ok(key):
                raise flight.FlightServerError("key outside the store root")
            try:
                with open(key, "rb") as f:
                    data = f.read()
            except FileNotFoundError:
                raise _wire_err(UnknownTable(f"no such file: {key}")) from None
            chunks = [data[i : i + (1 << 20)] for i in range(0, len(data), 1 << 20)] or [b""]
            table = pa.table({"data": pa.array(chunks, pa.binary())})
            return flight.RecordBatchStream(table)
        raise flight.FlightServerError("ticket must be a Read or Pull StoreDoGet")

    def _part_ok(self, path: str) -> bool:
        import os

        root = os.path.realpath(self.state.root)
        return os.path.realpath(path).startswith(root + os.sep)

    # --- do_put: block-stream append ----------------------------------
    def do_put(self, context, descriptor, reader, writer):
        path = [p.decode() for p in descriptor.path or []]
        if len(path) != 2:
            raise flight.FlightServerError("descriptor path must be [db, table]")
        db, tbl = path
        import pyarrow.parquet as pq

        table = reader.read_all()
        buf = io.BytesIO()
        pq.write_table(table, buf)
        try:
            part = self.state.append_part(db, tbl, buf.getvalue())
        except (UnknownDatabase, UnknownTable, ValueError) as e:
            raise _wire_err(e) from None
        writer.write(pa.py_buffer(json.dumps({"part": part}).encode("utf-8")))


def _map_client_error(e: flight.FlightError):
    """Wire errors carry {"code": N, "error": msg} JSON; re-raise the
    typed exception the HTTP client raises for the same code."""
    msg = str(e)
    start = msg.find('{"code"')
    if start >= 0:
        try:
            payload, _ = json.JSONDecoder().raw_decode(msg[start:])
        except json.JSONDecodeError:
            raise ConnectionError(msg) from None
        code, text = payload.get("code", 1000), payload.get("error", "store error")
        for exc_type, exc_code in (
            (UnknownDatabase, 3),
            (UnknownTable, 25),
            (TableAlreadyExists, 2),
        ):
            if code == exc_code:
                raise exc_type(text) from None
        raise ConnectionError(text) from None
    raise ConnectionError(msg) from None


class StoreFlightClient:
    """MetaApi/StorageApi analog over Flight — the same method surface
    as remote_store.StoreClient, so the Engine uses either
    interchangeably (store_client_provider.rs hands out exactly this
    kind of connection)."""

    def __init__(self, url: str, username: str = "root", password: str = ""):
        self.url = url
        self.con = flight.connect(url)
        self.con.authenticate(_ClientAuth(username, password))

    def _action(self, variant: str, payload: dict) -> dict:
        a = flight.Action("", json.dumps({variant: payload}).encode("utf-8"))
        try:
            results = list(self.con.do_action(a))
        except flight.FlightError as e:
            _map_client_error(e)
        if not results:
            return {}
        return json.loads(results[0].body.to_pybytes().decode("utf-8") or "{}")

    def create_database(self, db: str) -> None:
        self._action("CreateDatabase", {"plan": {"db": db}})

    def drop_database(self, db: str) -> None:
        self._action("DropDatabase", {"plan": {"db": db}})

    def create_table(self, db: str, table: str, schema_json: str) -> None:
        self._action(
            "CreateTable", {"plan": {"db": db, "table": table, "schema": schema_json}}
        )

    def drop_table(self, db: str, table: str) -> None:
        self._action("DropTable", {"plan": {"db": db, "table": table}})

    def read_plan(self, db: str, table: str) -> dict:
        return self._action("ReadPlan", {"scan_plan": {"db": db, "table": table}})

    def append_parquet(self, db: str, table: str, data: bytes) -> str:
        import pyarrow.parquet as pq

        table_data = pq.read_table(io.BytesIO(data))
        desc = flight.FlightDescriptor.for_path(db.encode(), table.encode())
        try:
            writer, meta_reader = self.con.do_put(desc, table_data.schema)
            writer.write_table(table_data)
            writer.done_writing()
            buf = meta_reader.read()
            writer.close()
        except flight.FlightError as e:
            _map_client_error(e)
        if buf is None:
            raise ConnectionError("store returned no append metadata")
        return json.loads(buf.to_pybytes().decode("utf-8"))["part"]

    def databases(self) -> dict[str, dict[str, str]]:
        return self._action("ListDatabases", {})["databases"]

    def read_partition(self, part: str):
        """Stream one partition's rows over do_get (read_partition) —
        the protocol-parity path; Spark scans part locations directly."""
        t = flight.Ticket(json.dumps({"Read": {"part": part}}).encode("utf-8"))
        return self.con.do_get(t).read_all()

    def pull_file(self, key: str) -> bytes:
        t = flight.Ticket(json.dumps({"Pull": {"key": key}}).encode("utf-8"))
        table = self.con.do_get(t).read_all()
        return b"".join(bytes(x) for x in table.column("data").to_pylist())
