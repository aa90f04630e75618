"""HTTP DataSource (Python DataSource V2).

The reference's `curl` connector (src/connector/curl.rs:155-1177) with
its paginators (src/connector/paginator/curl/{offset,cursor}.rs) and
authenticators (basic/bearer; src/connector/authenticator/) — re-built
as a first-class Spark source so HTTP APIs read like any other table:

    spark.dataSource.register(HttpDataSource)
    df = (spark.read.format("http")
          .option("url", "https://api.example.com/items?skip={{ paginator.skip }}&limit={{ paginator.limit }}")
          .option("paginator", "offset").option("limit", "100").option("count", "10000")
          .schema("id bigint, name string")
          .load())

Partition planning mirrors the reference exactly: a known total
``count`` fans pages out across executors (offset paginator,
curl/offset.rs:97-150 — parallelizable); an unknown count or a cursor
token (curl/cursor.rs — inherently sequential) runs in one partition
probing until empty.

Options: url (required; `{{ paginator.skip }}`/`{{ paginator.limit }}`
holes), method, headers (JSON), timeout_sec, retries (exponential
backoff, reference `send_with_retry` curl.rs:686), auth_basic_user/
auth_basic_password, auth_bearer_token, entry_path (RFC6901 pointer to
the record array in the response), paginator (none|offset|cursor),
limit, skip, count, cursor_path, infer (sample-fetch schema inference).
"""

from __future__ import annotations

import base64
import json
import math
import time
import urllib.error
import urllib.request
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def jwt_hs256(claims: dict, secret: str) -> str:
    """Minimal HS256 JWT signer (reference jwt authenticator,
    src/connector/authenticator/jwt.rs:79-475; HS256 path, stdlib only)."""
    import hashlib
    import hmac

    def b64url(b: bytes) -> str:
        return base64.urlsafe_b64encode(b).rstrip(b"=").decode()

    header = b64url(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    payload = b64url(json.dumps(claims, separators=(",", ":")).encode())
    signing = f"{header}.{payload}".encode()
    sig = b64url(hmac.new(secret.encode(), signing, hashlib.sha256).digest())
    return f"{header}.{payload}.{sig}"


def _build_headers(options: dict) -> dict[str, str]:
    headers = dict(json.loads(options.get("headers", "{}")))
    user = options.get("auth_basic_user")
    if user is not None:
        cred = f"{user}:{options.get('auth_basic_password', '')}"
        headers["Authorization"] = "Basic " + base64.b64encode(cred.encode()).decode()
    token = options.get("auth_bearer_token")
    if token is not None:
        headers["Authorization"] = f"Bearer {token}"
    secret = options.get("auth_jwt_secret")
    if secret is not None:
        claims = json.loads(options.get("auth_jwt_claims", "{}"))
        headers["Authorization"] = "Bearer " + jwt_hs256(claims, secret)
    return headers


def _fetch(url: str, options: dict) -> bytes:
    """One HTTP request with retry + exponential backoff."""
    retries = int(options.get("retries", "3"))
    timeout = float(options.get("timeout_sec", "30"))
    method = options.get("method", "GET").upper()
    req = urllib.request.Request(url, method=method, headers=_build_headers(options))
    delay = 0.2
    for attempt in range(retries + 1):
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.read()
        except (urllib.error.URLError, OSError):
            if attempt == retries:
                raise
            time.sleep(delay)
            delay *= 2
    raise AssertionError("unreachable")


def _entry(records, entry_path: str | None):
    """Drill into the response via an RFC6901-ish pointer."""
    node = records
    for seg in (s for s in (entry_path or "").split("/") if s):
        if seg == "*":
            continue
        node = node[int(seg)] if isinstance(node, list) else node.get(seg)
        if node is None:
            return []
    if isinstance(node, dict):
        return [node]
    return list(node or [])


def _render_url(url: str, skip: int | None, limit: int | None) -> str:
    out = url
    if skip is not None:
        out = out.replace("{{ paginator.skip }}", str(skip)).replace("{{paginator.skip}}", str(skip))
    if limit is not None:
        out = out.replace("{{ paginator.limit }}", str(limit)).replace("{{paginator.limit}}", str(limit))
    return out


def _infer_type(v):
    if isinstance(v, bool):
        return BooleanType()
    if isinstance(v, int):
        return LongType()
    if isinstance(v, float):
        return DoubleType()
    return StringType()


def _discover_count(options: dict) -> int:
    """Total-count discovery (reference counters, src/connector/counter/):
    ``count_from = "header:X-Total-Count"`` probes response headers;
    ``count_from = "body:/total"`` fetches once and reads a pointer."""
    spec = options["count_from"]
    kind, _, arg = spec.partition(":")
    url = _render_url(options["url"], int(options.get("skip", "0")), int(options.get("limit", "100")))
    req = urllib.request.Request(
        url,
        method="HEAD" if kind == "header" else "GET",
        headers=_build_headers(options),
    )
    with urllib.request.urlopen(req, timeout=float(options.get("timeout_sec", "30"))) as resp:
        if kind == "header":
            v = resp.headers.get(arg)
            if v is None:
                raise ValueError(f"count header {arg!r} absent")
            return int(v)
        return int(_entry_scalar(json.loads(resp.read()), arg))


class _PagePartition(InputPartition):
    def __init__(self, skip: int | None, limit: int | None):
        self.skip = skip
        self.limit = limit


class HttpReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.options = options

    def partitions(self):
        opts = self.options
        mode = opts.get("paginator", "none")
        count = opts.get("count")
        if mode == "offset" and count is None and "count_from" in opts:
            count = _discover_count(opts)
        if mode == "offset" and count is not None:
            limit = int(opts.get("limit", "100"))
            skip0 = int(opts.get("skip", "0"))
            pages = max(1, math.ceil((int(count) - skip0) / limit))
            return [_PagePartition(skip0 + i * limit, limit) for i in range(pages)]
        # unknown count / cursor / single fetch → one sequential partition
        return [_PagePartition(None, None)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        opts = self.options
        mode = opts.get("paginator", "none")
        fields = [f.name for f in self.schema_.fields]
        if partition.skip is not None:
            yield from self._page(partition.skip, partition.limit, fields)
        elif mode == "offset":
            # unknown count: probe until an empty page (sequential)
            limit = int(opts.get("limit", "100"))
            skip = int(opts.get("skip", "0"))
            while True:
                rows = list(self._page(skip, limit, fields))
                if not rows:
                    break
                yield from rows
                if len(rows) < limit:
                    break
                skip += limit
        elif mode == "cursor":
            yield from self._cursor_pages(fields)
        else:
            yield from self._page(None, None, fields)

    def _page(self, skip, limit, fields) -> Iterator[tuple]:
        url = _render_url(self.options["url"], skip, limit)
        body = _fetch(url, self.options)
        records = _entry(json.loads(body), self.options.get("entry_path"))
        for rec in records:
            yield tuple(rec.get(f) for f in fields)

    def _cursor_pages(self, fields) -> Iterator[tuple]:
        opts = self.options
        cursor_path = opts.get("cursor_path", "/next")
        url0 = opts["url"]
        cursor = None
        while True:
            url = url0.replace("{{ paginator.cursor }}", cursor or "").replace(
                "{{paginator.cursor}}", cursor or ""
            )
            payload = json.loads(_fetch(url, opts))
            for rec in _entry(payload, opts.get("entry_path")):
                yield tuple(rec.get(f) for f in fields)
            nxt = _entry_scalar(payload, cursor_path)
            if not nxt:
                break
            cursor = str(nxt)


def _entry_scalar(payload, pointer: str):
    node = payload
    for seg in (s for s in pointer.split("/") if s):
        if node is None:
            return None
        node = node[int(seg)] if isinstance(node, list) else node.get(seg)
    return node


def register_http_source(spark) -> None:
    """Register the source robustly: the DataSource class is shipped to
    Python workers via cloudpickle, which serializes it *by reference*
    (module path) — breaking when the application wasn't launched from
    a directory where ``chewdata_spark`` is importable.  Registering the
    module for by-value pickling makes the source self-contained."""
    try:
        from pyspark import cloudpickle
        import chewdata_spark.sources.http as _self

        cloudpickle.register_pickle_by_value(_self)
    except Exception:
        pass  # fall back to by-reference pickling (module on PYTHONPATH)
    spark.dataSource.register(HttpDataSource)


class HttpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "http"

    def schema(self):
        # sample-fetch inference (driver-side, one request) — mirrors
        # the reference guessing the document from the first fetch
        url = _render_url(
            self.options["url"],
            int(self.options.get("skip", "0")),
            int(self.options.get("limit", "100")),
        )
        body = _fetch(url, self.options)
        records = _entry(json.loads(body), self.options.get("entry_path"))
        if not records:
            return StructType([StructField("value", StringType())])
        first = records[0]
        return StructType([StructField(k, _infer_type(v), True) for k, v in first.items()])

    def reader(self, schema: StructType) -> HttpReader:
        return HttpReader(schema, dict(self.options))
