"""HTTP DataSource against a local test server (offset/cursor/auth/retry)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from chewdata_spark.sources.http import register_http_source

RECORDS = [{"id": i, "name": f"item_{i}", "price": i * 1.5} for i in range(100)]


class Handler(BaseHTTPRequestHandler):
    fail_next = {"n": 0}

    def log_message(self, *a):
        pass

    def do_GET(self):
        if Handler.fail_next["n"] > 0:
            Handler.fail_next["n"] -= 1
            self.send_response(500)
            self.end_headers()
            return
        u = urlparse(self.path)
        q = parse_qs(u.query)
        if u.path == "/auth":
            if self.headers.get("Authorization") != "Bearer sekret":
                self.send_response(401)
                self.end_headers()
                return
            body = {"results": RECORDS[:3]}
        elif u.path == "/cursor":
            start = int(q.get("after", ["0"])[0])
            page = RECORDS[start : start + 40]
            body = {"results": page, "next": str(start + 40) if start + 40 < len(RECORDS) else None}
        else:  # /items?skip=&limit=
            skip = int(q.get("skip", ["0"])[0])
            limit = int(q.get("limit", ["100"])[0])
            body = {"results": RECORDS[skip : skip + limit], "total": len(RECORDS)}
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("X-Total-Count", str(len(RECORDS)))
        self.end_headers()
        self.wfile.write(data)

    def do_HEAD(self):
        self.send_response(200)
        self.send_header("X-Total-Count", str(len(RECORDS)))
        self.end_headers()


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    register_http_source(spark)


def test_offset_pagination_parallel(spark, server):
    df = (
        spark.read.format("http")
        .option("url", f"{server}/items?skip={{{{ paginator.skip }}}}&limit={{{{ paginator.limit }}}}")
        .option("paginator", "offset")
        .option("limit", "25")
        .option("count", "100")
        .option("entry_path", "/results")
        .schema("id bigint, name string, price double")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # known count → parallel page fan-out
    rows = sorted((r.id, r.name, r.price) for r in df.collect())
    assert len(rows) == 100 and rows[7] == (7, "item_7", 10.5)


def test_offset_pagination_unknown_count_probes(spark, server):
    df = (
        spark.read.format("http")
        .option("url", f"{server}/items?skip={{{{ paginator.skip }}}}&limit={{{{ paginator.limit }}}}")
        .option("paginator", "offset")
        .option("limit", "30")
        .option("entry_path", "/results")
        .schema("id bigint, name string")
        .load()
    )
    assert df.count() == 100


def test_cursor_pagination_sequential(spark, server):
    df = (
        spark.read.format("http")
        .option("url", f"{server}/cursor?after={{{{ paginator.cursor }}}}")
        .option("paginator", "cursor")
        .option("cursor_path", "/next")
        .option("entry_path", "/results")
        .schema("id bigint, name string")
        .load()
    )
    assert df.count() == 100


def test_bearer_auth_and_schema_inference(spark, server):
    df = (
        spark.read.format("http")
        .option("url", f"{server}/auth")
        .option("auth_bearer_token", "sekret")
        .option("entry_path", "/results")
        .load()  # no schema → sample-fetch inference
    )
    assert [f.name for f in df.schema.fields] == ["id", "name", "price"]
    assert df.count() == 3


def test_auth_failure_raises(spark, server):
    with pytest.raises(Exception):
        (
            spark.read.format("http")
            .option("url", f"{server}/auth")
            .option("auth_bearer_token", "wrong")
            .option("retries", "0")
            .schema("id bigint")
            .load()
            .collect()
        )


def test_retry_recovers_from_transient_errors(spark, server):
    Handler.fail_next["n"] = 2
    df = (
        spark.read.format("http")
        .option("url", f"{server}/items")
        .option("entry_path", "/results")
        .option("retries", "4")
        .schema("id bigint, name string")
        .load()
    )
    assert df.count() == 100


def test_count_discovery_from_body(spark, server):
    """Reference body counter (counter/curl/body.rs): total from a field
    enables the parallel page fan-out without an explicit count."""
    df = (
        spark.read.format("http")
        .option("url", f"{server}/items?skip={{{{ paginator.skip }}}}&limit={{{{ paginator.limit }}}}")
        .option("paginator", "offset")
        .option("limit", "30")
        .option("count_from", "body:/total")
        .option("entry_path", "/results")
        .schema("id bigint")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # ceil(100/30)
    assert df.count() == 100


def test_count_discovery_from_header(spark, server):
    """Reference header counter (counter/curl/header.rs): HEAD probe."""
    df = (
        spark.read.format("http")
        .option("url", f"{server}/items?skip={{{{ paginator.skip }}}}&limit={{{{ paginator.limit }}}}")
        .option("paginator", "offset")
        .option("limit", "25")
        .option("count_from", "header:X-Total-Count")
        .option("entry_path", "/results")
        .schema("id bigint")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100


def test_jwt_hs256_header():
    import base64 as b64
    import hashlib
    import hmac
    import json as J

    from chewdata_spark.sources.http import jwt_hs256

    tok = jwt_hs256({"sub": "svc", "scope": "read"}, "topsecret")
    h, p, s = tok.split(".")
    pad = lambda x: x + "=" * (-len(x) % 4)
    assert J.loads(b64.urlsafe_b64decode(pad(h))) == {"alg": "HS256", "typ": "JWT"}
    assert J.loads(b64.urlsafe_b64decode(pad(p)))["sub"] == "svc"
    expect = hmac.new(b"topsecret", f"{h}.{p}".encode(), hashlib.sha256).digest()
    assert b64.urlsafe_b64decode(pad(s)) == expect
