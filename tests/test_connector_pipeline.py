"""Connector wiring through the Pipeline config compiler: curl
(read + send + erase + refresh), psql option compile, mongodb contract,
bucket/bucket_select (file:// stand-in for s3a)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from chewdata_spark.pipeline import Pipeline
from chewdata_spark.sources.http import (
    compile_curl_options,
    http_erase,
    http_send,
    jwt_sign,
    register_http_source,
)

RECORDS = [{"id": i, "name": f"item_{i}"} for i in range(50)]


class Handler(BaseHTTPRequestHandler):
    posts: list = []
    deletes: list = []
    token_ok = {"v": "fresh-token"}

    def log_message(self, *a):
        pass

    def _json(self, status, body):
        data = json.dumps(body).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        from urllib.parse import parse_qs, urlparse

        u = urlparse(self.path)
        q = parse_qs(u.query)
        if u.path == "/token":
            self._json(200, {"token": Handler.token_ok["v"]})
            return
        if u.path == "/protected":
            if self.headers.get("Authorization") != f"Bearer {Handler.token_ok['v']}":
                self._json(401, {"error": "unauthorized"})
                return
            self._json(200, {"results": RECORDS[:5]})
            return
        if u.path.startswith("/by/"):
            i = int(u.path.rsplit("/", 1)[-1])
            self._json(200, {"results": [RECORDS[i]]})
            return
        if u.path == "/cursor":
            start = int(q.get("after", ["0"])[0] or 0)
            page = RECORDS[start : start + 20]
            nxt = str(start + 20) if start + 20 < len(RECORDS) else None
            self._json(200, {"results": page, "next": nxt})
            return
        skip = int(q.get("skip", ["0"])[0])
        limit = int(q.get("limit", ["100"])[0])
        self._json(200, {"results": RECORDS[skip : skip + limit], "total": len(RECORDS)})

    def do_POST(self):
        n = int(self.headers.get("Content-Length", "0"))
        body = json.loads(self.rfile.read(n)) if n else None
        if self.path.startswith("/status/"):
            self._json(int(self.path.rsplit("/", 1)[-1]), {"ok": False})
            return
        Handler.posts.append(body)
        self._json(200, {"ok": True, "received": len(body or [])})

    def do_DELETE(self):
        Handler.deletes.append(self.path)
        self._json(200, {"ok": True})


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


# -- option compilers (pure) -------------------------------------------------


def test_compile_curl_options_full():
    opts = compile_curl_options(
        {
            "type": "curl",
            "endpoint": "https://api.example.com",
            "path": "/items?skip={{ paginator.skip }}&limit={{ paginator.limit }}",
            "method": "get",
            "headers": {"X-App": "t"},
            "timeout": 5,
            "cache": True,
            "paginator": {"type": "offset", "limit": 25, "skip": 0, "count": 100},
            "counter": {"type": "header", "name": "X-Total-Count"},
            "authenticator": {"type": "basic", "username": "u", "password": "p"},
        },
        {"entry_path": "/results"},
    )
    assert opts["url"].startswith("https://api.example.com/items")
    assert opts["paginator"] == "offset" and opts["count"] == "100"
    assert opts["count_from"] == "header:X-Total-Count"
    assert opts["auth_basic_user"] == "u"
    assert opts["cache"] == "true" and opts["entry_path"] == "/results"


def test_compile_curl_options_cursor_and_jwt_refresh():
    opts = compile_curl_options(
        {
            "type": "curl",
            "endpoint": "https://api.example.com",
            "path": "/feed?after={{ paginator.cursor }}",
            "paginator": {"type": "cursor", "entry_path": "/next_page"},
            "authenticator": {
                "type": "jwt",
                "algorithm": "HS256",
                "key": "sekret",
                "payload": {"sub": "svc"},
                "refresh_connector": {"endpoint": "https://auth.example.com", "path": "/token"},
                "token_path": "/access_token",
            },
        }
    )
    assert opts["paginator"] == "cursor" and opts["cursor_path"] == "/next_page"
    assert opts["auth_jwt_secret"] == "sekret"
    assert opts["auth_refresh_url"] == "https://auth.example.com/token"
    assert opts["auth_refresh_token_path"] == "/access_token"


def test_compile_psql():
    from chewdata_spark.sources.jdbc import compile_psql

    kw = compile_psql(
        {
            "type": "psql",
            "endpoint": "psql://admin:pw@dbhost:5433",
            "database": "shop",
            "collection": "orders",
            "paginator": {"type": "offset", "partition_column": "id", "count": 1000, "limit": 100},
        }
    )
    assert kw["url"] == "jdbc:postgresql://dbhost:5433/shop"
    assert kw["table"] == "orders"
    assert kw["properties"]["user"] == "admin" and kw["properties"]["password"] == "pw"
    assert kw["partition_column"] == "id" and kw["num_partitions"] == 10


def test_compile_psql_partition_guards():
    """partition_column without a count, or alongside a query, must not
    emit broken partition options (round-2 advice)."""
    from chewdata_spark.sources.jdbc import compile_psql

    # no count → no bounds known → unpartitioned read, not upperBound=None
    kw = compile_psql(
        {"endpoint": "psql://u:p@h:5432", "database": "d", "collection": "t",
         "paginator": {"type": "offset", "partition_column": "id"}}
    )
    assert "partition_column" not in kw and "upper_bound" not in kw

    # query + partition_column are mutually exclusive in Spark JDBC
    kw2 = compile_psql(
        {"endpoint": "psql://u:p@h:5432", "database": "d", "collection": "t",
         "query": "SELECT * FROM t WHERE x > 0",
         "paginator": {"type": "offset", "partition_column": "id", "count": 100}}
    )
    assert "partition_column" not in kw2


def test_read_jdbc_rejects_unbounded_partitioning(spark):
    from chewdata_spark.sources.jdbc import read_jdbc

    with pytest.raises(ValueError, match="lower_bound/upper_bound"):
        read_jdbc(spark, "jdbc:postgresql://h/d", table="t", partition_column="id")
    with pytest.raises(ValueError, match="not query"):
        read_jdbc(spark, "jdbc:postgresql://h/d", query="SELECT 1", table="t",
                  partition_column="id", lower_bound=0, upper_bound=10)


def test_upsert_sql():
    from chewdata_spark.sources.jdbc import render_query, upsert_sql

    sql = upsert_sql("users", ["id", "name", "age"], ["id"])
    assert "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name" in sql
    rendered = render_query(sql, {"id": 7, "name": "a'b", "age": None})
    assert "VALUES (7, 'a''b', NULL)" in rendered


def test_mongo_contract():
    from chewdata_spark.sources.mongo import (
        mongo_connector_options,
        mongo_offset_pipelines,
        mongo_upsert_operations,
    )

    opts = mongo_connector_options(
        {
            "endpoint": "mongodb://localhost:27017",
            "db": "shop",
            "col": "orders",
            "filter": {"status": "open"},
            "find_options": {"sort": {"id": 1}, "limit": 10, "projection": {"id": 1}},
        }
    )
    assert opts["database"] == "shop" and opts["collection"] == "orders"
    stages = json.loads(opts["aggregation.pipeline"])
    assert stages[0] == {"$match": {"status": "open"}}
    assert {"$limit": 10} in stages and {"$project": {"id": 1}} in stages

    pipes = mongo_offset_pipelines(250, limit=100)
    assert pipes == [
        [{"$skip": 0}, {"$limit": 100}],
        [{"$skip": 100}, {"$limit": 100}],
        [{"$skip": 200}, {"$limit": 100}],
    ]

    ops = mongo_upsert_operations([{"id": 1, "v": "a"}], ["id"])
    assert ops[0]["filter"] == {"id": 1} and ops[0]["update"] == {"$set": {"id": 1, "v": "a"}}
    assert ops[0]["upsert"] is True


def test_mongo_cursor_batches():
    """cursor paginator contract (paginator/mongodb/cursor.rs:44-189)."""
    from chewdata_spark.sources.mongo import mongo_cursor_batches

    # cursor.rs paginate doctest: limit=1 → one page per document
    assert mongo_cursor_batches(3, limit=1) == [
        {"skip": 0, "limit": 1},
        {"skip": 1, "limit": 1},
        {"skip": 2, "limit": 1},
    ]
    # paginate_to_end doctest: default limit=100, small collection → one page
    assert mongo_cursor_batches(42) == [{"skip": 0, "limit": 100}]
    # skip reduces the COUNT only; pages restart at 0 (cursor.rs:100-140)
    assert mongo_cursor_batches(250, limit=100, skip=30) == [
        {"skip": 0, "limit": 100},
        {"skip": 100, "limit": 100},
        {"skip": 200, "limit": 100},
    ]
    # empty cursor yields no pages (no offset-style fallback page)
    assert mongo_cursor_batches(0) == []


def test_mongo_cursor_connector_options():
    """Each cursor batch becomes a mongo-spark option dict whose
    pipeline pushes the filter plus its own $skip/$limit."""
    from chewdata_spark.sources.mongo import mongo_cursor_connector_options

    conn = {
        "endpoint": "mongodb://localhost:27017",
        "db": "tests",
        "collection": "test",
        "filter": {"status": "open"},
        "paginator": {"type": "cursor", "limit": 2},
    }
    pages = mongo_cursor_connector_options(conn, 5)
    assert len(pages) == 3  # ceil(5 / 2)
    stages = [json.loads(p["aggregation.pipeline"]) for p in pages]
    assert all(s[0] == {"$match": {"status": "open"}} for s in stages)
    assert all({"$limit": 2} in s for s in stages)
    assert [st for st in stages[1] if "$skip" in st] == [{"$skip": 2}]
    assert [st for st in stages[2] if "$skip" in st] == [{"$skip": 4}]


def test_apply_find_options(spark):
    from chewdata_spark.sources.mongo import apply_find_options

    df = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "id int, v string")
    out = apply_find_options(
        df, {"sort": {"id": -1}, "skip": 1, "limit": 1, "projection": {"id": 1}}
    )
    assert [r.id for r in out.collect()] == [2]


# -- curl through the Pipeline compiler --------------------------------------


def test_pipeline_curl_reader(spark, server):
    cfg = [
        {
            "type": "reader",
            "connector": {
                "type": "curl",
                "endpoint": server,
                "path": "/items?skip={{ paginator.skip }}&limit={{ paginator.limit }}",
                "paginator": {"type": "offset", "limit": 20, "count": 50},
            },
            "document": {"entry_path": "/results", "schema": "id bigint, name string"},
        },
        {"type": "transformer", "actions": [{"field": "up", "pattern": "{{ name | upper }}"}]},
    ]
    df = Pipeline(cfg, spark).dataframe()
    rows = sorted((r.id, r.up) for r in df.collect())
    assert len(rows) == 50 and rows[3] == (3, "ITEM_3")


def test_pipeline_curl_writer_roundtrip(spark, server):
    """Reference tests/writer.rs:87-132: read local data, POST to API."""
    Handler.posts = []
    cfg = [
        {
            "type": "reader",
            "connector": {"type": "in_memory", "data": json.dumps(RECORDS[:7])},
        },
        {
            "type": "writer",
            "connector": {"type": "curl", "endpoint": server, "path": "/post", "method": "POST"},
        },
    ]
    df, writes = Pipeline(cfg, spark).run()
    sent = sum(len(b) for b in Handler.posts)
    assert sent == 7
    assert writes[0].fmt == "http"
    assert all(r["_error"] is None for r in df.select("_error").collect())


def test_pipeline_curl_writer_4xx_routes_to_err(spark, server):
    """4xx responses surface as Err records, not exceptions
    (tests/writer.rs it_should_read_data_call_api_4xx)."""
    cfg = [
        {
            "type": "reader",
            "connector": {"type": "in_memory", "data": json.dumps(RECORDS[:3])},
        },
        {
            "type": "writer",
            "connector": {
                "type": "curl",
                "endpoint": server,
                "path": "/status/400",
                "method": "POST",
                "retries": 0,
            },
        },
    ]
    df, writes = Pipeline(cfg, spark).run()
    errs = [r["_error"] for r in df.select("_error").collect()]
    assert len(errs) == 3 and all(e and "400" in e for e in errs)


def test_pipeline_curl_writer_dry_run_sends_nothing(spark, server):
    """Pipeline.dataframe() (execute=False) must not embed the send
    transform: actions on the preview DataFrame fire no POSTs
    (round-2 advice)."""
    Handler.posts = []
    cfg = [
        {"type": "reader",
         "connector": {"type": "in_memory", "data": json.dumps(RECORDS[:5])}},
        {"type": "writer",
         "connector": {"type": "curl", "endpoint": server, "path": "/post", "method": "POST"}},
    ]
    df = Pipeline(cfg, spark).dataframe()
    assert df.count() == 5          # action on the preview
    df.collect()                    # and another one
    assert Handler.posts == []      # zero HTTP traffic
    assert "_error" in df.columns   # schema matches the execute path


def test_http_send_batching(spark, server):
    Handler.posts = []
    df = spark.createDataFrame([(i, f"n{i}") for i in range(10)], "id int, name string")
    out = http_send(df.coalesce(1), {"url": f"{server}/post", "batch_size": 4})
    assert out.filter("_error is null").count() == 10
    assert sorted(len(b) for b in Handler.posts) == [2, 4, 4]


def test_http_erase(server):
    Handler.deletes = []
    http_erase({"url": f"{server}/anything/42"})
    assert Handler.deletes == ["/anything/42"]


def test_jwt_refresh_on_401(spark, server):
    """Expired token → 401 → refresh connector fetches a new one →
    request retried (jwt.rs refresh_connector semantics)."""
    register_http_source(spark)
    df = (
        spark.read.format("http")
        .option("url", f"{server}/protected")
        .option("auth_bearer_token", "stale-token")
        .option("auth_refresh_url", f"{server}/token")
        .option("auth_refresh_token_path", "/token")
        .option("entry_path", "/results")
        .schema("id bigint, name string")
        .load()
    )
    assert df.count() == 5


def test_jwt_rs256_roundtrip():
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    ).decode()
    tok = jwt_sign({"sub": "svc"}, algorithm="RS256", private_key_pem=pem)
    h, p, s = tok.split(".")
    import base64

    pad = lambda x: x + "=" * (-len(x) % 4)
    assert json.loads(base64.urlsafe_b64decode(pad(h)))["alg"] == "RS256"
    key.public_key().verify(
        base64.urlsafe_b64decode(pad(s)), f"{h}.{p}".encode(),
        padding.PKCS1v15(), hashes.SHA256(),
    )


def test_response_cache(server):
    from chewdata_spark.sources import http as H

    H._RESPONSE_CACHE.clear()
    url = f"{server}/items?skip=0&limit=3"
    a = H._fetch(url, {"cache": "true"})
    b = H._fetch(url, {"cache": "true"})
    assert a == b and H._cache_key(url, {"cache": "true"}) in H._RESPONSE_CACHE


def test_response_cache_keyed_on_auth(server):
    """Two connectors with different credentials hitting the same URL
    must not share cache entries (round-2 advice)."""
    from chewdata_spark.sources import http as H

    H._RESPONSE_CACHE.clear()
    url = f"{server}/items?skip=0&limit=3"
    H._fetch(url, {"cache": "true", "auth_bearer_token": "alice"})
    H._fetch(url, {"cache": "true", "auth_bearer_token": "bob"})
    assert len(H._RESPONSE_CACHE) == 2  # one entry per credential set


# -- bucket (file:// stand-in for s3a) ---------------------------------------


def test_bucket_url_and_conf():
    from chewdata_spark.sources.bucket import bucket_hadoop_conf, bucket_url

    assert bucket_url({"bucket": "my-bucket", "path": "/data/in.parquet"}) == (
        "s3a://my-bucket/data/in.parquet"
    )
    conf = bucket_hadoop_conf(
        {
            "endpoint": "http://minio:9000",
            "region": "us-east-1",
            "access_key_id": "AK",
            "secret_access_key": "SK",
        }
    )
    assert conf["fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["fs.s3a.path.style.access"] == "true"
    assert conf["fs.s3a.access.key"] == "AK" and conf["fs.s3a.secret.key"] == "SK"
    # naming the bucket scopes every option per-bucket (s3a overrides),
    # so two buckets with different endpoints/creds coexist
    scoped = bucket_hadoop_conf(
        {"bucket": "my-bkt", "endpoint": "http://minio:9000", "access_key_id": "AK",
         "secret_access_key": "SK"}
    )
    assert scoped["fs.s3a.bucket.my-bkt.endpoint"] == "http://minio:9000"
    assert scoped["fs.s3a.bucket.my-bkt.access.key"] == "AK"


@pytest.fixture()
def bucket_dir(tmp_path, spark):
    d = tmp_path / "bkt"
    d.mkdir()
    for i in range(5):
        (d / f"part_{i}.jsonl").write_text(
            "\n".join(json.dumps({"id": i * 10 + j, "f": i}) for j in range(3))
        )
    return d


def test_list_bucket_keys_skip_limit(spark, bucket_dir):
    from chewdata_spark.sources.bucket import list_bucket_keys

    url = f"file://{bucket_dir}/part_*.jsonl"
    keys = list_bucket_keys(spark, url)
    assert len(keys) == 5 and keys == sorted(keys)
    assert len(list_bucket_keys(spark, url, skip=2)) == 3
    assert len(list_bucket_keys(spark, url, skip=1, limit=2)) == 2


def test_read_bucket_with_limit(spark, bucket_dir):
    from chewdata_spark.sources.bucket import read_bucket

    df = read_bucket(
        spark,
        {"bucket": str(bucket_dir), "path": "part_*.jsonl", "scheme": "file",
         "skip": 1, "limit": 2},
        {"type": "jsonl"},
    )
    assert df.count() == 6  # files 1..2, 3 records each


def test_bucket_select_pushdown(spark, bucket_dir):
    """bucket_select ≡ read + SQL; the WHERE must reach the scan."""
    from chewdata_spark.sources.bucket import read_bucket_select

    pq = bucket_dir / "sel"
    spark.range(100).selectExpr("id", "id % 7 as grp").write.parquet(f"file://{pq}")
    df = read_bucket_select(
        spark,
        {"bucket": str(bucket_dir), "path": "sel", "scheme": "file",
         "query": "SELECT id FROM s3object WHERE grp = 3"},
        {"type": "parquet"},
    )
    assert df.columns == ["id"]
    assert df.count() == 15 or df.count() == 14  # 100/7 rounding
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "grp" in plan  # predicate reached the scan


def test_pipeline_bucket_reader(spark, bucket_dir):
    cfg = [
        {
            "type": "reader",
            "connector": {
                "type": "bucket",
                "bucket": str(bucket_dir),
                "scheme": "file",
                "path": "part_*.jsonl",
            },
            "document": {"type": "jsonl"},
        },
        {"type": "transformer", "actions": [{"field": "dbl", "pattern": "{{ input.id * 2 }}"}]},
    ]
    df = Pipeline(cfg, spark).dataframe()
    assert df.count() == 15
    assert df.filter("dbl = id * 2").count() == 15


def test_pipeline_bucket_writer(spark, tmp_path):
    out = tmp_path / "outbkt"
    cfg = [
        {
            "type": "reader",
            "connector": {"type": "in_memory", "data": json.dumps(RECORDS[:4])},
        },
        {
            "type": "writer",
            "connector": {"type": "bucket", "bucket": str(out),
                          "scheme": "file", "path": "dump"},
            "document": {"type": "parquet"},
        },
    ]
    Pipeline(cfg, spark).run()
    back = spark.read.parquet(f"file://{out}/dump")
    assert back.count() == 4


def test_cache_policy_semantics():
    from chewdata_spark.sources.http import _cache_policy

    assert _cache_policy(None) == (True, None)
    assert _cache_policy("no-store")[0] is False
    assert _cache_policy("no-cache, private")[0] is False
    ok, exp = _cache_policy("max-age=60")
    assert ok and exp is not None
    ok0, exp0 = _cache_policy("max-age=0")
    import time as _t

    assert ok0 and exp0 is not None and exp0 <= _t.monotonic() + 0.01


def test_response_cache_expiry(server):
    """max-age=0 responses are stored but immediately stale → refetch."""
    from chewdata_spark.sources import http as H

    H._RESPONSE_CACHE.clear()
    url = f"{server}/items?skip=0&limit=2"
    a = H._fetch(url, {"cache": "true"})
    # simulate a stale entry
    H._RESPONSE_CACHE[H._cache_key(url, {"cache": "true"})] = (b"stale-bytes", 0.0)
    b = H._fetch(url, {"cache": "true"})
    assert b == a and b != b"stale-bytes"


def test_pipeline_bucket_select_config(spark, tmp_path):
    """bucket_select through the config compiler: SQL over s3object
    with projection/filter pushed into the scan."""
    pq = tmp_path / "bsel"
    spark.range(50).selectExpr("id", "id % 5 AS g").write.parquet(f"file://{pq}")
    cfg = [
        {
            "type": "reader",
            "connector": {
                "type": "bucket_select",
                "bucket": str(tmp_path),
                "scheme": "file",
                "path": "bsel",
                "query": "SELECT id FROM s3object WHERE g = 2",
            },
            "document": {"type": "parquet"},
        },
    ]
    df = Pipeline(cfg, spark).dataframe()
    assert df.columns == ["id"] and df.count() == 10


def test_pipeline_parameterized_curl_fanout(spark, server):
    """A curl reader whose path references upstream record fields
    (reference set_parameters, src/step/reader.rs:137 + curl.rs:842-931):
    small parameter cardinality → one read per distinct tuple, joined back."""
    cfg = [
        {"type": "reader",
         "connector": {"type": "in_memory",
                       "data": '[{"idx": 3}, {"idx": 7}, {"idx": 3}]'}},
        {"type": "reader",
         "connector": {"type": "curl", "endpoint": server, "path": "/by/{{ input.idx }}"},
         "document": {"entry_path": "/results"}},
    ]
    df = Pipeline(cfg, spark).dataframe()
    names = sorted(r.name for r in df.select("name").collect())
    # idx 3 appears twice upstream → item_3 fetched/emitted per context
    assert names == ["item_3", "item_3", "item_7"]


def test_pipeline_parameterized_curl_per_row(spark, server):
    """High parameter cardinality + explicit document schema → the
    distributed per-row fetch (one GET per upstream row on executors)."""
    cfg = [
        {"type": "reader",
         "connector": {"type": "in_memory",
                       "data": json.dumps([{"idx": i} for i in range(6)])}},
        {"type": "reader",
         "parameter_fanout_limit": 2,  # force the distributed path
         "connector": {"type": "curl", "endpoint": server, "path": "/by/{{ input.idx }}"},
         "document": {"entry_path": "/results", "schema": "id bigint, name string"}},
    ]
    df = Pipeline(cfg, spark).dataframe()
    rows = df.collect()
    assert sorted(r.name for r in rows) == [f"item_{i}" for i in range(6)]
    assert all(r._error is None for r in rows)


def test_pipeline_parameterized_curl_per_row_fetch_error(spark):
    """Per-row fetch failures route to the Err channel (reference
    fetch-error context, reader.rs:208-219), they don't crash the job."""
    cfg = [
        {"type": "reader",
         "connector": {"type": "in_memory", "data": '[{"idx": 1}, {"idx": 2}, {"idx": 3}]'}},
        {"type": "reader",
         "parameter_fanout_limit": 1,
         "connector": {"type": "curl", "endpoint": "http://127.0.0.1:9",  # unreachable
                       "path": "/by/{{ input.idx }}", "retries": 0, "timeout": 1},
         "document": {"entry_path": "/results", "schema": "id bigint, name string"}},
    ]
    df = Pipeline(cfg, spark).dataframe()
    rows = df.collect()
    assert len(rows) == 3
    assert all(r._error and "http fetch failed" in r._error for r in rows)
    assert all(r.id is None for r in rows)


def test_render_input_holes_psql_sql_literal():
    """psql query holes render as escaped SQL literals, path holes as text."""
    from chewdata_spark.pipeline import _render_input_holes

    conn = {"type": "psql", "query": "SELECT * FROM t WHERE name = {{ input.name }}",
            "collection": "t_{{ input.name }}"}
    out = _render_input_holes(conn, {"name": "a'b"}, "psql")
    assert out["query"] == "SELECT * FROM t WHERE name = 'a''b'"
    assert out["collection"] == "t_a'b"  # only query gets SQL quoting


def test_pipeline_parameterized_fanout_limit_raises(spark, server):
    cfg = [
        {"type": "reader",
         "connector": {"type": "in_memory",
                       "data": json.dumps([{"idx": i} for i in range(5)])}},
        {"type": "reader",
         "parameter_fanout_limit": 2,
         "connector": {"type": "curl", "endpoint": server, "path": "/by/{{ input.idx }}"},
         "document": {"entry_path": "/results"}},  # no schema → no per-row path
    ]
    with pytest.raises(ValueError, match="distinct parameter"):
        Pipeline(cfg, spark).dataframe()


def test_pipeline_curl_cursor_config(spark, server):
    """Cursor pagination configured reference-style (paginator type
    cursor + entry_path for the next token)."""
    cfg = [
        {
            "type": "reader",
            "connector": {
                "type": "curl",
                "endpoint": server,
                "path": "/cursor?after={{ paginator.cursor }}",
                "paginator": {"type": "cursor", "entry_path": "/next"},
            },
            "document": {"entry_path": "/results", "schema": "id bigint, name string"},
        },
    ]
    # extend the handler: /cursor pages through RECORDS
    df = Pipeline(cfg, spark).dataframe()
    assert df.count() == len(RECORDS)
