"""Round-2 parity sweep: map filter, base64 alphabets, get_env, uuid
formats, depth helpers, positional array merge, remote eraser folding,
mongo counter, JWK signing."""

from __future__ import annotations

import base64
import json

import pytest

from chewdata_spark.operators.transformer import Action, apply_actions


def _one(spark, df, pattern, field="out"):
    return apply_actions(df, [Action(field, pattern)]).collect()[0][field]


@pytest.fixture(scope="module")
def row(spark):
    return spark.createDataFrame([("hello", 5)], "s string, n int")


def test_map_filter_projects_attribute(spark):
    df = spark.createDataFrame(
        [({"a": {"b": "deep"}},)], "obj struct<a:struct<b:string>>"
    )
    assert _one(spark, df, "{{ input.obj | map(attribute='a.b') }}") == "deep"


def test_base64_alphabets(spark, row):
    raw = b"\xfb\xff~data"  # encodes with +, / and = in standard base64
    df = row.sparkSession.createDataFrame([(raw,)], "b binary")
    std = _one(spark, df, "{{ input.b | base64_encode }}")
    assert std == base64.b64encode(raw).decode()
    url = _one(spark, df, "{{ input.b | base64_encode(config='url_safe') }}")
    assert url == base64.urlsafe_b64encode(raw).decode()
    np = _one(spark, df, "{{ input.b | base64_encode(config='url_safe_no_pad') }}")
    assert np == base64.urlsafe_b64encode(raw).rstrip(b"=").decode()

    # decode roundtrip for a text payload in each alphabet
    txt = row.sparkSession.createDataFrame([("ok>then",)], "t string")
    for cfg in ("standard", "standard_no_pad", "url_safe", "url_safe_no_pad"):
        got = _one(
            spark, txt,
            f"{{{{ input.t | base64_encode(config='{cfg}') | base64_decode(config='{cfg}') }}}}",
        )
        assert got == "ok>then", cfg


def test_get_env_function(spark, row, monkeypatch):
    monkeypatch.setenv("CHEW_TEST_ENV", "from-env")
    assert _one(spark, row, "{{ get_env(name='CHEW_TEST_ENV') }}") == "from-env"
    assert _one(spark, row, "{{ get_env(name='CHEW_MISSING', default='dflt') }}") == "dflt"
    from chewdata_spark.operators.transformer import UnsupportedTemplate

    with pytest.raises(UnsupportedTemplate):
        _one(spark, row, "{{ get_env(name='CHEW_MISSING') }}")


def test_set_env_filter(spark, row):
    """set_env (filters/string.rs:145-167): stores under CHEWDATA_<name>
    in the shared env store, passes the value through unchanged."""
    from chewdata_spark.operators.transformer import UnsupportedTemplate, get_shared_env

    store = get_shared_env()
    store.pop("CHEWDATA_MY_KEY", None)
    # reference doctest: 'my_var' | set_env(name='MY_KEY') == 'my_var'
    assert _one(spark, row, "{{ 'my_var' | set_env(name='MY_KEY') }}") == "my_var"
    assert store["CHEWDATA_MY_KEY"] == "my_var"
    # get_env resolves from the shared store before the system env
    assert _one(spark, row, "{{ get_env(name='MY_KEY') }}") == "my_var"
    # chained store-then-use: get_env input is a compile-time constant
    store.pop("CHEWDATA_COPY", None)
    assert _one(spark, row, "{{ get_env(name='MY_KEY') | set_env(name='COPY') }}") == "my_var"
    assert store["CHEWDATA_COPY"] == "my_var"
    # a column-dependent value has no single process-wide store → error
    with pytest.raises(UnsupportedTemplate):
        _one(spark, row, "{{ input.s | set_env(name='MY_KEY') }}")


def test_env_resolution_order(monkeypatch):
    """env function (function/string.rs:74-116): shared store first,
    then system env (cached back into the store), then default."""
    from chewdata_spark.operators.transformer import get_shared_env, resolve_env

    store = get_shared_env()
    store.pop("CHEWDATA_ORDER_KEY", None)
    store.pop("ORDER_KEY", None)
    monkeypatch.setenv("ORDER_KEY", "system")
    assert resolve_env("ORDER_KEY") == "system"
    # cached under the prefixed key (function/string.rs:100-108)
    assert store["CHEWDATA_ORDER_KEY"] == "system"
    # the shared store now wins over the system env
    store["CHEWDATA_ORDER_KEY"] = "shared"
    assert resolve_env("ORDER_KEY") == "shared"


def test_uuid_formats(spark):
    import re

    from chewdata_spark.functions.faker import uuid_v4

    df = spark.range(1).select(
        uuid_v4().alias("h"), uuid_v4("simple").alias("s"), uuid_v4("urn").alias("u")
    )
    r = df.collect()[0]
    assert re.fullmatch(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", r.h)
    assert re.fullmatch(r"[0-9a-f]{32}", r.s)
    assert r.u.startswith("urn:uuid:") and len(r.u) == 45


def test_depth_helpers():
    from pyspark.sql.types import StructType

    from chewdata_spark.functions.objects import schema_depth, value_depth

    assert value_depth("x") == 0
    assert value_depth({"a": 1}) == 1
    assert value_depth({"a": {"b": [1]}}) == 3
    st = StructType.fromDDL("a struct<b:array<struct<c:int>>>")
    assert schema_depth(st) == 4  # struct > struct > array > struct


def test_value_merge_replace_positional():
    from chewdata_spark.functions.objects import value_merge_replace

    a = {"arr": [{"x": 1, "y": 1}, {"x": 2}], "k": "old"}
    b = {"arr": [{"y": 9}], "k": "new"}
    out = value_merge_replace(a, b)
    assert out == {"arr": [{"x": 1, "y": 9}, {"x": 2}], "k": "new"}
    assert value_merge_replace([1, 2], [7, 8, 9]) == [7, 8, 9]


def test_merge_action_positional_arrays(spark):
    """Action-level merge zips arrays of the same struct type by index
    (MergeAndReplace parity) instead of replacing wholesale."""
    df = spark.createDataFrame(
        [([{"x": 1, "y": 10}, {"x": 2, "y": 20}],)],
        "items array<struct<x:int,y:int>>",
    )
    # merge with a 1-element array of the same type: element 0 merges
    # (new y wins), element 1 survives via zip_with null-padding
    out = apply_actions(
        df,
        [Action("items", "{{ array(named_struct('x', input.items[0].x, 'y', 99)) }}", "merge")],
    )
    rows = out.collect()[0].items
    assert [(r.x, r.y) for r in rows] == [(1, 99), (2, 20)]


def test_mongo_count_command():
    from chewdata_spark.sources.mongo import mongo_count_command

    cmd = mongo_count_command({"col": "orders", "filter": {"status": "open"}})
    assert cmd == {"count": "orders", "query": {"status": "open"}}


def test_jwk_oct_and_rsa_signing():
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    from chewdata_spark.sources.http import jwk_to_signing_args, jwt_sign

    # oct → HS256 secret
    args = jwk_to_signing_args(
        {"kty": "oct", "k": base64.urlsafe_b64encode(b"topsecret").rstrip(b"=").decode()}
    )
    assert args == {"algorithm": "HS256", "secret": "topsecret"}

    # RSA private JWK (full CRT params) → PEM → valid RS256 signature
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    nums = key.private_numbers()

    def b64i(x: int, size: int | None = None) -> str:
        size = size or (x.bit_length() + 7) // 8
        return base64.urlsafe_b64encode(x.to_bytes(size, "big")).rstrip(b"=").decode()

    jwk = {
        "kty": "RSA", "alg": "RS256",
        "n": b64i(nums.public_numbers.n), "e": b64i(nums.public_numbers.e),
        "d": b64i(nums.d), "p": b64i(nums.p), "q": b64i(nums.q),
        "dp": b64i(nums.dmp1), "dq": b64i(nums.dmq1), "qi": b64i(nums.iqmp),
    }
    args = jwk_to_signing_args(jwk)
    tok = jwt_sign({"sub": "svc"}, algorithm=args["algorithm"],
                   private_key_pem=args["private_key_pem"])
    h, p, s = tok.split(".")
    pad = lambda x: x + "=" * (-len(x) % 4)
    key.public_key().verify(
        base64.urlsafe_b64decode(pad(s)), f"{h}.{p}".encode(),
        padding.PKCS1v15(), hashes.SHA256(),
    )


def test_pipeline_psql_eraser_folds_to_overwrite(spark):
    """A psql eraser marks the jdbc target so the matching writer runs
    in overwrite (truncate-and-load) mode."""
    from chewdata_spark.pipeline import Pipeline

    cfg = [
        {"type": "reader", "connector": {"type": "in_memory", "data": '[{"a": 1}]'}},
        {"type": "eraser",
         "connector": {"type": "psql", "endpoint": "psql://u:p@h:5432", "db": "d",
                       "col": "t"}},
    ]
    p = Pipeline(cfg, spark)
    p.dataframe()  # compiles; eraser key recorded
    assert "jdbc:postgresql://h:5432/d::t" in p._erased_paths


def test_pipeline_curl_eraser_deletes(spark):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from chewdata_spark.pipeline import Pipeline

    hits = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_DELETE(self):
            hits.append(self.path)
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cfg = [
            {"type": "reader", "connector": {"type": "in_memory", "data": '[{"a": 1}]'}},
            {"type": "eraser",
             "connector": {"type": "curl",
                           "endpoint": f"http://127.0.0.1:{srv.server_port}",
                           "path": "/collection"}},
        ]
        Pipeline(cfg, spark).run()
        assert hits == ["/collection"]
    finally:
        srv.shutdown()
