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
import hashlib
import json
import math
import re
import time
import urllib.error
import urllib.request
from collections.abc import Iterator

from pyspark.sql import functions as F
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


def jwt_sign(claims: dict, *, algorithm: str = "HS256", secret: str | None = None,
             private_key_pem: str | None = None) -> str:
    """JWT signer covering the reference's algorithm families
    (src/connector/authenticator/jwt.rs:79-475): HS256 (HMAC),
    RS256/RS384/RS512 (RSA-PKCS1v15) and ES256 (ECDSA P-256).
    Asymmetric algorithms need the ``cryptography`` package."""
    if algorithm == "HS256":
        if secret is None:
            raise ValueError("HS256 requires secret=")
        return jwt_hs256(claims, secret)
    if private_key_pem is None:
        raise ValueError(f"{algorithm} requires private_key_pem=")
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec, padding, utils

    def b64url(b: bytes) -> str:
        return base64.urlsafe_b64encode(b).rstrip(b"=").decode()

    header = b64url(json.dumps({"alg": algorithm, "typ": "JWT"}).encode())
    payload = b64url(json.dumps(claims, separators=(",", ":")).encode())
    signing = f"{header}.{payload}".encode()
    key = serialization.load_pem_private_key(private_key_pem.encode(), password=None)
    hash_alg = {"RS256": hashes.SHA256, "RS384": hashes.SHA384, "RS512": hashes.SHA512,
                "ES256": hashes.SHA256}[algorithm]()
    if algorithm.startswith("RS"):
        sig = key.sign(signing, padding.PKCS1v15(), hash_alg)
    else:  # ES256: DER signature → raw r||s fixed-width (JWS form)
        der = key.sign(signing, ec.ECDSA(hash_alg))
        r, s = utils.decode_dss_signature(der)
        size = (key.curve.key_size + 7) // 8
        sig = r.to_bytes(size, "big") + s.to_bytes(size, "big")
    return f"{header}.{payload}.{b64url(sig)}"


def jwk_to_signing_args(jwk: dict) -> dict:
    """JWK → signing args for :func:`jwt_sign` (reference jwt
    authenticator `jwk` field, jwt.rs:86): symmetric ``oct`` keys yield
    a secret; ``RSA``/``EC`` private JWKs convert to PEM via their
    parameters."""

    def ub64(s: str) -> bytes:
        return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))

    kty = jwk["kty"]
    if kty == "oct":
        return {"algorithm": jwk.get("alg", "HS256"), "secret": ub64(jwk["k"]).decode("latin-1")}
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import ec, rsa

    def i(name: str) -> int:
        return int.from_bytes(ub64(jwk[name]), "big")

    if kty == "RSA":
        if "d" not in jwk:
            raise ValueError("JWK signing needs a private RSA key (missing 'd')")
        pub = rsa.RSAPublicNumbers(i("e"), i("n"))
        if all(k in jwk for k in ("p", "q", "dp", "dq", "qi")):
            priv = rsa.RSAPrivateNumbers(
                i("p"), i("q"), i("d"), i("dp"), i("dq"), i("qi"), pub
            )
        else:
            p, q = rsa.rsa_recover_prime_factors(i("n"), i("e"), i("d"))
            priv = rsa.RSAPrivateNumbers(
                p, q, i("d"),
                rsa.rsa_crt_dmp1(i("d"), p), rsa.rsa_crt_dmq1(i("d"), q),
                rsa.rsa_crt_iqmp(p, q), pub,
            )
        key = priv.private_key()
        alg = jwk.get("alg", "RS256")
    elif kty == "EC":
        if "d" not in jwk:
            raise ValueError("JWK signing needs a private EC key (missing 'd')")
        curve = {"P-256": ec.SECP256R1}[jwk.get("crv", "P-256")]()
        key = ec.derive_private_key(i("d"), curve)
        alg = jwk.get("alg", "ES256")
    else:
        raise ValueError(f"unsupported JWK kty {kty!r}")
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    ).decode()
    return {"algorithm": alg, "private_key_pem": pem}


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
    pem = options.get("auth_jwt_private_key")
    if secret is not None or pem is not None:
        claims = json.loads(options.get("auth_jwt_claims", "{}"))
        alg = options.get("auth_jwt_algorithm", "HS256")
        headers["Authorization"] = "Bearer " + jwt_sign(
            claims, algorithm=alg, secret=secret, private_key_pem=pem
        )
    return headers


# per-process GET-response cache (reference `is_cached`, curl.rs:24-28,
# :1024-1046 — an HTTP-semantics cache keyed on the request).  One dict
# per executor python worker; bounded by entry count.  Entries honor
# HTTP cache semantics: `Cache-Control: no-store` is never cached,
# `max-age=N` expires after N seconds (no header → cacheable until
# evicted, matching the reference storing any 2xx GET).
_RESPONSE_CACHE: dict[str, tuple[bytes, float | None]] = {}
_RESPONSE_CACHE_MAX = 256


def _cache_key(url: str, options: dict) -> str:
    """URL + digest of the effective request headers: two connectors with
    different credentials hitting the same URL must not share entries."""
    hdrs = json.dumps(sorted(_build_headers(options).items()))
    return url + "#" + hashlib.sha256(hdrs.encode()).hexdigest()[:16]


def _cache_policy(cache_control: str | None) -> tuple[bool, float | None]:
    """(cacheable, expires_at_monotonic) from a Cache-Control header."""
    if not cache_control:
        return True, None
    cc = cache_control.lower()
    if "no-store" in cc or "no-cache" in cc:
        return False, None
    m = __import__("re").search(r"max-age=(\d+)", cc)
    if m:
        return True, time.monotonic() + int(m.group(1))
    return True, None


def _refresh_token(options: dict) -> None:
    """`refresh_connector` semantics (jwt.rs:129-210): on 401, call the
    configured token endpoint and swap the bearer token in-place."""
    refresh_url = options.get("auth_refresh_url")
    if not refresh_url:
        raise LookupError("no refresh connector configured")
    req = urllib.request.Request(
        refresh_url,
        method=options.get("auth_refresh_method", "GET").upper(),
        headers=dict(json.loads(options.get("auth_refresh_headers", "{}"))),
    )
    with urllib.request.urlopen(req, timeout=float(options.get("timeout_sec", "30"))) as resp:
        payload = json.loads(resp.read())
    token = _entry_scalar(payload, options.get("auth_refresh_token_path", "/token"))
    if not token:
        raise ValueError(f"refresh endpoint returned no token at pointer "
                         f"{options.get('auth_refresh_token_path', '/token')!r}")
    options["auth_bearer_token"] = str(token)
    # the refreshed token replaces any locally-signed JWT
    options.pop("auth_jwt_secret", None)
    options.pop("auth_jwt_private_key", None)


def _fetch(url: str, options: dict, body: bytes | None = None) -> bytes:
    """One HTTP request with retry + exponential backoff, optional
    response cache (GET), and 401 → token-refresh-and-retry."""
    retries = int(options.get("retries", "3"))
    timeout = float(options.get("timeout_sec", "30"))
    method = options.get("method", "GET").upper() if body is None else options.get(
        "method", "POST").upper()
    use_cache = str(options.get("cache", "")).lower() in ("1", "true", "yes") and method == "GET"
    cache_key = _cache_key(url, options) if use_cache else None
    if use_cache and cache_key in _RESPONSE_CACHE:
        cached, expires_at = _RESPONSE_CACHE[cache_key]
        if expires_at is None or time.monotonic() < expires_at:
            return cached
        _RESPONSE_CACHE.pop(cache_key, None)  # stale — refetch
    delay = 0.2
    refreshed = False
    for attempt in range(retries + 1):
        headers = _build_headers(options)
        if body is not None:
            headers.setdefault("Content-Type", options.get("content_type", "application/json"))
        req = urllib.request.Request(url, data=body, method=method, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                out = resp.read()
                if use_cache:
                    ok, expires_at = _cache_policy(resp.headers.get("Cache-Control"))
                    if ok:
                        if len(_RESPONSE_CACHE) >= _RESPONSE_CACHE_MAX:
                            _RESPONSE_CACHE.pop(next(iter(_RESPONSE_CACHE)))
                        # key may differ from cache_key after a 401 token
                        # refresh changed the effective headers
                        _RESPONSE_CACHE[_cache_key(url, options)] = (out, expires_at)
                return out
        except urllib.error.HTTPError as e:
            if e.code == 401 and not refreshed and options.get("auth_refresh_url"):
                refreshed = True  # one refresh per request, like the reference
                _refresh_token(options)
                continue
            if e.code < 500 or attempt == retries:
                raise  # 4xx is not transient; no point retrying
            time.sleep(delay)
            delay *= 2
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


def compile_curl_options(conn: dict, doc: dict | None = None) -> dict[str, str]:
    """Reference curl connector config (curl.rs:155-189: endpoint, path,
    method, headers, timeout, paginator, counter, authenticator, cache)
    → flat option dict for the ``http`` DataSource / ``http_send``.
    Pure function — unit-testable without a server."""
    doc = doc or {}
    opts: dict[str, str] = {
        "url": conn["endpoint"].rstrip("/") + "/" + conn["path"].lstrip("/")
    }
    if conn.get("method"):
        opts["method"] = str(conn["method"]).upper()
    if conn.get("headers"):
        opts["headers"] = json.dumps(conn["headers"])
    if conn.get("timeout"):
        opts["timeout_sec"] = str(conn["timeout"])
    if str(conn.get("cache", conn.get("is_cached", ""))).lower() in ("1", "true"):
        opts["cache"] = "true"
    pag = conn.get("paginator", conn.get("paginator_type")) or {}
    ptype = pag.get("type", "once") if isinstance(pag, dict) else str(pag)
    if ptype == "offset":
        opts["paginator"] = "offset"
        opts["limit"] = str(pag.get("limit", 100))
        opts["skip"] = str(pag.get("skip", 0))
        if pag.get("count") is not None:
            opts["count"] = str(pag["count"])
    elif ptype == "cursor":
        opts["paginator"] = "cursor"
        opts["limit"] = str(pag.get("limit", 100))
        opts["cursor_path"] = pag.get("entry_path", "/next")
    counter = conn.get("counter", conn.get("count", conn.get("counter_type")))
    if isinstance(counter, dict):
        if counter.get("type") == "header":
            opts["count_from"] = "header:" + counter.get("name", "Content-Length")
        elif counter.get("type") == "body":
            opts["count_from"] = "body:" + counter.get("entry_path", "/count")
    auth = conn.get("authenticator", conn.get("auth")) or {}
    atype = auth.get("type")
    if atype == "basic":
        opts["auth_basic_user"] = (
            auth.get("username") or auth.get("user") or auth.get("usr") or ""
        )
        opts["auth_basic_password"] = (
            auth.get("password") or auth.get("pwd") or auth.get("pass") or ""
        )
    elif atype == "bearer":
        token = auth["token"]
        if auth.get("is_base64"):
            token = base64.b64decode(token).decode()
        opts["auth_bearer_token"] = token
    elif atype == "jwt":
        if auth.get("jwk"):
            sig = jwk_to_signing_args(auth["jwk"])
            opts["auth_jwt_algorithm"] = sig["algorithm"]
            if "secret" in sig:
                opts["auth_jwt_secret"] = sig["secret"]
            else:
                opts["auth_jwt_private_key"] = sig["private_key_pem"]
        else:
            alg = str(auth.get("algorithm", auth.get("algo", "HS256"))).upper()
            opts["auth_jwt_algorithm"] = alg
            if alg.startswith("HS"):
                opts["auth_jwt_secret"] = auth["key"]
            else:
                opts["auth_jwt_private_key"] = auth["key"]
        opts["auth_jwt_claims"] = json.dumps(auth.get("payload", auth.get("claims", {})))
        refresh = auth.get("refresh_connector", auth.get("refresh"))
        if isinstance(refresh, dict):  # a nested curl connector config
            opts["auth_refresh_url"] = (
                refresh["endpoint"].rstrip("/") + "/" + refresh.get("path", "").lstrip("/")
            )
            opts["auth_refresh_token_path"] = auth.get("token_path", "/token")
    if doc.get("entry_path"):
        opts["entry_path"] = doc["entry_path"]
    for k in ("retries", "batch_size"):
        if conn.get(k) is not None:
            opts[k] = str(conn[k])
    return opts


def http_send(df, options: dict):
    """Distributed HTTP sink (reference curl `send`, curl.rs:1107;
    batched body, `send_with_retry` curl.rs:686).

    Each partition batches records into JSON arrays of ``batch_size``
    and POSTs (or ``method``) them to ``url``.  Returns a DataFrame with
    the input columns plus ``_error`` — null on 2xx, the failure message
    otherwise — so the pipeline routes failed sends to the Err channel
    exactly like the reference writer does (tests/writer.rs:87-132:
    4xx responses surface as Err records, not exceptions).

    The POST itself is the only side effect; Spark retries of a failed
    task re-send that partition's batches (at-least-once, same as the
    reference's retry loop).
    """
    import pandas as pd

    opts = dict(options)
    batch_size = int(opts.get("batch_size", "100"))
    out_fields = [f for f in df.schema.fields if f.name != "_error"]
    out_schema = StructType(out_fields + [StructField("_error", StringType(), True)])
    cols = [f.name for f in out_fields]

    def send_batches(iterator):
        for pdf in iterator:
            pdf = pdf[cols]
            errs = []
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                records = json.loads(chunk.to_json(orient="records"))
                body = json.dumps(records).encode()
                try:
                    _fetch(opts["url"], dict(opts), body=body)
                    errs.extend([None] * len(chunk))
                except Exception as e:  # noqa: BLE001 — route, don't crash
                    errs.extend([f"http send failed: {e}"] * len(chunk))
            out = pdf.copy()
            out["_error"] = pd.Series(errs, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(send_batches, schema=out_schema)


_INPUT_HOLE = re.compile(r"\{\{\s*input\.([\w.]+)\s*\}\}")


def http_fetch_per_row(df, options: dict, param_fields: list[str]):
    """Distributed correlated fetch (reference variable curl connector:
    ``set_parameters`` renders ``{{ input.* }}`` path holes per received
    context, curl.rs:842-931).

    One GET per upstream row, executed on the executors — the scale shape
    for high-cardinality parameters where driver fan-out can't work.
    Emits one output row per fetched record: ``__ctx`` (the upstream row
    as JSON, for context/steps reconstruction), ``__rec`` (the fetched
    record as JSON) and ``_error`` (fetch failures route to the Err
    channel, like the reference's fetch-error context, reader.rs:208-219).
    """
    import pandas as pd

    opts = {k: v for k, v in options.items() if k not in ("paginator", "count", "count_from")}
    url_template = opts["url"]
    entry_path = opts.get("entry_path")
    keyed = {f: f"__p_{i}" for i, f in enumerate(param_fields)}
    ctx = df.select(
        F.to_json(F.struct(*df.columns)).alias("__ctx"),
        *[F.col(f).cast("string").alias(keyed[f]) for f in param_fields],
    )

    def fetch(iterator):
        for pdf in iterator:
            out = {"__ctx": [], "__rec": [], "_error": []}
            for _, r in pdf.iterrows():
                values = {f: ("" if r[keyed[f]] is None else str(r[keyed[f]])) for f in param_fields}
                url = _INPUT_HOLE.sub(lambda m: values[m.group(1)], url_template)
                try:
                    body = _fetch(url, dict(opts))
                    for rec in _entry(json.loads(body), entry_path):
                        out["__ctx"].append(r["__ctx"])
                        out["__rec"].append(json.dumps(rec))
                        out["_error"].append(None)
                except Exception as e:  # noqa: BLE001 — route, don't crash
                    out["__ctx"].append(r["__ctx"])
                    out["__rec"].append(None)
                    out["_error"].append(f"http fetch failed: {e}")
            yield pd.DataFrame(out)

    return ctx.mapInPandas(fetch, "__ctx string, __rec string, _error string")


def http_erase(options: dict) -> None:
    """DELETE the resource (reference curl `erase`, curl.rs:1153) and
    drop any cached entries for the endpoint (":1024-1046").

    Cache scope caveat: the response cache is per python process — this
    clears the *driver's* cache only.  Executor-side worker caches expire
    via Cache-Control max-age; configs that erase-then-reread the same URL
    within one job should disable ``cache`` on the reader."""
    opts = dict(options)
    opts["method"] = opts.get("erase_method", "DELETE")
    _fetch(opts["url"], opts, body=b"")
    for k in [k for k in _RESPONSE_CACHE if k.startswith(opts["url"].split("?")[0])]:
        _RESPONSE_CACHE.pop(k, None)


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
