"""Transformer step: ordered field actions compiled to Column expressions.

Reference semantics (src/step/transformer.rs:98-253, src/updater/tera.rs:100-227):
each action renders a Tera template against ``{input, output, context}``
and merges / replaces / removes the result at a JSON-pointer field path.
The rendered string is re-parsed to a typed value (``Value::resolve``).

Spark-first design: instead of rendering strings per record through a
mutex-serialized template engine (the reference's bottleneck,
src/updater/tera.rs:110-111), we *compile* the template subset to native
Column expressions that run inside whole-stage codegen.  ``{{ ... }}``
holes referencing ``input.<field>`` become column refs; Tera filters map
to built-in SQL functions; multi-hole templates become ``concat``.
Anything outside the supported subset raises — callers can fall back to
a pandas_udf renderer (slow path, Arrow-batched).

At 100 TB this matters: a compiled action list is a narrow projection —
no shuffle, no Python, fully pipelined with the surrounding scan.
"""

from __future__ import annotations

import re
import weakref
from dataclasses import dataclass
from typing import Literal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOLE = re.compile(r"\{\{(.+?)\}\}")

# Tera filter name -> SQL template. {0} is the input expression; named args fill the rest.
_FILTERS: dict[str, str] = {
    "upper": "upper({0})",
    "lower": "lower({0})",
    "trim": "trim({0})",
    "trim_start": "ltrim({0})",
    "trim_end": "rtrim({0})",
    "length": "length({0})",
    "capitalize": "concat(upper(substring({0},1,1)), lower(substring({0},2)))",
    "title": "initcap({0})",
    "abs": "abs({0})",
    "round": "round({0}, {precision})",
    "default": "coalesce({0}, {value})",
    "date": "date_format(try_cast({0} as timestamp), {format})",
    "split": "split({0}, {pat})",
    "join": "array_join({0}, {sep})",
    "first": "element_at({0}, 1)",
    "last": "element_at({0}, -1)",
    "reverse": "reverse({0})",
    "urlencode": "url_encode({0})",
    "json_encode": "to_json({0})",
    "base64_encode": "base64({0})",
    "base64_decode": "cast(unbase64({0}) as string)",
    # try_cast: malformed values become NULL instead of throwing under
    # ANSI mode — the closest vectorized analogue of the reference's
    # render-error → Err record (full _error routing is a later step)
    "int": "try_cast({0} as bigint)",
    "float": "try_cast({0} as double)",
    "replace": "replace({0}, {from}, {to})",
    "truncate": "substring({0}, 1, {length})",
    "slugify": "regexp_replace(regexp_replace(lower({0}), '[^a-z0-9]+', '-'), '(^-+|-+$)', '')",
    "striptags": "regexp_replace({0}, '<[^>]*>', '')",
    "wordcount": "size(split(trim({0}), '\\\\s+'))",
}

_FILTER_DEFAULTS: dict[str, dict[str, str]] = {
    "round": {"precision": "0", "method": "'common'"},
    "date": {"format": "'yyyy-MM-dd'"},
    "split": {"pat": "' '"},
    "join": {"sep": "''"},
    "truncate": {"length": "255"},
}

# Tera strftime-ish tokens -> Spark datetime pattern tokens.
_DATE_TOKENS = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm", "%S": "ss",
    "%y": "yy", "%B": "MMMM", "%b": "MMM", "%A": "EEEE", "%a": "EEE",
}


class UnsupportedTemplate(ValueError):
    """Raised when a pattern falls outside the compilable subset."""


# Object filters with exact reference value semantics (object.rs:141-552).
# They operate on the JSON encoding of the value through Arrow-batched
# UDFs (chew_*) — the documented slow path; keys/values/search stay
# native SQL.  A chain like `x | replace_key(...) | update(...)` keeps
# the JSON-text state between steps, so to_json wraps only once.
_JSON_VALUE_FILTERS = ("update", "extract", "replace_key", "replace_value", "merge")
# WeakSet, not id()s: a stopped session's id can be reused by a new
# SparkSession, which would silently skip re-registration
_registered_udf_sessions: weakref.WeakSet = weakref.WeakSet()

# Shared environment store (filters/string.rs:8-13): the reference keeps a
# process-wide map seeded by `set_env` and read by `env`, deliberately
# separate from the system environment "to avoid side effects with multi
# threading".  Compilation happens on the driver, so a plain dict is the
# faithful analogue; keys written by set_env get the CHEWDATA_ prefix
# (string.rs:159-165).
_ENV_PREFIX = "CHEWDATA_"
_shared_env: dict[str, str] = {}


def get_shared_env() -> dict[str, str]:
    """The driver-side shared env store (filters/string.rs:11-13)."""
    return _shared_env


def resolve_env(name: str, default: str | None = None) -> str:
    """Reference `env` function resolution order
    (function/string.rs:74-116): shared store (prefixed key, then bare),
    then system env (prefixed, then bare — cached back into the store),
    then the default, else an error.
    """
    import os as _os

    prefixed = _ENV_PREFIX + name
    for key in (prefixed, name):
        if key in _shared_env:
            return _shared_env[key]
    for key in (prefixed, name):
        val = _os.environ.get(key)
        if val is not None:
            _shared_env[prefixed] = val
            return val
    if default is not None:
        return default
    raise UnsupportedTemplate(f"environment variable {name!r} not found")


def _object_udf_body(fname: str):
    import json as _j

    from chewdata_spark.functions import objects as O

    def f(js: str | None, args_json: str) -> str | None:
        if js is None:
            return None
        v = _j.loads(js)
        a = _j.loads(args_json)
        try:
            if fname == "update":
                out = O.value_update(v, a)
            elif fname == "extract":
                attrs = a.get("attributes")
                if attrs is None:
                    attrs = [a["attribute"]] if "attribute" in a else []
                out = O.value_extract(v, attrs)
            elif fname == "replace_key":
                out = O.value_replace_key(v, str(a.get("from", "")), str(a.get("to", "")))
            elif fname == "replace_value":
                out = O.value_replace_value(v, str(a.get("from", "")), str(a.get("to", "")))
            else:  # merge
                w = a.get("with")
                if isinstance(w, str):
                    try:
                        w = _j.loads(w)
                    except Exception:
                        pass
                out = O.value_merge(v, w, a.get("attribute"))
        except Exception:
            return None  # render failure → NULL → Err-channel routing
        return _j.dumps(out, ensure_ascii=False)

    return f


def _chew_tojson(x) -> str | None:
    """Type-agnostic JSON encoding for the object-filter pipeline:
    structs/maps/arrays encode naturally, a STRING that already holds
    JSON text passes through re-encoded (the reference's
    ``Value::resolve`` re-typing — a rendered `'{"a":1}'` behaves as an
    object), scalars encode as JSON scalars.  Native ``to_json`` can't
    do this: it rejects string inputs at analysis time."""
    import json as _j

    def conv(v):
        if hasattr(v, "asDict"):
            v = v.asDict()
        if isinstance(v, dict):
            return {k: conv(u) for k, u in v.items()}
        if isinstance(v, (list, tuple)):
            return [conv(u) for u in v]
        if isinstance(v, bytes):
            return v.decode("utf-8", "replace")
        return v

    if x is None:
        return None
    if isinstance(x, str):
        s = x.strip()
        if s[:1] in "[{":
            try:
                return _j.dumps(_j.loads(s), ensure_ascii=False)
            except ValueError:
                pass
        return _j.dumps(x, ensure_ascii=False)
    return _j.dumps(conv(x), ensure_ascii=False, default=str)


def _chew_merge_col(js: str | None, args_json: str, with_text: str | None) -> str | None:
    """merge where `with` is a COLUMN value (tests/transformer.rs:195-255:
    ``{{ output.a | merge(with=output.b) }}``)."""
    import json as _j

    from chewdata_spark.functions import objects as O

    if js is None:
        return None
    v = _j.loads(js)
    a = _j.loads(args_json)
    w = None
    if with_text is not None:
        try:
            w = _j.loads(with_text)
        except ValueError:
            w = with_text
    try:
        out = O.value_merge(v, w, a.get("attribute"))
    except Exception:
        return None
    return _j.dumps(out, ensure_ascii=False)


def _chew_values(js: str | None) -> str | None:
    """Typed `values` filter (object.rs:527-537): object → JSON array of
    its values with types preserved; array/scalar pass through."""
    import json as _j

    from chewdata_spark.functions import objects as O

    if js is None:
        return None
    try:
        out = O.value_values(_j.loads(js))
    except Exception:
        return None
    return _j.dumps(out, ensure_ascii=False)


def ensure_object_udfs(spark=None) -> None:
    """Register the chew_* JSON-value UDFs once per session."""
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.active()
    if spark in _registered_udf_sessions:
        return
    for name in _JSON_VALUE_FILTERS:
        spark.udf.register(
            f"chew_{name}", F.udf(_object_udf_body(name), "string", useArrow=True)
        )
    spark.udf.register("chew_tojson", F.udf(_chew_tojson, "string", useArrow=True))
    spark.udf.register("chew_merge_col", F.udf(_chew_merge_col, "string", useArrow=True))
    spark.udf.register("chew_values", F.udf(_chew_values, "string", useArrow=True))
    _registered_udf_sessions.add(spark)


def _parse_literal(v: str):
    """Parse a Tera filter-arg literal: 'str', 42, true, ['a','b'], {...}."""
    import ast
    import json as _j

    v = v.strip()
    try:
        return ast.literal_eval(v)
    except Exception:
        pass
    try:
        return _j.loads(v)
    except Exception:
        return v


def _pointer_to_json_path(pointer: str) -> str:
    segs = [s for s in re.split(r"[/.]", str(pointer)) if s]
    return "$" + "".join(f"[{s}]" if s.isdigit() else f".{s}" for s in segs)


_IF_BLOCK = re.compile(
    r"^\s*\{%\s*if\s+(?P<cond>.+?)\s*%\}(?P<then>.*?)"
    r"(?P<elifs>(?:\{%\s*elif\s+.+?\s*%\}.*?)*)"
    r"(?:\{%\s*else\s*%\}(?P<els>.*?))?\{%\s*endif\s*%\}\s*$",
    re.S,
)
_ELIF = re.compile(r"\{%\s*elif\s+(.+?)\s*%\}(.*?)(?=\{%\s*elif|\Z)", re.S)


def _compile_condition(src: str, input_col: str | None = None) -> Column:
    """Compile a Tera boolean expression to a Column.

    Supports comparisons/arithmetic/and/or/not plus the Tera tests the
    reference exercises: ``X is matching('re')`` → rlike, ``X is
    defined``/``is undefined`` → null checks.
    """
    s = src
    s = re.sub(r"\binput\.", f"{input_col}." if input_col else "", s)
    s = re.sub(r"\boutput\.", "", s)
    s = re.sub(r"\bcontext\.steps\.", "_steps.", s)
    s = re.sub(r"\bsteps\.", "_steps.", s)
    s = re.sub(
        r"([\w.\"']+)\s+is\s+not\s+matching\s*\(\s*('(?:[^'\\]|\\.)*')\s*\)",
        r"NOT (\1 rlike \2)",
        s,
    )
    s = re.sub(
        r"([\w.\"']+)\s+is\s+matching\s*\(\s*('(?:[^'\\]|\\.)*')\s*\)",
        r"(\1 rlike \2)",
        s,
    )
    s = re.sub(r"([\w.]+)\s+is\s+defined", r"(\1 IS NOT NULL)", s)
    s = re.sub(r"([\w.]+)\s+is\s+undefined", r"(\1 IS NULL)", s)
    return F.expr(s).cast("boolean")


def _compile_if_block(
    pattern: str, input_col: str | None = None, *, strip_bodies: bool = False
) -> Column:
    """``{% if c %}A{% elif c2 %}B{% else %}C{% endif %}`` → when-chain.

    Branch bodies are themselves templates (text / ``{{ ... }}`` holes);
    single level only — nested blocks raise UnsupportedTemplate.
    ``strip_bodies`` trims branch whitespace (Tera ``{%- -%}`` markers).
    """
    m = _IF_BLOCK.match(pattern)
    if not m:
        raise UnsupportedTemplate(f"cannot parse conditional template {pattern!r}")
    trim = (lambda s: s.strip()) if strip_bodies else (lambda s: s)
    branches: list[tuple[Column, str]] = [
        (_compile_condition(m.group("cond"), input_col), trim(m.group("then")))
    ]
    for cond, body in _ELIF.findall(m.group("elifs") or ""):
        branches.append((_compile_condition(cond, input_col), trim(body)))
    if any("{%" in body for _, body in branches):
        raise UnsupportedTemplate("nested {% %} blocks are not compilable")
    out = None
    for cond, body in branches:
        # a throw() branch renders no value — NULL here; the message
        # lands in _error via compile_throw_error
        if _THROW.match(body):
            col = F.lit(None).cast("string")
        else:
            col = template_to_column(body, input_col=input_col)
        out = F.when(cond, col) if out is None else out.when(cond, col)
    els = m.group("els")
    if els is not None:
        if "{%" in els:
            raise UnsupportedTemplate("nested {% %} blocks are not compilable")
        if _THROW.match(els):
            out = out.otherwise(F.lit(None).cast("string"))
        else:
            out = out.otherwise(template_to_column(trim(els), input_col=input_col))
    return out


_THROW = re.compile(r"^\s*\{\{\s*throw\(\s*message\s*=\s*'([^']*)'\s*\)\s*\}\}\s*$")


def compile_throw_error(pattern: str | None, input_col: str | None = None) -> Column | None:
    """Error column for Tera's ``throw(message=...)`` built-in: rendering
    throw fails the record (reference: a failed render emits
    ``DataResult::Err``, src/step/transformer.rs:238-249; the
    examples/local-chaine.rs cascade routes those rows to the err
    writer).  Returns NULL for rows whose branch does not throw, the
    message for rows whose branch does, or ``None`` when the pattern
    contains no throw at all."""
    if not pattern or "throw(" not in pattern:
        return None
    m = _THROW.match(pattern)
    if m:
        return F.lit(m.group(1))
    mb = _IF_BLOCK.match(pattern)
    if not mb:
        # 'throw(' appears only as incidental literal text (e.g. inside
        # a string the template emits) — not a throw template at all
        return None
    out = None
    any_throw = False
    branches = [(mb.group("cond"), mb.group("then"))]
    branches += _ELIF.findall(mb.group("elifs") or "")
    for cond_src, body in branches:
        tm = _THROW.match(body)
        any_throw = any_throw or tm is not None
        msg = F.lit(tm.group(1)) if tm else F.lit(None).cast("string")
        cond = _compile_condition(cond_src, input_col)
        out = F.when(cond, msg) if out is None else out.when(cond, msg)
    els = mb.group("els")
    if els is not None:
        tm = _THROW.match(els)
        if tm:
            any_throw = True
            out = out.otherwise(F.lit(tm.group(1)))
    # an if-block where no branch body is an actual throw(...) call:
    # the substring was incidental — render normally
    return out if any_throw else None


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on `sep` outside parens/quotes."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _compile_expr(src: str, input_col: str | None = None) -> str:
    """Compile one `{{ ... }}` hole body to a SQL expression string.

    ``input_col`` names a snapshot struct of the pre-action record: the
    reference's templates see `input` = the ORIGINAL record and `output`
    = the accumulating one (src/updater/tera.rs:113-131).  Without a
    snapshot both resolve to current columns.
    """
    chain = _split_top_level(src.strip(), "|")
    base = chain[0].strip()
    if base == "input":
        # whole-record reference (the default action pattern
        # `{{ input | json_encode() }}`, updater/mod.rs:58)
        base = input_col if input_col else "struct(*)"
    elif base == "now()":
        base = "current_timestamp()"
    else:
        m_env = re.match(
            r"^get_env\(\s*name\s*=\s*'(\w+)'\s*(?:,\s*default\s*=\s*'([^']*)')?\s*\)$", base
        )
        if m_env:
            # reference env function (function/string.rs:74-116): the
            # value is resolved driver-side at compile time → a literal;
            # resolution checks the shared set_env store first
            val = resolve_env(m_env.group(1), m_env.group(2))
            base = "'" + str(val).replace("\\", "\\\\").replace("'", "''") + "'"
    base = re.sub(r"\binput\.", f"{input_col}." if input_col else "", base)
    base = re.sub(r"\boutput\.", "", base)
    base = re.sub(r"\bcontext\.steps\.", "_steps.", base)
    base = re.sub(r"\bsteps\.", "_steps.", base)
    sql = base
    is_json = False  # True once an object filter turned the value into JSON text
    for step in chain[1:]:
        step = step.strip()
        m = re.match(r"^(\w+)\s*(?:\((.*)\))?$", step)
        if not m:
            raise UnsupportedTemplate(f"cannot parse filter {step!r}")
        fname, argsrc = m.group(1), m.group(2) or ""
        if fname == "json_encode" and is_json:
            # the value is already JSON text — encoding again would
            # double-quote it (reference renders objects to JSON anyway)
            continue
        if fname in _JSON_VALUE_FILTERS or fname in ("search", "map", "keys", "values"):
            ensure_object_udfs()
            raw_args = {}
            raw_texts = {}
            for kv in _split_top_level(argsrc, ",") if argsrc else []:
                if kv.strip():
                    k, _, v = kv.partition("=")
                    raw_args[k.strip()] = _parse_literal(v)
                    raw_texts[k.strip()] = v.strip()
            src_expr = sql if is_json else f"chew_tojson({sql})"
            if fname in ("search", "map"):
                # map(attribute) projects a nested attribute — same JSON
                # pointer machinery as search (object.rs:506-525)
                path = _pointer_to_json_path(raw_args.get("attribute", "/"))
                sql = f"get_json_object({src_expr}, '{path}')"
                is_json = True
            elif fname == "keys":
                # object → key names; array → indices (object.rs:540-552;
                # indices stringify — one Spark array type for both shapes)
                sql = (
                    f"coalesce(json_object_keys({src_expr}), "
                    f"case when json_array_length({src_expr}) = 0 then array() "
                    f"else transform(sequence(0, json_array_length({src_expr}) - 1), "
                    f"x -> cast(x as string)) end)"
                )
                is_json = False
            elif fname == "values":
                # typed object values (object.rs:527-537): a JSON array
                # preserving each value's type (number stays number,
                # nested object stays object) — heterogeneous values
                # have no single Spark type, so the array stays JSON
                # text and re-resolves through downstream filters
                sql = f"chew_values({src_expr})"
                is_json = True
            else:
                import json as _j

                def sql_quote(s: str) -> str:
                    # escape for a Spark SQL string literal: backslashes
                    # first (Spark treats \ as an escape), then quotes
                    return s.replace("\\", "\\\\").replace("'", "''")

                with_txt = raw_texts.get("with", "")
                if (
                    fname == "merge"
                    and with_txt
                    and with_txt[0] not in "'\"[{0123456789-"
                    and re.fullmatch(r"[\w.]+", with_txt)
                ):
                    # `with` is a COLUMN reference, not a literal —
                    # resolve it like any base ref and ship its value
                    wexpr = re.sub(r"\binput\.", f"{input_col}." if input_col else "", with_txt)
                    wexpr = re.sub(r"\boutput\.", "", wexpr)
                    payload = sql_quote(_j.dumps(
                        {k: v for k, v in raw_args.items() if k != "with"},
                        ensure_ascii=False,
                    ))
                    sql = f"chew_merge_col({src_expr}, '{payload}', chew_tojson({wexpr}))"
                else:
                    payload = sql_quote(_j.dumps(raw_args, ensure_ascii=False))
                    sql = f"chew_{fname}({src_expr}, '{payload}')"
                is_json = True
            continue
        if fname == "set_env":
            # reference set_env filter (filters/string.rs:145-167):
            # store the value under CHEWDATA_<name> in the shared env
            # store and pass the value through unchanged.  Compilation
            # is driver-side, so only compile-time-constant inputs can
            # be stored (the reference's own doctest pattern:
            # `'literal' | set_env(name='KEY')`); a column-dependent
            # value has no single process-wide value to store.
            m_name = re.search(r"name\s*=\s*'(\w+)'", argsrc)
            if not m_name:
                raise UnsupportedTemplate("set_env requires a `name` argument")
            m_lit = re.fullmatch(r"'((?:[^'\\]|\\.|'')*)'", sql.strip())
            if m_lit:
                _shared_env[_ENV_PREFIX + m_name.group(1)] = (
                    m_lit.group(1).replace("''", "'").replace("\\\\", "\\")
                )
            else:
                raise UnsupportedTemplate(
                    "set_env requires a compile-time constant value "
                    "(a literal or get_env(...) input); per-record "
                    "stores do not distribute"
                )
            continue
        if fname == "filesizeformat":
            # humansize-style: binary divisor, 2-dp, trailing zeros
            # trimmed — 1000000 → "976.56 kB" (reference tests/transformer.rs:62)
            sql = _filesizeformat_sql(sql)
            continue
        if fname in ("base64_encode", "base64_decode") and argsrc:
            # the reference supports 4 alphabets (string.rs:48-122):
            # standard / standard_no_pad / url_safe / url_safe_no_pad
            cfg = str(_parse_literal(argsrc.partition("=")[2] or argsrc)).lower()
            sql = _base64_sql(sql, fname == "base64_encode", cfg)
            continue
        if fname not in _FILTERS:
            raise UnsupportedTemplate(f"unsupported filter {fname!r}")
        args = dict(_FILTER_DEFAULTS.get(fname, {}))
        for kv in _split_top_level(argsrc, ",") if argsrc else []:
            if not kv.strip():
                continue
            k, _, v = kv.partition("=")
            v = v.strip()
            v = re.sub(r"\binput\.", f"{input_col}." if input_col else "", v)
            if k.strip() == "format" and fname == "date":
                for tok, rep in _DATE_TOKENS.items():
                    v = v.replace(tok, rep)
            args[k.strip()] = v
        if fname == "round":
            method = args.get("method", "'common'").strip("'\"")
            p = args.get("precision", "0")
            if method == "floor":
                sql = f"floor(({sql}) * pow(10, {p})) / pow(10, {p})"
            elif method == "ceil":
                sql = f"ceil(({sql}) * pow(10, {p})) / pow(10, {p})"
            else:
                sql = f"round({sql}, {p})"
            continue
        try:
            sql = _FILTERS[fname].format(sql, **args)
        except (KeyError, IndexError) as e:
            raise UnsupportedTemplate(f"filter {fname!r} missing arg: {e}") from e
    return sql


def _base64_sql(x: str, encode: bool, cfg: str) -> str:
    """base64 with the reference's 4 alphabet configs (string.rs:48-122)."""
    url = "url" in cfg
    no_pad = "no_pad" in cfg
    if encode:
        out = f"base64({x})"
        if url:
            out = f"translate({out}, '+/', '-_')"
        if no_pad:
            out = f"replace({out}, '=', '')"
        return out
    src = x
    if url:
        src = f"translate({src}, '-_', '+/')"
    if no_pad:  # restore padding for the decoder
        src = f"concat({src}, repeat('=', (4 - length({src}) % 4) % 4))"
    return f"cast(unbase64({src}) as string)"


def _trim_zeros(expr: str) -> str:
    return f"regexp_replace(regexp_replace(cast({expr} as string), '(\\\\.\\\\d*?)0+$', '$1'), '\\\\.$', '')"


def _filesizeformat_sql(x: str) -> str:
    def fmt(div: str, unit: str) -> str:
        return f"concat({_trim_zeros(f'round(({x}) / {div}, 2)')}, ' {unit}')"

    return (
        f"CASE WHEN ({x}) < 1024 THEN concat(cast(cast({x} as bigint) as string), ' B') "
        f"WHEN ({x}) < 1048576 THEN {fmt('1024.0', 'kB')} "
        f"WHEN ({x}) < 1073741824 THEN {fmt('1048576.0', 'MB')} "
        f"WHEN ({x}) < 1099511627776 THEN {fmt('1073741824.0', 'GB')} "
        f"ELSE {fmt('1099511627776.0', 'TB')} END"
    )


def template_to_column(pattern: str, *, input_col: str | None = None) -> Column:
    """Compile a Tera-subset template string into a native Column.

    A single whole-string hole keeps its native type (the reference's
    ``Value::resolve`` re-typing falls out naturally: expressions stay
    numeric/boolean/array).  Mixed text + holes becomes a string concat.
    """
    if "{%-" in pattern or "-%}" in pattern:
        # Tera whitespace-control markers: normalize and trim branch
        # bodies (the reference's `{%- if c -%} true {%- else -%} ...`)
        pattern = re.sub(r"\{%-\s*", "{% ", pattern)
        pattern = re.sub(r"\s*-%\}", " %}", pattern)
        pattern = re.sub(r"\{\{-\s*", "{{ ", pattern)
        pattern = re.sub(r"\s*-\}\}", " }}", pattern)
        if _IF_BLOCK.match(pattern):
            return _compile_if_block(pattern, input_col=input_col, strip_bodies=True)
    if "{%" in pattern:
        return _compile_if_block(pattern, input_col=input_col)
    if _THROW.match(pattern):
        # unconditional throw: no value; compile_throw_error carries
        # the message to _error
        return F.lit(None).cast("string")
    holes = list(_HOLE.finditer(pattern))
    if not holes:
        return F.lit(pattern)
    if len(holes) == 1 and holes[0].span() == (0, len(pattern)):
        return F.expr(_compile_expr(holes[0].group(1), input_col))
    parts: list[Column] = []
    pos = 0
    for h in holes:
        if h.start() > pos:
            parts.append(F.lit(pattern[pos:h.start()]))
        parts.append(F.expr(_compile_expr(h.group(1), input_col)).cast("string"))
        pos = h.end()
    if pos < len(pattern):
        parts.append(F.lit(pattern[pos:]))
    return F.concat(*parts)


# filters whose compiled form can produce NULL from malformed (non-null)
# input — the compiled analogue of a Tera render error
_FALLIBLE_FILTER = re.compile(r"\|\s*(int|float|date)\b")


def fallible_refs(pattern: str | None) -> list[str] | None:
    """If the pattern uses a fallible filter, the input fields it reads
    (for null-vs-failure disambiguation); else None."""
    if not pattern or not _FALLIBLE_FILTER.search(pattern):
        return None
    return re.findall(r"\binput\.([\w]+)", pattern)


@dataclass
class Action:
    """One transformer action (reference: src/updater/mod.rs:58-91).

    ``field`` is a dot path; ``/`` (root) is not supported by the
    compiled path (needs whole-row struct rebuild — pandas fallback).
    """

    field: str
    pattern: str | None = None
    type: Literal["merge", "replace", "remove"] = "merge"


def apply_actions(
    df: DataFrame, actions: list[Action | dict], *, route_errors: bool = False
) -> DataFrame:
    """Fold the ordered action list over the DataFrame.

    merge/replace at a leaf field are both "set the field" (deep-merge
    differs from replace only for object values; nested-struct merge is
    handled via withField); remove drops the field.

    `input` in patterns refers to the ORIGINAL record entering the step
    (reference tera context); a `_input` struct snapshot provides it and
    is dropped after the fold — Catalyst prunes unreferenced fields.
    """
    acts = [Action(**a) if isinstance(a, dict) else a for a in actions]
    needs_input = any(a.pattern and re.search(r"\binput\b", a.pattern) for a in acts)
    input_col = None
    if needs_input:
        input_col = "_input"
        df = df.withColumn("_input", F.struct(*[F.col(c) for c in df.columns]))
    throw_parts: list[Column] = []
    for a in acts:
        if a.type != "remove":
            terr = compile_throw_error(a.pattern, input_col)
            if terr is not None:
                throw_parts.append(terr)
        if a.type == "remove":
            if "." in a.field:
                top, rest = a.field.split(".", 1)
                df = df.withColumn(top, F.col(top).dropFields(rest))
            else:
                df = df.drop(a.field)
            continue
        col = template_to_column(a.pattern if a.pattern is not None else "", input_col=input_col)
        if "." in a.field:
            top, rest = a.field.split(".", 1)
            df = df.withColumn(top, F.col(top).withField(rest, col))
        elif a.type == "merge" and a.field in df.columns:
            df = _merge_field(df, a.field, col)
        else:
            df = df.withColumn(a.field, col)
    if route_errors or throw_parts:
        # render-failure → Err channel (reference: a failed template
        # render emits DataResult::Err, src/step/transformer.rs:238-249):
        # an explicit throw() always errs; a fallible action that
        # produced NULL from non-null inputs errs when route_errors.
        parts: list[Column] = []
        if "_error" in df.columns:
            parts.append(F.col("_error"))
        parts.extend(throw_parts)
        for a in acts if route_errors else []:
            refs = fallible_refs(a.pattern)
            if a.pattern and "throw(" in a.pattern:
                # explicit throw already errs with its own message; the
                # NULL it renders is not a failed render
                continue
            if refs is None or not refs or a.type == "remove":
                # no identifiable source refs → can't distinguish a render
                # failure from a legitimately-NULL source; don't flag
                # (contract: err only on "NULL from non-null inputs")
                continue
            src = f"{input_col}." if input_col else ""
            cond = F.col(a.field).isNull()
            for r in refs:
                cond = cond & F.expr(f"{src}{r}").isNotNull()
            parts.append(F.when(cond, F.lit(f"failed to render field '{a.field}'")))
        if parts:
            df = df.withColumn("_error", F.nullif(F.concat_ws("; ", *parts), F.lit("")))
    if input_col:
        df = df.drop(input_col)
    return df


def _positional_mergeable(a, b) -> bool:
    """Both sides are arrays of the SAME struct type → positional merge
    is well-typed; anything else degenerates to replace."""
    return (
        a.typeName() == "array"
        and b.typeName() == "array"
        and a.elementType.typeName() == "struct"
        # simpleString ignores nullability (literal structs are non-null)
        and a.elementType.simpleString() == b.elementType.simpleString()
    )


def _merge_field(df: DataFrame, field: str, col: Column) -> DataFrame:
    """Deep-merge semantics for object values (reference
    src/helper/value.rs:202-230): when both the existing field and the
    new value are structs, new subfields overwrite/extend recursively;
    otherwise merge degenerates to replace (scalar/array behavior)."""
    old_dt = df.schema[field].dataType
    new_dt = df.select(col.alias("_probe")).schema["_probe"].dataType
    if _positional_mergeable(old_dt, new_dt):
        # top-level positional array merge (MergeAndReplace)
        return df.withColumn(
            field, F.zip_with(F.col(field), col, _elem_merger(old_dt.elementType))
        )
    if old_dt.typeName() != "struct" or new_dt.typeName() != "struct":
        return df.withColumn(field, col)
    return df.withColumn(field, _struct_merge(F.col(field), old_dt, col, new_dt))


def _elem_merger(et):
    """zip_with element function merging two same-typed struct elements;
    null-padded side loses (MergeAndReplace extras survive).  A closure
    factory, not a defaulted lambda param (HOF arity trap)."""

    def f2(o: Column, n: Column) -> Column:
        return F.when(n.isNull(), o).when(o.isNull(), n).otherwise(_struct_merge(o, et, n, et))

    return f2


def _struct_merge(old: Column, odt, new: Column, ndt) -> Column:
    new_names = {f.name for f in ndt.fields}
    parts = []
    for f in odt.fields:
        if f.name in new_names:
            nf = ndt[f.name]
            if f.dataType.typeName() == "struct" and nf.dataType.typeName() == "struct":
                parts.append(
                    _struct_merge(
                        old.getField(f.name), f.dataType, new.getField(f.name), nf.dataType
                    ).alias(f.name)
                )
            elif _positional_mergeable(f.dataType, nf.dataType):
                # positional array merge (MergeAndReplace, value.rs:202-230)
                parts.append(
                    F.zip_with(
                        old.getField(f.name),
                        new.getField(f.name),
                        _elem_merger(f.dataType.elementType),
                    ).alias(f.name)
                )
            else:
                parts.append(new.getField(f.name).alias(f.name))
        else:
            parts.append(old.getField(f.name).alias(f.name))
    for f in ndt.fields:
        if f.name not in {x.name for x in odt.fields}:
            parts.append(new.getField(f.name).alias(f.name))
    return F.struct(*parts)
