"""Object/structure helpers (reference tera filters + value helpers).

Parity targets (SURVEY §2.6/§2.7, reference
src/updater/tera_helpers/filters/object.rs and src/helper/value.rs):

- ``replace_key``  — regex-rename keys recursively (object.rs:141-204)
- ``replace_value``— regex-replace string values recursively (:235-303)
- ``extract``      — keep only listed attribute paths (:331-368)
- ``search``       — JSON-pointer projection (:98-111)
- ``flatten``      — nested record → dotted flat map (value.rs:7-82;
  what the reference's CSV writer does to nested records)
- ``find``         — regex find-all → array (filters/string.rs:196-219)

All are schema rewrites / native expressions — no UDFs, no shuffles.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def replace_key(df: DataFrame, pattern: str, replacement: str) -> DataFrame:
    """Regex-rename columns at every nesting level (schema rewrite only —
    zero data movement)."""
    rx = re.compile(pattern)

    def rebuild(col: Column, dt) -> Column:
        if isinstance(dt, StructType):
            return F.struct(
                *[
                    rebuild(col.getField(f.name), f.dataType).alias(rx.sub(replacement, f.name))
                    for f in dt.fields
                ]
            )
        if isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
            inner = dt.elementType
            return F.transform(
                col,
                lambda x: F.struct(
                    *[
                        rebuild(x.getField(f.name), f.dataType).alias(rx.sub(replacement, f.name))
                        for f in inner.fields
                    ]
                ),
            )
        return col

    return df.select(
        *[
            rebuild(F.col(f.name), f.dataType).alias(rx.sub(replacement, f.name))
            for f in df.schema.fields
        ]
    )


def replace_value(df: DataFrame, pattern: str, replacement: str) -> DataFrame:
    """Regex-replace every string value, recursing into structs/arrays."""

    def rebuild(col: Column, dt) -> Column:
        if isinstance(dt, StructType):
            return F.struct(
                *[rebuild(col.getField(f.name), f.dataType).alias(f.name) for f in dt.fields]
            )
        if isinstance(dt, ArrayType):
            return F.transform(col, lambda x: rebuild(x, dt.elementType))
        if dt.typeName() == "string":
            return F.regexp_replace(col, pattern, replacement)
        return col

    return df.select(*[rebuild(F.col(f.name), f.dataType).alias(f.name) for f in df.schema.fields])


def extract(df: DataFrame, paths: list[str]) -> DataFrame:
    """Keep only the listed dot-paths, preserving nesting.

    ``extract(df, ["a", "b.c"])`` keeps column a and field c of struct b.
    """
    top: dict[str, list[str]] = {}
    for p in paths:
        head, _, rest = p.partition(".")
        top.setdefault(head, []).append(rest)
    out: list[Column] = []
    for name, rests in top.items():
        field = df.schema[name]
        if all(r == "" for r in rests) or not isinstance(field.dataType, StructType):
            out.append(F.col(name))
        else:
            kept = [r for r in rests if r]
            sub = []
            for r in kept:
                c = F.col(name)
                for seg in r.split("."):
                    c = c.getField(seg)
                sub.append(c.alias(r.split(".")[-1]))
            out.append(F.struct(*sub).alias(name))
    return df.select(*out)


def search(df: DataFrame, pointer: str) -> Column:
    """JSON-pointer / dotted-path projection: ``/a/b`` or ``a.b`` → Column."""
    path = ".".join(s for s in re.split(r"[/.]", pointer) if s)
    return F.col(path)


def flatten(
    df: DataFrame, *, sep: str = ".", positional: bool = True, max_elements: int = 1000
) -> DataFrame:
    """Nested record → flat record with dotted column names (the
    reference's CSV-write flattening, value.rs:7-82): struct fields
    become ``a.b``; arrays expand POSITIONALLY to ``a.0``, ``a.1`` …
    recursively (``a.0.b`` for arrays of structs).

    The column set is the union across all records (the reference picks
    the deepest record for the header, csv.rs:384-414; a union header is
    the distributed equivalent — shorter arrays null-fill).  Widths come
    from one MAX(size) aggregate per array-nesting level — the same
    full-scan cost as the reference's depth probe, but map-side only.
    ``positional=False`` keeps arrays as single columns (rendered as
    JSON text in CSV cells).
    """

    def quoted(name: str) -> Column:
        return F.col("`" + name + "`")

    while True:
        structs = [f for f in df.schema.fields if isinstance(f.dataType, StructType)]
        if structs:
            cols: list[Column] = []
            for f in df.schema.fields:
                if isinstance(f.dataType, StructType):
                    for sub in f.dataType.fields:
                        cols.append(
                            quoted(f.name).getField(sub.name).alias(f"{f.name}{sep}{sub.name}")
                        )
                else:
                    cols.append(quoted(f.name))
            df = df.select(*cols)
            continue
        if not positional:
            return df
        arrays = [f for f in df.schema.fields if isinstance(f.dataType, ArrayType)]
        if not arrays:
            return df
        sizes = (
            df.agg(*[F.max(F.size(quoted(f.name))).alias(f.name) for f in arrays])
            .collect()[0]
            .asDict()
        )
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, ArrayType):
                n = min(int(sizes[f.name] or 0), max_elements)
                for i in range(n):
                    # try_element_at: shorter arrays null-fill under ANSI
                    cols.append(
                        F.try_element_at(quoted(f.name), F.lit(i + 1)).alias(f"{f.name}{sep}{i}")
                    )
            else:
                cols.append(quoted(f.name))
        df = df.select(*cols)


def find(col: Column | str, pattern: str) -> Column:
    """Regex find-all → array of matches (reference find filter)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(pattern), 0)


# -- value-level filters (reference object.rs semantics, exact) --------------
#
# These mirror src/updater/tera_helpers/filters/object.rs on plain JSON
# values so the template compiler can expose them inside {{ ... }}
# patterns (via Arrow-batched UDFs over to_json).  Pure functions —
# golden-tested against the reference doctest cases.


def _segs(pointer: str) -> list[str]:
    return [s for s in re.split(r"[/.]", pointer) if s]


def value_search(value, pointer: str):
    """JSON-pointer / dotted-path search (object.rs:98-111): the element
    at the path, or None."""
    node = value
    for seg in _segs(pointer):
        if isinstance(node, list):
            if not seg.isdigit() or int(seg) >= len(node):
                return None
            node = node[int(seg)]
        elif isinstance(node, dict):
            node = node.get(seg)
        else:
            return None
        if node is None:
            return None
    return node


def _rust_repl(replacement: str) -> str:
    """Rust regex replacement syntax → Python: ``$1`` → ``\\1``,
    ``${name}`` → ``\\g<name>``."""
    s = re.sub(r"\$\{(\w+)\}", r"\\g<\1>", replacement)
    return re.sub(r"\$(\d+)", r"\\\1", s)


def _resolve(s: str):
    """The reference's ``Value::resolve`` re-typing: a rendered string
    becomes a number/bool/null when it parses cleanly."""
    if s == "null":
        return None
    if s in ("true", "false"):
        return s == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


def value_replace_key(value, pattern: str, replacement: str, level: int = 0, _cur: int = 0):
    """Regex-rename keys, recursively (object.rs:141-204).  First
    occurrence per key (Rust ``Regex::replace``); ``level`` > 0 caps the
    recursion depth."""
    if level > 0 and level <= _cur:
        return value
    repl = _rust_repl(replacement)
    if isinstance(value, dict):
        return {
            re.sub(pattern, repl, k, count=1): value_replace_key(
                v, pattern, replacement, level, _cur + 1
            )
            for k, v in value.items()
        }
    if isinstance(value, list):
        return [value_replace_key(v, pattern, replacement, level, _cur + 1) for v in value]
    return value


def value_replace_value(value, pattern: str, replacement: str, level: int = 0, _cur: int = 0):
    """Regex-replace every scalar value, recursively (object.rs:235-303):
    scalars render to strings (``true``/``null``/numbers), the first
    regex occurrence is replaced, and the result re-types via
    ``Value::resolve``."""
    if level > 0 and level <= _cur:
        return value
    if isinstance(value, dict):
        return {
            k: value_replace_value(v, pattern, replacement, level, _cur + 1)
            for k, v in value.items()
        }
    if isinstance(value, list):
        return [value_replace_value(v, pattern, replacement, level, _cur + 1) for v in value]
    if value is None:
        rendered = "null"
    elif isinstance(value, bool):
        rendered = "true" if value else "false"
    else:
        rendered = str(value)
    return _resolve(re.sub(pattern, _rust_repl(replacement), rendered, count=1))


def _extract_one(value, attributes: list[str]):
    out: dict = {}

    def walk(node, segs, path):
        """Collect (resolved_path, value) for every match; segments are
        exact keys, array indices, or REGEXES against object keys
        (reference Extract, value.rs:117-199)."""
        if not segs:
            yield path, node
            return
        seg, rest = segs[0], segs[1:]
        if isinstance(node, dict):
            if seg in node:
                yield from walk(node[seg], rest, path + [seg])
                return
            try:
                rx = re.compile(seg)
            except re.error:
                return
            for k in node:
                if rx.fullmatch(k):
                    yield from walk(node[k], rest, path + [k])
        elif isinstance(node, list) and seg.isdigit() and int(seg) < len(node):
            yield from walk(node[int(seg)], rest, path + [seg])

    for attr in attributes:
        for path, node in walk(value, _segs(attr), []):
            cur = out
            for seg in path[:-1]:
                cur = cur.setdefault(seg, {})
            cur[path[-1]] = node
    return out


def value_extract(value, attributes: list[str]):
    """Keep only the listed attribute paths, preserving structure
    (object.rs:305-368).  An array of objects extracts per element,
    dropping elements where nothing matched."""
    if isinstance(value, list):
        out = [_extract_one(v, attributes) for v in value]
        return [v for v in out if v]
    if isinstance(value, dict):
        return _extract_one(value, attributes)
    return None


def value_merge(value, with_value, attribute: str | None = None):
    """Deep merge (object.rs merge filter): objects merge recursively,
    arrays concatenate, scalars replace; ``attribute`` targets a nested
    path (created if absent)."""

    def merge2(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(a)
            for k, v in b.items():
                out[k] = merge2(a[k], v) if k in a else v
            return out
        if isinstance(a, list) and isinstance(b, list):
            return a + b
        return b

    if attribute is None:
        return merge2(value, with_value)
    out = value if isinstance(value, dict) else {}
    out = dict(out)
    segs = _segs(attribute)
    cur = out
    for seg in segs[:-1]:
        nxt = cur.get(seg)
        cur[seg] = dict(nxt) if isinstance(nxt, dict) else {}
        cur = cur[seg]
    leaf = segs[-1]
    cur[leaf] = merge2(cur[leaf], with_value) if leaf in cur else with_value
    return out


def _named_filter(fn: str, node, sub: dict):
    """The sub-filter registry for `update` (the reference resolves these
    from its Tera engine; object.rs:395-435)."""
    if fn == "filter":  # Tera built-in: keep array elements where attr == value
        attr, val = sub.get("attribute"), sub.get("value")
        if not isinstance(node, list):
            return node
        return [x for x in node if isinstance(x, dict) and x.get(attr) == val]
    if fn == "trim":
        return node.strip() if isinstance(node, str) else node
    if fn == "upper":
        return node.upper() if isinstance(node, str) else node
    if fn == "lower":
        return node.lower() if isinstance(node, str) else node
    if fn == "capitalize":
        return node.capitalize() if isinstance(node, str) else node
    if fn == "replace":
        if isinstance(node, str):
            return node.replace(str(sub.get("from", "")), str(sub.get("to", "")))
        return node
    if fn == "search":
        return value_search(node, sub.get("attribute", "/"))
    if fn == "keys":
        return value_keys(node)
    if fn == "values":
        return value_values(node)
    if fn == "replace_key":
        return value_replace_key(node, sub.get("from", ""), sub.get("to", ""))
    if fn == "replace_value":
        return value_replace_value(node, sub.get("from", ""), sub.get("to", ""))
    raise ValueError(f"update: unsupported fn {fn!r}")


def value_update(value, args: dict):
    """Apply a named filter at a wildcard/regex attribute path
    (object.rs:395-497).  Path segments: numeric = array index, ``*`` =
    every array element, else regex matched against object keys (first
    matching key, as the reference does).  Raises if nothing matched."""
    fn = args.get("fn")
    if fn == "update":
        raise ValueError("`fn=update` cannot be used with this filter")
    if not fn or "attribute" not in args:
        raise ValueError("update requires 'fn' and 'attribute'")
    fields = _segs(str(args["attribute"]))
    sub = {k[len(fn) + 1 :]: v for k, v in args.items() if k.startswith(f"{fn}_")}

    def apply_at(node, segs):
        """Returns (new_node, updated?)."""
        if not segs:
            return _named_filter(fn, node, sub), True
        seg, rest = segs[0], segs[1:]
        if seg.isdigit():
            if isinstance(node, list) and int(seg) < len(node):
                i = int(seg)
                new, ok = apply_at(node[i], rest)
                if ok:
                    node = list(node)
                    node[i] = new
                return node, ok
            return node, False
        return by_pattern(node, seg, rest)

    def by_pattern(node, pattern, rest):
        if isinstance(node, list):
            updated = False
            out = []
            for v in node:
                if pattern == "*":
                    new, ok = apply_at(v, rest)
                else:
                    new, ok = by_pattern(v, pattern, rest)
                out.append(new)
                updated |= ok
            return (out if updated else node), updated
        if isinstance(node, dict):
            rx = re.compile(pattern)
            for k in node:
                if rx.search(k):
                    new, ok = apply_at(node[k], rest)
                    if ok:
                        node = dict(node)
                        node[k] = new
                    return node, ok
            return node, False
        return node, False

    out, ok = apply_at(value, fields)
    if not ok:
        raise ValueError(f"Attribute not found '{args['attribute']}'")
    return out


def value_depth(value) -> int:
    """Max nesting depth (reference Depth, value.rs:85-114) — used to
    pick the CSV header-donor record; scalars are depth 0."""
    if isinstance(value, dict):
        return 1 + max((value_depth(v) for v in value.values()), default=0)
    if isinstance(value, list):
        return 1 + max((value_depth(v) for v in value), default=0)
    return 0


def schema_depth(dt) -> int:
    """Depth of a Spark datatype (the schema-level twin of value_depth)."""
    if isinstance(dt, StructType):
        return 1 + max((schema_depth(f.dataType) for f in dt.fields), default=0)
    if isinstance(dt, ArrayType):
        return 1 + schema_depth(dt.elementType)
    return 0


def value_merge_replace(a, b):
    """Positional merge (reference MergeAndReplace, value.rs:202-230):
    objects merge per key, ARRAYS MERGE PER INDEX (b's extras append),
    scalars replace."""
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = value_merge_replace(out[k], v) if k in out else v
        return out
    if isinstance(a, list) and isinstance(b, list):
        out = list(a)
        for i, v in enumerate(b):
            if i < len(out):
                out[i] = value_merge_replace(out[i], v)
            else:
                out.append(v)
        return out
    return b


def value_keys(value):
    """Keys of an object / indices of an array (object.rs:528-552)."""
    if isinstance(value, dict):
        return list(value.keys())
    if isinstance(value, list):
        return list(range(len(value)))
    return None


def value_values(value):
    """Values of an object; an array is returned as-is (object.rs:520-530)."""
    if isinstance(value, dict):
        return list(value.values())
    return value
