"""MongoDB connector mapping: filter-document → Column translation.

The reference's mongodb connector pushes a mustache-parameterized
filter document and a projection (src/connector/mongodb.rs:314-380).
With the official mongo-spark-connector the filter pushes down
natively; this module provides the semantic core independently of any
server: a translator from Mongo query documents to Spark Column
predicates, so the same filter JSON drives either a real Mongo source
or any DataFrame (parity testing, JSON-dump ingestion).

Supported operators: $eq $ne $gt $gte $lt $lte $in $nin $regex
$exists $and $or $not, implicit-AND documents, dotted field paths.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def mongo_filter_to_column(doc: dict[str, Any]) -> Column:
    """Translate a Mongo filter document into a boolean Column."""
    if not doc:
        return F.lit(True)
    parts = [_clause(k, v) for k, v in doc.items()]
    out = parts[0]
    for p in parts[1:]:
        out = out & p
    return out


def _clause(key: str, value: Any) -> Column:
    if key == "$and":
        return _fold([mongo_filter_to_column(d) for d in value], lambda a, b: a & b)
    if key == "$or":
        return _fold([mongo_filter_to_column(d) for d in value], lambda a, b: a | b)
    if key == "$not":
        return ~mongo_filter_to_column(value)
    if key.startswith("$"):
        raise ValueError(f"unsupported top-level operator {key!r}")
    col = F.col(key)
    if isinstance(value, dict) and any(k.startswith("$") for k in value):
        return _fold([_op(col, op, v) for op, v in value.items()], lambda a, b: a & b)
    return col == F.lit(value)


def _op(col: Column, op: str, v: Any) -> Column:
    if op == "$eq":
        return col == F.lit(v)
    if op == "$ne":
        return ~col.eqNullSafe(F.lit(v))
    if op == "$gt":
        return col > F.lit(v)
    if op == "$gte":
        return col >= F.lit(v)
    if op == "$lt":
        return col < F.lit(v)
    if op == "$lte":
        return col <= F.lit(v)
    if op == "$in":
        return col.isin(*v)
    if op == "$nin":
        return ~col.isin(*v) | col.isNull()
    if op == "$regex":
        return col.rlike(v)
    if op == "$exists":
        return col.isNotNull() if v else col.isNull()
    if op == "$not":
        inner = _op(col, *next(iter(v.items()))) if isinstance(v, dict) else (col == F.lit(v))
        return ~inner
    raise ValueError(f"unsupported operator {op!r}")


def _fold(cols: list[Column], combine) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = combine(out, c)
    return out


def mongo_projection_to_columns(projection: dict[str, int]) -> list[str]:
    """find_options projection → column list (column pruning)."""
    keep = [k for k, v in projection.items() if v]
    if not keep:
        raise ValueError("empty projection")
    return keep
