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


def mongo_connector_options(conn: dict[str, Any]) -> dict[str, str]:
    """Reference mongodb connector config (mongodb.rs:69-91: endpoint,
    database, collection, filter) → option dict for the official
    mongo-spark connector (``format("mongodb")``).  The filter becomes
    an aggregation ``$match`` stage — the connector pushes it to the
    server, same I/O shape as the reference's ``find(filter)``
    (mongodb.rs:314-380).  Pure function; no server needed to test."""
    import json

    out = {
        "connection.uri": conn["endpoint"],
        "database": conn.get("database", conn.get("db", "")),
        "collection": conn.get("collection", conn.get("col", "")),
    }
    stages: list[dict[str, Any]] = []
    if conn.get("filter"):
        stages.append({"$match": conn["filter"]})
    fo = conn.get("find_options") or {}
    if fo.get("sort"):
        stages.append({"$sort": fo["sort"]})
    if fo.get("skip"):
        stages.append({"$skip": int(fo["skip"])})
    if fo.get("limit"):
        stages.append({"$limit": int(fo["limit"])})
    if fo.get("projection"):
        stages.append({"$project": fo["projection"]})
    if stages:
        out["aggregation.pipeline"] = json.dumps(stages)
    return out


def apply_find_options(df, find_options: dict[str, Any]):
    """Replay FindOptions on any DataFrame (parity path when the data
    came from a JSON dump instead of a live server): projection →
    select, sort → orderBy, skip/limit → offset/limit."""
    fo = find_options or {}
    if fo.get("sort"):
        df = df.orderBy(
            *[F.col(k).asc() if v >= 0 else F.col(k).desc() for k, v in fo["sort"].items()]
        )
    if fo.get("skip"):
        df = df.offset(int(fo["skip"]))
    if fo.get("limit"):
        df = df.limit(int(fo["limit"]))
    if fo.get("projection"):
        df = df.select(*mongo_projection_to_columns(fo["projection"]))
    return df


def mongo_offset_pipelines(
    count: int, limit: int = 100, skip: int = 0
) -> list[list[dict[str, Any]]]:
    """mongodb offset paginator (src/connector/paginator/mongodb/offset.rs):
    a known count fans out into parallel ``$skip/$limit`` pipelines —
    one per Spark partition when fed to `aggregation.pipeline`."""
    pipelines = []
    at = skip
    while at < count:
        pipelines.append([{"$skip": at}, {"$limit": limit}])
        at += limit
    return pipelines or [[{"$skip": skip}, {"$limit": limit}]]


def mongo_cursor_batches(
    count: int, limit: int = 100, skip: int = 0
) -> list[dict[str, int]]:
    """mongodb cursor paginator contract
    (src/connector/paginator/mongodb/cursor.rs:44-189).

    The reference opens a live cursor, counts the documents it yields
    (``skip`` is applied to the *count* only — cursor.rs:100-101 sets
    ``options.skip`` before the counting find, while each yielded page
    clones the connector's ORIGINAL find_options and overrides
    ``skip = i`` starting from 0, cursor.rs:127-140), then yields one
    connector per ``limit``-sized batch.  That walk is inherently
    sequential ("the paginator cannot be parallelized", cursor.rs:1) —
    the compiled replay is therefore an ordered list of skip/limit
    find_options, one per micro-batch, mirrored faithfully including
    the pages-restart-at-0 behavior.

    An empty cursor yields no pages (unlike the offset paginator's
    one-empty-page fallback) — cursor.rs's ``paginate_to_end`` doctest
    pins exactly that.
    """
    batches: list[dict[str, int]] = []
    for i in range(0, max(0, count - skip), limit):
        batches.append({"skip": i, "limit": limit})
    return batches


def mongo_cursor_connector_options(
    conn: dict[str, Any], count: int
) -> list[dict[str, str]]:
    """One mongo-spark option dict per cursor batch: the compiled form
    of cursor.rs's yielded connector clones (each with find_options
    skip/limit overridden).  ``count`` comes from
    :func:`mongo_count_command` — the same count the reference's cursor
    materializes.  Feed the dicts as sequential reads (the reference
    cursor is ordered); each batch still pushes its own
    ``$skip/$limit`` pipeline to the server.
    """
    pag = conn.get("paginator") or {}
    limit = int(pag.get("limit", 100))
    skip = int(pag.get("skip", 0))
    outs = []
    for batch in mongo_cursor_batches(count, limit=limit, skip=skip):
        page_conn = dict(conn)
        fo = dict(conn.get("find_options") or {})
        fo["skip"], fo["limit"] = batch["skip"], batch["limit"]
        page_conn["find_options"] = fo
        outs.append(mongo_connector_options(page_conn))
    return outs


def mongo_count_command(conn: dict[str, Any]) -> dict[str, Any]:
    """mongodb metadata counter (src/connector/counter/mongodb/metadata.rs):
    the count command the offset paginator issues to plan page fan-out —
    feed its result to :func:`mongo_offset_pipelines`."""
    cmd: dict[str, Any] = {"count": conn.get("collection", conn.get("col", ""))}
    if conn.get("filter"):
        cmd["query"] = conn["filter"]
    return cmd


def mongo_upsert_operations(
    records: list[dict[str, Any]], key_fields: list[str]
) -> list[dict[str, Any]]:
    """Upsert batch semantics (mongodb.rs:384-465: ``update_many`` with
    ``$set`` + ``upsert=true`` filtered on the key fields).  Returns the
    operation documents a driver would execute — used by the
    foreachBatch sink and by contract tests."""
    ops = []
    for rec in records:
        filt = {k: rec[k] for k in key_fields}
        ops.append(
            {"filter": filt, "update": {"$set": rec}, "upsert": True, "multi": True}
        )
    return ops


def upsert_foreach_batch(keys: list[str], apply_ops):
    """Build a ``foreachBatch`` function implementing MERGE-style upsert
    for targets without native MERGE (mongo `update_many($set)`,
    JDBC `INSERT ON CONFLICT`): dedupe the micro-batch on the keys
    (last write wins, like replaying the reference's per-record updates)
    then hand each partition's operation batch to ``apply_ops``.

    ``apply_ops(ops: list[dict])`` runs on executors — it opens its own
    client (one per partition, the distributed analogue of the
    reference's pooled connection).
    """

    def fn(batch_df, batch_id: int) -> None:
        deduped = batch_df.dropDuplicates(keys)
        kf = list(keys)

        def per_partition(rows):
            recs = [r.asDict(recursive=True) for r in rows]
            if recs:
                apply_ops(mongo_upsert_operations(recs, kf))

        deduped.foreachPartition(per_partition)

    return fn
