"""Fuzz the Mongo-filter / find_options translators against a pure-
Python reference evaluator (reference parity for the contract-level
mongodb connector — src/connector/mongodb.rs:314-380 — which the
sandbox cannot run live; VERDICT r6 #7).

`mongo_filter_to_column` compiles a Mongo filter document into a Spark
boolean Column.  The reference evaluator below implements the same
semantics with explicit Kleene (three-valued) logic, because SQL NULL
propagation is exactly where a hand-written translator silently
diverges ($ne must match NULL via eqNullSafe, $nin must keep NULL,
$not over a NULL comparison must stay NULL and drop the row).

All ~200 random filters evaluate in ONE Spark action: each filter
becomes a boolean column of a single select, collected once.
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from chewdata_spark.sources.mongo import (
    apply_find_options,
    mongo_filter_to_column,
)

ROWS = [
    # (id, val, name) — NULLs in both value columns, duplicates in val
    (0, 5, "alpha"),
    (1, None, "beta"),
    (2, 17, None),
    (3, -3, "gamma ray"),
    (4, 5, "alphabet"),
    (5, 0, ""),
    (6, 42, "Delta"),
    (7, None, None),
    (8, 17, "epsilon"),
    (9, 100, "zeta99"),
]


# ---------------------------------------------------------------- #
# Kleene reference evaluator                                       #
# ---------------------------------------------------------------- #

def _not3(x):
    return None if x is None else not x


def _and3(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _or3(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _fold3(vals, combine):
    out = vals[0]
    for v in vals[1:]:
        out = combine(out, v)
    return out


def _eval_op(x, op, v):
    if op == "$eq":
        return None if x is None else x == v
    if op == "$ne":
        return not (x == v if x is not None else v is None)
    if op == "$gt":
        return None if x is None else x > v
    if op == "$gte":
        return None if x is None else x >= v
    if op == "$lt":
        return None if x is None else x < v
    if op == "$lte":
        return None if x is None else x <= v
    if op == "$in":
        return None if x is None else x in v
    if op == "$nin":
        return True if x is None else x not in v
    if op == "$regex":
        return None if x is None else bool(re.search(v, str(x)))
    if op == "$exists":
        return (x is not None) if v else (x is None)
    if op == "$not":
        if isinstance(v, dict):
            iop, iv = next(iter(v.items()))
            return _not3(_eval_op(x, iop, iv))
        return _not3(None if x is None else x == v)
    raise AssertionError(op)


def _eval_filter(doc, row):
    if not doc:
        return True
    parts = []
    for k, v in doc.items():
        if k == "$and":
            parts.append(_fold3([_eval_filter(d, row) for d in v], _and3))
        elif k == "$or":
            parts.append(_fold3([_eval_filter(d, row) for d in v], _or3))
        elif k == "$not":
            parts.append(_not3(_eval_filter(v, row)))
        else:
            x = row[k]
            if isinstance(v, dict) and any(o.startswith("$") for o in v):
                parts.append(
                    _fold3([_eval_op(x, o, ov) for o, ov in v.items()], _and3)
                )
            else:
                parts.append(None if x is None else x == v)
    return _fold3(parts, _and3)


# ---------------------------------------------------------------- #
# random filter grammar                                            #
# ---------------------------------------------------------------- #

_INT_VALS = [-3, 0, 5, 17, 42, 99, 100]
_STR_VALS = ["alpha", "beta", "Delta", "", "zeta99", "nope"]
_REGEXES = ["^alpha", "a", "[0-9]+$", "^$", "gamma|zeta"]


def _rand_leaf(rng: random.Random) -> dict:
    field = rng.choice(["val", "name"])
    vals = _INT_VALS if field == "val" else _STR_VALS
    kind = rng.randrange(10)
    if kind == 0:
        return {field: rng.choice(vals)}
    op = rng.choice(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte",
                     "$in", "$nin", "$regex", "$exists", "$not"])
    if op == "$regex":
        return {"name": {"$regex": rng.choice(_REGEXES)}}
    if op == "$exists":
        return {field: {"$exists": rng.random() < 0.5}}
    if op in ("$in", "$nin"):
        return {field: {op: rng.sample(vals, k=rng.randrange(1, 4))}}
    if op == "$not":
        inner_op = rng.choice(["$gt", "$lt", "$eq", "$in"])
        iv = (
            rng.sample(vals, k=2)
            if inner_op == "$in"
            else rng.choice(vals)
        )
        return {field: {"$not": {inner_op: iv}}}
    if op in ("$gt", "$gte", "$lt", "$lte") and field == "name":
        field = "val"
        vals = _INT_VALS
    return {field: {op: rng.choice(vals)}}


def _rand_filter(rng: random.Random, depth: int = 0) -> dict:
    if depth >= 2 or rng.random() < 0.5:
        return _rand_leaf(rng)
    kind = rng.randrange(4)
    if kind == 0:
        return {"$and": [_rand_filter(rng, depth + 1) for _ in range(rng.randrange(1, 4))]}
    if kind == 1:
        return {"$or": [_rand_filter(rng, depth + 1) for _ in range(rng.randrange(1, 4))]}
    if kind == 2:
        return {"$not": _rand_filter(rng, depth + 1)}
    # implicit multi-key conjunction
    merged: dict = {}
    for _ in range(2):
        merged.update(_rand_leaf(rng))
    return merged


N_FILTERS = 200


def test_filter_translator_fuzz_vs_reference(spark):
    rng = random.Random(20260814)
    filters = [_rand_filter(rng) for _ in range(N_FILTERS)]
    df = spark.createDataFrame(ROWS, "id long, val long, name string")
    cols = [F.col("id")] + [
        mongo_filter_to_column(doc).alias(f"f{i}") for i, doc in enumerate(filters)
    ]
    got = {r["id"]: r for r in df.select(*cols).collect()}
    mismatches = []
    for rid, val, name in ROWS:
        row = {"val": val, "name": name}
        for i, doc in enumerate(filters):
            want = _eval_filter(doc, row) is True  # filter keeps on TRUE only
            have = got[rid][f"f{i}"] is True
            if want != have:
                mismatches.append((doc, {"id": rid, **row}, want, have))
    assert not mismatches, f"{len(mismatches)} divergences, first: {mismatches[0]}"


def test_find_options_fuzz_vs_reference(spark):
    """sort/skip/limit/projection replay must match a Python reference
    on every random config (sort always tie-breaks on the unique id so
    skip/limit windows are deterministic).  Null placement mirrors
    Spark defaults: asc → NULLS FIRST, desc → NULLS LAST."""
    rng = random.Random(97)
    df = spark.createDataFrame(ROWS, "id long, val long, name string")
    pyrows = [{"id": i, "val": v, "name": n} for i, v, n in ROWS]
    for _ in range(40):
        sort: dict = {}
        if rng.random() < 0.8:
            f = rng.choice(["val", "name"])
            sort[f] = rng.choice([1, -1])
        sort["id"] = 1
        fo = {"sort": sort}
        if rng.random() < 0.7:
            fo["skip"] = rng.randrange(0, 6)
        if rng.random() < 0.7:
            fo["limit"] = rng.randrange(1, 8)
        proj_fields = rng.sample(["id", "val", "name"], k=rng.randrange(1, 4))
        fo["projection"] = {f: 1 for f in proj_fields}

        # stable multi-pass sort, last key first; reverse=True keeps
        # stability on equal keys and lands NULLs last on desc
        want = list(pyrows)
        for f, d in reversed(list(sort.items())):
            want.sort(
                key=lambda r, f=f: (
                    r[f] is not None,
                    r[f] if r[f] is not None else 0,
                ),
                reverse=d < 0,
            )
        if fo.get("skip"):
            want = want[fo["skip"]:]
        if fo.get("limit"):
            want = want[: fo["limit"]]
        want_rows = [tuple(r[f] for f in proj_fields) for r in want]

        have = apply_find_options(df, fo).collect()
        have_rows = [tuple(r[f] for f in proj_fields) for r in have]
        assert have_rows == want_rows, (fo, have_rows, want_rows)
