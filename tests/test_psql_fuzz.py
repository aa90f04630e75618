"""Fuzz the psql mustache-query renderer against a pure-Python
three-valued-logic evaluator, executing every rendered query on DuckDB
(reference parity for the contract-level psql connector —
src/connector/psql.rs:128-255 `query_sanitized` — which the sandbox
cannot run live; the jdbc twin of tests/test_mongo_fuzz.py).

Spec under test (independent of the implementation):
- a None param in the direct form ``col = {{ p }}`` / ``col != {{ p }}``
  rewrites to ``IS [NOT] NULL`` (psql.rs IS-NULL rewrite);
- a None param anywhere ELSE renders as a literal NULL and keeps SQL's
  strict Kleene comparison semantics (the row drops);
- string params are escaped such that quotes / SQL fragments /
  mustache syntax inside the VALUE can never change query shape
  (injection attempts come back as data).

Each random predicate tree is emitted twice: once as a mustache
template rendered by ``render_query`` and executed on DuckDB, once
through the Kleene evaluator below; WHERE-result id sets must match.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from chewdata_spark.sources.jdbc import Identifier, render_query, sql_literal

ROWS = [
    # (id, val, name) — NULLs in both, duplicates, nasty strings
    (0, 5, "alpha"),
    (1, None, "beta"),
    (2, 17, None),
    (3, -3, "o'hara"),
    (4, 5, "a''b"),
    (5, 0, ""),
    (6, 42, "'; DROP TABLE t; --"),
    (7, None, None),
    (8, 17, "{{ p0 }}"),
    (9, 100, "héllo\nworld"),
    (10, -100, "%_"),
    (11, 5, "alpha"),
]

INT_POOL = [5, 17, 0, -3, 42, 100, -100, 7, None, None]
STR_POOL = [
    "alpha", "o'hara", "a''b", "", "'; DROP TABLE t; --", "{{ p0 }}",
    "héllo\nworld", "%_", "nope", None, None,
]


# ---------------------------------------------------------------- #
# predicate AST: generate once, render AND evaluate from the tree  #
# ---------------------------------------------------------------- #

def _gen_pred(rng: random.Random, depth: int, params: dict):
    r = rng.random()
    if depth > 0 and r < 0.45:
        kind = rng.choice(["and", "or", "not"])
        if kind == "not":
            return ("not", _gen_pred(rng, depth - 1, params))
        return (kind, _gen_pred(rng, depth - 1, params),
                _gen_pred(rng, depth - 1, params))
    if r < 0.55:
        col = rng.choice(["id", "val", "name"])
        return ("isnull", col, rng.random() < 0.5)
    col = rng.choice(["id", "val", "name"])
    if col == "name":
        op = rng.choice(["=", "!=", "<>"])
        v = rng.choice(STR_POOL)
    else:
        op = rng.choice(["=", "!=", "<>", "<", "<=", ">", ">="])
        v = rng.choice(INT_POOL)
    pname = f"p{len(params)}"
    params[pname] = v
    # hole-first form dodges the IS-NULL rewrite by construction: the
    # renderer must then emit a literal NULL with strict semantics
    col_first = rng.random() < 0.8
    return ("cmp", col, op, pname, col_first)


def _to_sql(p) -> str:
    k = p[0]
    if k == "not":
        return f"NOT ({_to_sql(p[1])})"
    if k in ("and", "or"):
        return f"({_to_sql(p[1])} {k.upper()} {_to_sql(p[2])})"
    if k == "isnull":
        return f'"{p[1]}" IS {"NOT " if p[2] else ""}NULL'
    _, col, op, pname, col_first = p
    if col_first:
        return f'"{col}" {op} {{{{ {pname} }}}}'
    return f'{{{{ {pname} }}}} {op} "{col}"'


def _cmp3(x, op, v):
    if x is None or v is None:
        return None
    if op == "=":
        return x == v
    if op in ("!=", "<>"):
        return x != v
    if op == "<":
        return x < v
    if op == "<=":
        return x <= v
    if op == ">":
        return x > v
    return x >= v


def _eval3(p, row, params):
    k = p[0]
    if k == "not":
        v = _eval3(p[1], row, params)
        return None if v is None else not v
    if k == "and":
        a, b = _eval3(p[1], row, params), _eval3(p[2], row, params)
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True
    if k == "or":
        a, b = _eval3(p[1], row, params), _eval3(p[2], row, params)
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False
    cols = {"id": row[0], "val": row[1], "name": row[2]}
    if k == "isnull":
        x = cols[p[1]]
        return (x is not None) if p[2] else (x is None)
    _, col, op, pname, col_first = p
    x, v = cols[col], params[pname]
    if v is None and col_first and op in ("=", "!=", "<>"):
        # the direct equality form rewrites to IS [NOT] NULL
        return (x is not None) if op in ("!=", "<>") else (x is None)
    # hole-first SQL puts the PARAM on the left of the operator
    return _cmp3(x, op, v) if col_first else _cmp3(v, op, x)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute('CREATE TABLE t ("id" INTEGER, "val" INTEGER, "name" VARCHAR)')
    c.executemany("INSERT INTO t VALUES (?, ?, ?)", ROWS)
    yield c
    c.close()


def test_fuzz_render_query_matches_kleene_reference(con):
    rng = random.Random(8)
    for case in range(250):
        params: dict = {}
        pred = _gen_pred(rng, 2, params)
        template = (
            'SELECT "id" FROM {{ tbl }} WHERE ' + _to_sql(pred)
            + ' ORDER BY "id"'
        )
        params["tbl"] = Identifier("t")
        sql = render_query(template, params)
        got = [r[0] for r in con.sql(sql).fetchall()]
        want = [row[0] for row in ROWS if _eval3(pred, row, params) is True]
        assert got == want, (case, template, params, sql, got, want)


def test_fuzz_sql_literal_roundtrips_through_duckdb(con):
    rng = random.Random(9)
    pool = [v for v in INT_POOL + STR_POOL if v is not None] + [
        1.5, -2.25, 1e308, True, False, 2**62,
        "tab\there", "back\\slash", "semi;colon", "dollar$quote$",
    ]
    for case in range(120):
        v = rng.choice(pool)
        got = con.sql(f"SELECT {sql_literal(v)} AS v").fetchone()[0]
        if isinstance(v, bool):
            assert got is v, (case, v, got)
        elif isinstance(v, (int, float)):
            assert got == v, (case, v, got)
        else:
            assert got == v, (case, v, got)


def test_sql_literal_rejects_unrenderable():
    with pytest.raises(ValueError):
        sql_literal(float("nan"))
    with pytest.raises(ValueError):
        sql_literal(float("inf"))
    with pytest.raises(ValueError):
        sql_literal("nul\x00byte")
    with pytest.raises(ValueError):
        Identifier("t; DROP").name


def test_injection_attempts_stay_data(con):
    # a hostile string param must come back as data, never alter shape
    sql = render_query(
        'SELECT "id" FROM t WHERE "name" = {{ p }} ORDER BY "id"',
        {"p": "'; DROP TABLE t; --"},
    )
    assert [r[0] for r in con.sql(sql).fetchall()] == [6]
    # mustache syntax inside a VALUE is not re-expanded
    sql2 = render_query(
        'SELECT "id" FROM t WHERE "name" = {{ p0 }} ORDER BY "id"',
        {"p0": "{{ p0 }}"},
    )
    assert [r[0] for r in con.sql(sql2).fetchall()] == [8]
