"""Property-based tests (hypothesis) for the injection-prone surfaces."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chewdata_spark.sources.jdbc import render_query, sql_literal


@st.composite
def scalars(draw):
    return draw(
        st.one_of(
            st.none(),
            st.booleans(),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=60),
        )
    )


class TestSqlLiteralRoundTrip:
    """A rendered literal must parse back to exactly the python value —
    whatever quotes/backslashes/unicode the value contains."""

    @settings(max_examples=200, deadline=None)
    @given(v=scalars())
    def test_duckdb_round_trip(self, v):
        if isinstance(v, str) and "\x00" in v:
            with pytest.raises(ValueError):
                sql_literal(v)
            return
        lit = sql_literal(v)
        got = duckdb.sql(f"SELECT {lit} AS v").fetchone()[0]
        if v is None or isinstance(v, bool) or isinstance(v, int):
            assert got == v
        else:
            assert got == str(v)

    @settings(max_examples=100, deadline=None)
    @given(s=st.text(max_size=40).filter(lambda x: "\x00" not in x))
    def test_no_injection_breakout(self, s):
        """The value lands in ONE string literal: the query stays a
        single SELECT with our predicate shape, whatever s contains."""
        q = render_query("SELECT * FROM t WHERE c = {{ v }}", {"v": s})
        assert q.startswith("SELECT * FROM t WHERE c = ")
        # parseable as a single statement referencing only table t
        con = duckdb.connect()
        con.execute("CREATE TABLE t (c VARCHAR)")
        con.execute("INSERT INTO t VALUES (?)", [s])
        assert con.sql(q).fetchall() == [(s,)]


class TestTemplateArithmetic:
    """Compiled template arithmetic == python arithmetic."""

    @settings(max_examples=30, deadline=None)
    @given(
        a=st.integers(min_value=-10**6, max_value=10**6),
        b=st.integers(min_value=1, max_value=1000),
    )
    def test_arithmetic_matches_python(self, spark, a, b):
        from chewdata_spark.operators.transformer import template_to_column

        df = spark.createDataFrame([(a, b)], "x: long, y: long")
        col = template_to_column("{{ input.x * 3 + input.y }}")
        assert df.select(col.alias("r")).collect()[0].r == a * 3 + b


@pytest.fixture(scope="module")
def spark_module(spark):
    return spark


# -- value-level object filter properties ------------------------------------

json_scalars = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)


class TestValueFilterProperties:
    @settings(max_examples=150, deadline=None)
    @given(v=json_values)
    def test_replace_key_identity_pattern(self, v):
        """A never-matching pattern leaves the value unchanged."""
        from chewdata_spark.functions.objects import value_replace_key

        assert value_replace_key(v, r"\bNEVER_MATCHES_XYZ\b", "zzz") == v

    @settings(max_examples=150, deadline=None)
    @given(v=json_values)
    def test_merge_replace_identity(self, v):
        """x merge_replace x == x (idempotent on equal values)."""
        from chewdata_spark.functions.objects import value_merge_replace

        assert value_merge_replace(v, v) == v

    @settings(max_examples=150, deadline=None)
    @given(a=json_values, b=json_values)
    def test_merge_replace_b_wins_on_scalars(self, a, b):
        """For scalar b, merge_replace always yields b."""
        from chewdata_spark.functions.objects import value_merge_replace

        if not isinstance(b, (dict, list)):
            assert value_merge_replace(a, b) == b

    @settings(max_examples=150, deadline=None)
    @given(v=json_values)
    def test_depth_non_negative_and_consistent(self, v):
        from chewdata_spark.functions.objects import value_depth

        d = value_depth(v)
        assert d >= 0
        if isinstance(v, (dict, list)) and v:
            assert d == 1 + max(
                value_depth(x) for x in (v.values() if isinstance(v, dict) else v)
            )

    @settings(max_examples=100, deadline=None)
    @given(
        v=st.dictionaries(st.text(min_size=1, max_size=6), json_scalars,
                          min_size=1, max_size=5)
    )
    def test_keys_values_zip_to_items(self, v):
        from chewdata_spark.functions.objects import value_keys, value_values

        assert dict(zip(value_keys(v), value_values(v))) == v

    @settings(max_examples=100, deadline=None)
    @given(v=json_values)
    def test_search_root_returns_value(self, v):
        from chewdata_spark.functions.objects import value_search

        assert value_search(v, "/") == v
