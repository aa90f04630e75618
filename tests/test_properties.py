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
