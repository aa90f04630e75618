"""Connector-mapping semantics (no external services needed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chewdata_spark.sources.jdbc import Identifier, render_query, sql_literal
from chewdata_spark.sources.mongo import mongo_filter_to_column, mongo_projection_to_columns
from chewdata_spark.tables import load_table


class TestRenderQuery:
    def test_typed_literals(self):
        q = render_query(
            'SELECT * FROM t WHERE "a" = {{ a }} AND b = {{ b }} AND c = {{ c }}',
            {"a": 10, "b": "x'; DROP TABLE t;--", "c": True},
        )
        assert q == 'SELECT * FROM t WHERE "a" = 10 AND b = \'x\'\'; DROP TABLE t;--\' AND c = TRUE'

    def test_is_null_rewrite(self):
        q = render_query('SELECT * FROM t WHERE "a" = {{ a }} AND b != {{ b }}', {"a": None, "b": None})
        assert q == 'SELECT * FROM t WHERE "a" IS NULL AND b IS NOT NULL'

    def test_identifier_passthrough(self):
        q = render_query("SELECT * FROM {{ collection }} WHERE id = {{ id }}",
                         {"collection": Identifier("orders"), "id": 7})
        assert q == "SELECT * FROM orders WHERE id = 7"

    def test_identifier_injection_rejected(self):
        with pytest.raises(ValueError):
            render_query("SELECT * FROM {{ t }}", {"t": Identifier("x; DROP TABLE y")})

    def test_missing_param_raises(self):
        with pytest.raises(KeyError):
            render_query("SELECT {{ nope }}", {})

    def test_literal_types(self):
        assert sql_literal(None) == "NULL"
        assert sql_literal(1.5) == "1.5"
        assert sql_literal("o'brien") == "'o''brien'"


class TestMongoFilter:
    def _orders(self, spark, sf_dir):
        return load_table(spark, sf_dir, "orders")

    def test_implicit_and_and_comparison(self, spark, sf_dir):
        orders = self._orders(spark, sf_dir)
        col = mongo_filter_to_column({"o_orderstatus": "F", "o_totalprice": {"$gt": 100000}})
        got = orders.filter(col).count()
        want = orders.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000)).count()
        assert got == want > 0

    def test_or_in_regex(self, spark, sf_dir):
        orders = self._orders(spark, sf_dir)
        col = mongo_filter_to_column(
            {"$or": [{"o_orderpriority": {"$in": ["1-URGENT", "2-HIGH"]}},
                     {"o_orderpriority": {"$regex": "^5-"}}]}
        )
        got = orders.filter(col).count()
        want = orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") | F.col("o_orderpriority").rlike("^5-")
        ).count()
        assert got == want > 0

    def test_ne_and_exists(self, spark, sf_dir):
        orders = self._orders(spark, sf_dir)
        n_all = orders.count()
        ne = orders.filter(mongo_filter_to_column({"o_orderstatus": {"$ne": "F"}})).count()
        eq = orders.filter(mongo_filter_to_column({"o_orderstatus": "F"})).count()
        assert ne + eq == n_all
        assert orders.filter(mongo_filter_to_column({"o_orderkey": {"$exists": True}})).count() == n_all

    def test_unsupported_operator_raises(self):
        with pytest.raises(ValueError):
            mongo_filter_to_column({"a": {"$elemMatch": {}}})

    def test_projection(self):
        assert mongo_projection_to_columns({"a": 1, "b": 0, "c": 1}) == ["a", "c"]
