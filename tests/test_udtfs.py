"""SQL-callable UDTF surface (LATERAL fan-out operators)."""

from __future__ import annotations

import json

import pytest

from chewdata_spark.functions.udtfs import register_udtfs


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    register_udtfs(spark)


def test_chunk_text_udtf_matches_dataframe_twin(spark):
    from chewdata_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(120))), (2, "short doc")],
        "doc_id int, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    sql_rows = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens "
        "FROM udtf_docs d, LATERAL chunk_text(d.text, 50, 10) c"
    ).collect()
    df_rows = chunk_documents(docs, "doc_id", "text", chunk_size=50, overlap=10).collect()
    key = lambda r: (r.doc_id, r.chunk_idx)
    assert sorted([(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in sql_rows]) == \
           sorted([(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in df_rows])


def test_token_counts_udtf(spark):
    df = spark.createDataFrame([(1, "a b a c B")], "id int, text string")
    df.createOrReplaceTempView("udtf_tok")
    rows = spark.sql(
        "SELECT t.token, t.n FROM udtf_tok d, LATERAL token_counts(d.text) t"
    ).collect()
    assert {(r.token, r.n) for r in rows} == {("a", 2), ("b", 2), ("c", 1)}


def test_json_array_explode_udtf(spark):
    df = spark.createDataFrame(
        [('[{"x":1},{"x":2}]',), ('{"x":3}',), (None,)], "j string"
    )
    df.createOrReplaceTempView("udtf_json")
    rows = spark.sql(
        "SELECT e.element FROM udtf_json d, LATERAL json_array_explode(d.j) e"
    ).collect()
    got = sorted(json.loads(r.element)["x"] for r in rows)
    assert got == [1, 2, 3]
