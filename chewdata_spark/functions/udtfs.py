"""Registered Python UDTFs — the SQL-callable fan-out surface.

The reference's only UDTF-shaped operator is the transformer's array
fan-out (src/step/transformer.rs:209-220: a root action rendering an
array emits one record per element).  Spark 4 exposes exactly this
shape as Python UDTFs usable from SQL via LATERAL joins, so pipelines
written as `spark.sql` strings get the same operators the DataFrame
API has:

    SELECT d.doc_id, c.* FROM documents d,
    LATERAL chunk_text(d.text, 50, 10) c

UDTF evals run row-at-a-time in Python — fine for genuinely
irregular fan-out, but the DataFrame twins (`operators.text.
chunk_documents`, posexplode-based) stay the hot path: they run in
whole-stage codegen.  Each class documents its vectorized twin.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
class ChunkTextUDTF:
    """Overlapping word-window chunks; twin of
    :func:`chewdata_spark.operators.text.chunk_documents` (same
    windowing: step = chunk_size - overlap, every doc yields ≥1 chunk).
    """

    def eval(self, text: str, chunk_size: int = 50, overlap: int = 10):
        if text is None:
            return
        words = text.split()
        step = max(1, chunk_size - overlap)
        n_chunks = max(1, -(-(len(words) - overlap) // step))
        for i in range(n_chunks):
            chunk = words[i * step : i * step + chunk_size]
            yield i, " ".join(chunk), len(chunk)


@udtf(returnType="token string, n int")
class TokenCountsUDTF:
    """Per-token counts within one document (fan-out of the
    bag-of-words); DataFrame twin: explode(split(text)) + groupBy."""

    def eval(self, text: str):
        if text is None:
            return
        counts: dict[str, int] = {}
        for tok in text.lower().split():
            counts[tok] = counts.get(tok, 0) + 1
        for tok in sorted(counts):
            yield tok, counts[tok]


@udtf(returnType="element string")
class JsonArrayExplodeUDTF:
    """Root-action array fan-out as a SQL table function (the
    reference's transformer flatMap): a JSON array string becomes one
    row per element (each re-encoded as JSON text)."""

    def eval(self, json_text: str):
        import json

        if json_text is None:
            return
        try:
            v = json.loads(json_text)
        except ValueError:
            return
        if isinstance(v, list):
            for item in v:
                yield (json.dumps(item, ensure_ascii=False),)
        else:
            yield (json.dumps(v, ensure_ascii=False),)


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL use (idempotent per session)."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)
    spark.udtf.register("token_counts", TokenCountsUDTF)
    spark.udtf.register("json_array_explode", JsonArrayExplodeUDTF)
