"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no cross-batch state at all (its streams are plain
channels).  For a streaming training-data pipeline the canonical
stateful operator is **streaming dedup**: emit a record the first time
its key is seen, drop every later occurrence, across micro-batches.
Per-key state is one boolean + first-seen timestamp; state-store growth
is bounded by key cardinality (use a TTL timeout in production for
unbounded key spaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def stream_dedup(
    stream: DataFrame, key_cols: list[str], *, ttl_ms: int | None = None
) -> DataFrame:
    """Keep only the first-ever record per key across the whole stream.

    groupBy(key) → applyInPandasWithState with a seen-flag per key:
    the first batch containing a key emits exactly one row (the min by
    arrival order inside the batch); subsequent batches emit none.

    ``ttl_ms`` bounds state for unbounded key spaces: a key untouched
    for the TTL is evicted (processing-time timeout), so a duplicate
    arriving after eviction is treated as first-seen again — the
    standard state/correctness tradeoff; size the TTL to the dedup
    horizon you actually need.
    """
    out_schema: StructType = stream.schema
    use_ttl = ttl_ms is not None

    def dedup_fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # TTL fired with no new data for this key — drop the state
            state.remove()
            return
        if state.exists:
            # key already emitted in an earlier batch — consume, emit
            # nothing, and push the eviction horizon out
            for _ in pdfs:
                pass
            if use_ttl:
                state.setTimeoutDuration(ttl_ms)
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        state.update((True,))
        if use_ttl:
            state.setTimeoutDuration(ttl_ms)
        if first is not None:
            yield first

    return stream.groupBy(*key_cols).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if use_ttl else GroupStateTimeout.NoTimeout
        ),
    )
