"""Time-series resampling queries over `events`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chewdata_spark.operators.timeseries import resample_forward_fill
from chewdata_spark.tables import load_table


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled per-user series: event counts with empty
    buckets emitted and the last value forward-filled across gaps."""
    events = load_table(spark, sf_dir, "events")
    return resample_forward_fill(
        events, "user_id", "ts", "value", interval="1 hour", tiebreak_col="event_id"
    )


EVENTS_GAP_FILL_SQL = """
WITH ranked AS (
    SELECT user_id, date_trunc('hour', ts) AS bucket, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
),
b AS (
    SELECT user_id, bucket, COUNT(*) AS n_events,
           MAX(CASE WHEN rn = 1 THEN value END) AS last_value
    FROM ranked GROUP BY 1, 2
),
s AS (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM b GROUP BY 1),
g AS (SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket FROM s)
SELECT g.user_id, g.bucket,
       COALESCE(b.n_events, 0) AS n_events,
       last_value(b.last_value IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.bucket) AS filled_value
FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.bucket = b.bucket
"""


QUERIES = {"events_gap_fill": events_gap_fill}
ORACLES = {"events_gap_fill": EVENTS_GAP_FILL_SQL}
