"""Time-series resampling queries over `events`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly OHLC resample (open/high/low/close of `value`):
    one window (rank + partition count share the same sort) and one
    aggregation — a single shuffle on (event_type, bucket).  First/last
    tie-break on (ts, event_id) is total, so the result is
    deterministic under any partitioning."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    wp = Window.partitionBy("event_type", "bucket")
    w = wp.orderBy("ts", "event_id")
    ranked = b.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(wp)
    )
    return ranked.groupBy("event_type", "bucket").agg(
        F.round(F.max(F.when(F.col("rn") == 1, F.col("value"))), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(
            F.max(F.when(F.col("rn") == F.col("cnt"), F.col("value"))), 6
        ).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENTS_OHLC_SQL = """
WITH r AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type, date_trunc('hour', ts)) AS cnt
    FROM events
)
SELECT event_type, bucket,
       ROUND(MAX(CASE WHEN rn = 1 THEN value END), 6) AS open,
       ROUND(MAX(value), 6) AS high,
       ROUND(MIN(value), 6) AS low,
       ROUND(MAX(CASE WHEN rn = cnt THEN value END), 6) AS close,
       COUNT(*) AS n_events
FROM r
GROUP BY event_type, bucket
"""


def events_rolling_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-24-hour rolling sum of `value` — a RANGE-frame
    window on microsecond epoch (one shuffle on user_id; the range
    frame is a single ordered sweep per partition, no self-join)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-86_400_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 6).alias("rolling_24h_sum"),
    )


EVENTS_ROLLING_SQL = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 86400 SECONDS PRECEDING
                                        AND CURRENT ROW), 6) AS rolling_24h_sum
FROM events
"""


def events_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly flagging: events whose `value` deviates ≥ 3 sample
    standard deviations from their event_type's mean.  Two passes over
    one aggregation: per-type stats broadcast back (AQE) — no window
    over the raw events."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("_mu"), F.stddev_samp("value").alias("_sd")
    )
    z = (F.col("value") - F.col("_mu")) / F.col("_sd")
    return (
        ev.join(stats, "event_type")
        .filter(F.abs(z) >= 3.0)
        .select("event_id", "event_type", F.round(z, 6).alias("zscore"))
    )


EVENTS_ZSCORE_SQL = """
WITH stats AS (
    SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
    FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, ROUND((value - mu) / sd, 6) AS zscore
FROM events e JOIN stats USING (event_type)
WHERE ABS((value - mu) / sd) >= 3.0
"""


QUERIES = {
    "events_gap_fill": events_gap_fill,
    "events_ohlc_hourly": events_ohlc_hourly,
    "events_rolling_24h": events_rolling_24h,
    "events_value_zscore": events_value_zscore,
}
ORACLES = {
    "events_gap_fill": EVENTS_GAP_FILL_SQL,
    "events_ohlc_hourly": EVENTS_OHLC_SQL,
    "events_rolling_24h": EVENTS_ROLLING_SQL,
    "events_value_zscore": EVENTS_ZSCORE_SQL,
}


def events_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type SLIDING-window rate (1-hour windows every 15 minutes):
    the overlap factor is fixed (4 windows per event), so the explode
    is a bounded map-side fan-out into ONE (type, window) shuffle with
    map-side partial aggregation — Spark's `window()` generates exactly
    this plan; no self-join, no per-window rescan."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy("event_type", w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("win_start"),
            "n_events",
            "sum_value",
        )
    )


# every event belongs to exactly 4 sliding windows: starts at
# bucket15(ts) - k*15min for k in 0..3 (epoch-aligned boundaries agree
# between Spark's 1970 origin and DuckDB's 2000 origin for 15-minute
# buckets — both are integer multiples apart)
EVENTS_SLIDING_SQL = """
WITH ex AS (
    SELECT event_type, value,
           time_bucket(INTERVAL '15 minutes', ts)
             - k.k * INTERVAL '15 minutes' AS win_start
    FROM events, (SELECT unnest(generate_series(0, 3)) AS k) k
)
SELECT event_type, CAST(win_start AS TIMESTAMP) AS win_start,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM ex
GROUP BY 1, 2
"""

QUERIES["events_sliding_rate"] = events_sliding_rate
ORACLES["events_sliding_rate"] = EVENTS_SLIDING_SQL


def events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier clamping (winsorization): per-type p1/p99 exact
    percentiles clamp every event's `value` — the standard robustness
    preprocessing before statistical features.  One stats aggregation
    broadcast back onto one corpus pass (AQE); clamped values round to
    6 dp so both engines agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.01), F.lit(0.99)))
    stats = ev.groupBy("event_type").agg(
        F.element_at(pct, 1).alias("_lo"), F.element_at(pct, 2).alias("_hi")
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("_lo")), F.col("_hi"))
    return ev.join(stats, "event_type").select(
        "event_id",
        "event_type",
        F.round(clamped, 6).alias("value_winsorized"),
        (F.col("value") != clamped).alias("was_clamped"),
    )


EVENTS_WINSORIZE_SQL = """
WITH stats AS (
    SELECT event_type,
           quantile_cont(value, 0.01) AS lo,
           quantile_cont(value, 0.99) AS hi
    FROM events GROUP BY event_type
)
SELECT event_id, e.event_type,
       ROUND(LEAST(GREATEST(value, lo), hi), 6) AS value_winsorized,
       (value <> LEAST(GREATEST(value, lo), hi)) AS was_clamped
FROM events e JOIN stats USING (event_type)
"""

QUERIES["events_winsorized"] = events_winsorized
ORACLES["events_winsorized"] = EVENTS_WINSORIZE_SQL


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) with counts — the behavioral
    model behind next-action prediction and funnel design.  One lag
    window keyed on user_id (bounded partitions) and one
    (prev, next)-keyed count; probabilities divide by a prev-keyed
    window sum — |types|² rows, no second scan."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )


EVENT_TRANSITIONS_SQL = """
WITH steps AS (
    SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
           event_type AS next_type
    FROM events
),
counts AS (
    SELECT prev_type, next_type, COUNT(*) AS n
    FROM steps WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM counts
"""

QUERIES["event_transition_matrix"] = event_transition_matrix
ORACLES["event_transition_matrix"] = EVENT_TRANSITIONS_SQL


def events_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of `value`: exact p10..p90 edges
    from ONE aggregation broadcast back, bucket = 1 + #edges below the
    value — a pure projection, NO global sort (ntile would single-
    partition the corpus; this is the scale-correct equi-depth shape).
    Returns per-bucket count and value span."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile(
        "value", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    )
    edges = ev.agg(pct.alias("_edges"))
    bucket = F.lit(1)
    for i in range(9):
        bucket = bucket + F.when(
            F.col("value") > F.element_at("_edges", i + 1), 1
        ).otherwise(0)
    return (
        ev.crossJoin(F.broadcast(edges))
        .select(bucket.cast("int").alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


HISTOGRAM_SQL = """
WITH edges AS (
    SELECT [quantile_cont(value, 0.1), quantile_cont(value, 0.2),
            quantile_cont(value, 0.3), quantile_cont(value, 0.4),
            quantile_cont(value, 0.5), quantile_cont(value, 0.6),
            quantile_cont(value, 0.7), quantile_cont(value, 0.8),
            quantile_cont(value, 0.9)] AS e
    FROM events
),
b AS (
    SELECT CAST(1 + (CASE WHEN value > e[1] THEN 1 ELSE 0 END)
                  + (CASE WHEN value > e[2] THEN 1 ELSE 0 END)
                  + (CASE WHEN value > e[3] THEN 1 ELSE 0 END)
                  + (CASE WHEN value > e[4] THEN 1 ELSE 0 END)
                  + (CASE WHEN value > e[5] THEN 1 ELSE 0 END)
                  + (CASE WHEN value > e[6] THEN 1 ELSE 0 END)
                  + (CASE WHEN value > e[7] THEN 1 ELSE 0 END)
                  + (CASE WHEN value > e[8] THEN 1 ELSE 0 END)
                  + (CASE WHEN value > e[9] THEN 1 ELSE 0 END) AS INT) AS bucket,
           value
    FROM events, edges
)
SELECT bucket, COUNT(*) AS n,
       ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi
FROM b GROUP BY bucket
"""

QUERIES["events_histogram_equidepth"] = events_histogram_equidepth
ORACLES["events_histogram_equidepth"] = HISTOGRAM_SQL


def events_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: event counts by ISO weekday × hour — the
    operational view of traffic seasonality.  One projection + one
    (dow, hour) aggregation (168 groups max)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            (F.weekday("ts") + 1).alias("isodow"),
            F.hour("ts").alias("hour"),
        )
        .groupBy("isodow", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


HEATMAP_SQL = """
SELECT CAST(isodow(ts) AS INT) AS isodow, CAST(hour(ts) AS INT) AS hour,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""

QUERIES["events_heatmap_dow_hour"] = events_heatmap_dow_hour
ORACLES["events_heatmap_dow_hour"] = HEATMAP_SQL


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via the Median Absolute Deviation: per
    event_type, flag values with |x − median| > 3·1.4826·MAD — the
    outlier rule that (unlike z-scores) is not itself corrupted by the
    outliers it hunts.  Two per-type aggregations (median, then MAD of
    the deviations) broadcast back; the flag compares against
    6-dp-ROUNDED med/MAD (round-before-decide) so both engines agree.
    Exact medians keep the oracle bit-replayable; at 100 TB swap in
    approx_percentile (same plan shape, documented trade)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.round(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6
        ).alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type").withColumn(
        "_anom",
        F.when(
            F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"), 1
        ).otherwise(0),
    )
    return flagged.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_anom").alias("n_anomalies"),
    )


EVENTS_MAD_SQL = """
WITH med AS (
    SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
    FROM events GROUP BY event_type
), dev AS (
    SELECT e.event_type, e.value, m.med
    FROM events e JOIN med m USING (event_type)
), mad AS (
    SELECT event_type, ROUND(quantile_cont(abs(value - med), 0.5), 6) AS mad
    FROM dev GROUP BY event_type
)
SELECT d.event_type, d.med, m.mad,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN abs(d.value - d.med) > 3 * 1.4826 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1, 2, 3
"""

QUERIES["events_anomaly_mad"] = events_anomaly_mad
ORACLES["events_anomaly_mad"] = EVENTS_MAD_SQL


def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of `value` per event_type from the bounded-state
    equal-width histogram sketch (operators/timeseries.py::
    sketch_quantiles) — the deterministic, mergeable, oracle-checkable
    scale path that replaces exact per-key percentiles at 100 TB."""
    from chewdata_spark.operators.timeseries import sketch_quantiles

    ev = load_table(spark, sf_dir, "events")
    return sketch_quantiles(
        ev, "event_type", "value", probs=(0.5, 0.95, 0.99), bins=1024
    )


def _sketch_q_sql(p: float) -> str:
    return f"""SELECT c.key, CAST({p} AS DOUBLE) AS p,
       ROUND(r.lo + (r.hi - r.lo) / 1024.0
             * (c.b + ({p} * r.n - (c.cum - c.c)) * 1.0 / c.c), 6) AS est,
       r.n
FROM (SELECT cum.key, MIN(b) AS b
      FROM cum JOIN rng ON cum.key = rng.key
      WHERE cum.cum >= {p} * rng.n GROUP BY cum.key) m
JOIN cum c ON c.key = m.key AND c.b = m.b
JOIN rng r ON r.key = m.key"""


QUANTILE_SKETCH_SQL = f"""
WITH vals AS (
    SELECT event_type AS key, value AS v FROM events WHERE value IS NOT NULL
), rng AS (
    SELECT key, MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n
    FROM vals GROUP BY 1
), binned AS (
    SELECT vals.key,
           CASE WHEN hi = lo THEN 0
                ELSE LEAST(GREATEST(CAST(FLOOR((v - lo) / ((hi - lo) / 1024)) AS INT), 0), 1023)
           END AS b,
           COUNT(*) AS c
    FROM vals JOIN rng ON vals.key = rng.key
    GROUP BY 1, 2
), cum AS (
    SELECT key, b, c, SUM(c) OVER (PARTITION BY key ORDER BY b) AS cum
    FROM binned
)
{_sketch_q_sql(0.5)}
UNION ALL
{_sketch_q_sql(0.95)}
UNION ALL
{_sketch_q_sql(0.99)}
"""

QUERIES["events_quantile_sketch"] = events_quantile_sketch
ORACLES["events_quantile_sketch"] = QUANTILE_SKETCH_SQL


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift monitor per event_type: one-sided cumulative sums
    S⁺/S⁻ of standardized deviations (k = 0.5 allowance) flag the
    points where the value stream's mean has shifted — the classic
    sequential change detector a pipeline runs over ingest metrics.
    Per-type stats broadcast back; the recursion Sₜ = max(0, Sₜ₋₁ + zₜ
    − k) is NOT window-expressible, but on the deviation stream it
    equals prefix(t) − min over s ≤ t of prefix(s) (running-min
    identity), so it computes as two per-type running windows ordered
    by (ts, event_id) — bounded per type like every rolling query here.
    Output: per type, the count of alarm points (S⁺ or S⁻ > h = 4) and
    the max excursions, 6-dp rounded."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("_mu"), F.stddev_pop("value").alias("_sd")
    )
    z = (F.col("value") - F.col("_mu")) / F.col("_sd")
    base = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        F.round(z - 0.5, 6).alias("dev_up"),
        F.round(-z - 0.5, 6).alias("dev_dn"),
    )
    # S⁺ₜ = prefixₜ − min(0, running-min of prefix): the running-min
    # identity that turns the max(0, ·) recursion into two windows over
    # the SAME (ts, event_id) order
    w = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w2 = w
    cum = base.select(
        "event_type",
        "ts",
        "event_id",
        F.sum("dev_up").over(w).alias("p_up"),
        F.sum("dev_dn").over(w).alias("p_dn"),
    ).select(
        "event_type",
        (F.col("p_up") - F.least(F.lit(0.0), F.min("p_up").over(w2))).alias("s_up"),
        (F.col("p_dn") - F.least(F.lit(0.0), F.min("p_dn").over(w2))).alias("s_dn"),
    )
    return cum.groupBy("event_type").agg(
        F.sum(
            F.when((F.col("s_up") > 4) | (F.col("s_dn") > 4), 1).otherwise(0)
        ).alias("n_alarms"),
        F.round(F.max("s_up"), 6).alias("max_s_up"),
        F.round(F.max("s_dn"), 6).alias("max_s_dn"),
    )


EVENTS_CUSUM_SQL = """
WITH stats AS (
    SELECT event_type, AVG(value) AS mu, stddev_pop(value) AS sd
    FROM events GROUP BY event_type
), base AS (
    SELECT e.event_type, e.ts, e.event_id,
           ROUND((value - mu) / sd - 0.5, 6) AS dev_up,
           ROUND(-((value - mu) / sd) - 0.5, 6) AS dev_dn
    FROM events e JOIN stats USING (event_type)
), cum AS (
    SELECT event_type, ts, event_id,
           SUM(dev_up) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS p_up,
           SUM(dev_dn) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS p_dn
    FROM base
), s AS (
    SELECT event_type,
           p_up - LEAST(0.0, MIN(p_up) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))
               AS s_up,
           p_dn - LEAST(0.0, MIN(p_dn) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))
               AS s_dn
    FROM cum
)
SELECT event_type,
       CAST(SUM(CASE WHEN s_up > 4 OR s_dn > 4 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_alarms,
       ROUND(MAX(s_up), 6) AS max_s_up,
       ROUND(MAX(s_dn), 6) AS max_s_dn
FROM s GROUP BY event_type
"""

QUERIES["events_cusum_drift"] = events_cusum_drift
ORACLES["events_cusum_drift"] = EVENTS_CUSUM_SQL


def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event value — the
    monitoring smoother (alpha = 0.4) behind drift dashboards, computed
    WITHOUT the sequential recurrence: weights below 1e-9 after ~40
    days mean a 60-day truncation is exact to far beyond the 4-dp
    output rounding, so EWMA becomes a BANDED day-grain self-join
    (day_diff ∈ [0, 59]) + one weighted sum — embarrassingly parallel
    where the recurrence is inherently serial, and engine-replayable
    (a recursive formulation would pin evaluation order).  Day grain
    first: the join touches ~days × 60 rows regardless of event
    volume."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    a = daily.alias("a")
    b = daily.alias("b")
    d = F.datediff(F.col("a.day"), F.col("b.day"))
    w = F.pow(F.lit(0.6), d)
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (d >= 0) & (d <= 59),
    )
    return (
        pairs.groupBy(F.col("a.day").alias("day"), F.col("a.event_type").alias("event_type"))
        .agg(
            F.round(
                F.sum(F.col("b.v") * w * 0.4) / F.sum(w * 0.4), 4
            ).alias("ewma"),
            F.count(F.lit(1)).cast("int").alias("n_terms"),
        )
    )


EVENTS_EWMA_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, event_type, ROUND(SUM(value), 6) AS v
    FROM events GROUP BY 1, 2
)
SELECT a.day, a.event_type,
       ROUND(SUM(b.v * POWER(0.6, date_diff('day', b.day, a.day)) * 0.4)
             / SUM(POWER(0.6, date_diff('day', b.day, a.day)) * 0.4), 4) AS ewma,
       CAST(COUNT(*) AS INT) AS n_terms
FROM daily a JOIN daily b
  ON b.event_type = a.event_type
 AND date_diff('day', b.day, a.day) BETWEEN 0 AND 59
GROUP BY 1, 2
"""

QUERIES["events_ewma_daily"] = events_ewma_daily
ORACLES["events_ewma_daily"] = EVENTS_EWMA_SQL


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily mean event
    value (trend + day-of-week seasonal + remainder) — the capacity-
    planning view behind weekly-traffic dashboards (reference models
    daily rollups in examples/time_series.json; the decomposition
    itself is a Spark-native extension).

    Determinism device: the daily mean is computed as an exact BIGINT
    cent-sum divided once (`sum(round(value*100))/(100*count)`), so the
    corpus-sized aggregation is order-independent by type; every
    downstream float sum (7-term centered moving average, per-weekday
    seasonal means over ~day_count/7 terms, the 7-term centering mean)
    is tiny and 6-dp-rounded on both engines — the established ≤64-term
    device.  Scale shape: ONE map-side-combinable groupBy collapses any
    event volume to day grain; the unpartitioned windows after it ride
    a relation bounded by calendar days (≤ tens of thousands of rows at
    100 TB), the same boundedness argument as events_ewma_daily."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            / (F.count(F.lit(1)) * 100.0)
        ).alias("daily_value")
    )
    daily = daily.withColumn(
        "dnum", F.datediff("day", F.lit("2024-01-01").cast("date"))
    )
    # centered 7-day moving average, defined only on full windows
    w = Window.orderBy("dnum").rangeBetween(-3, 3)
    tr = daily.withColumn(
        "trend",
        F.when(
            F.count(F.lit(1)).over(w) == 7, F.round(F.avg("daily_value").over(w), 6)
        ),
    ).filter(F.col("trend").isNotNull())
    tr = tr.withColumn("dow", F.dayofweek("day").cast("int"))
    seas_raw = tr.groupBy("dow").agg(
        F.round(F.avg(F.col("daily_value") - F.col("trend")), 6).alias("s_raw")
    )
    # center the 7 weekday effects so they sum to ~0
    wall = Window.partitionBy()
    seas = seas_raw.withColumn(
        "seasonal", F.round(F.col("s_raw") - F.round(F.avg("s_raw").over(wall), 6), 6)
    ).select("dow", "seasonal")
    return (
        tr.join(F.broadcast(seas), "dow")
        .select(
            "day",
            "dow",
            F.round("daily_value", 6).alias("daily_value"),
            "trend",
            "seasonal",
            F.round(
                F.col("daily_value") - F.col("trend") - F.col("seasonal"), 6
            ).alias("remainder"),
        )
    )


SEASONAL_DECOMPOSE_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / (COUNT(*) * 100.0) AS daily_value,
           DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dnum
    FROM events GROUP BY 1, 3
),
tr AS (
    SELECT day, dnum, daily_value,
           CASE WHEN COUNT(*) OVER w = 7
                THEN ROUND(AVG(daily_value) OVER w, 6) END AS trend
    FROM daily
    WINDOW w AS (ORDER BY dnum RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
trf AS (
    SELECT *, CAST(dayofweek(day) + 1 AS INT) AS dow FROM tr WHERE trend IS NOT NULL
),
seas_raw AS (
    SELECT dow, ROUND(AVG(daily_value - trend), 6) AS s_raw FROM trf GROUP BY 1
),
seas AS (
    SELECT dow,
           ROUND(s_raw - (SELECT ROUND(AVG(s_raw), 6) FROM seas_raw), 6) AS seasonal
    FROM seas_raw
)
SELECT t.day, t.dow, ROUND(t.daily_value, 6) AS daily_value, t.trend, s.seasonal,
       ROUND(t.daily_value - t.trend - s.seasonal, 6) AS remainder
FROM trf t JOIN seas s USING (dow)
"""

QUERIES["events_seasonal_decompose"] = events_seasonal_decompose
ORACLES["events_seasonal_decompose"] = SEASONAL_DECOMPOSE_SQL


def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day-ahead Holt-Winters forecast (additive, weekly season) of
    daily event value per type — the capacity-planning companion to
    `events_seasonal_decompose`.

    The triple-exponential recurrence (alpha=.3 level, beta=.1 trend,
    gamma=.2 seasonal) is inherently serial, but only at DAY grain: the
    corpus aggregates to ~days x types rows first (one shuffle,
    volume-independent), then the whole recursion runs as ONE
    `aggregate()` fold per type over its sorted day array — no driver
    loop, no per-iteration job, bounded by the calendar not the data.
    Every state update rounds to 8 dp so the DuckDB recursive-CTE
    oracle replays the recursion bit-for-bit; forecasts round to 4 dp.
    Types shorter than two weeks are excluded (init needs 2x7 days).

    The daily aggregate and the two init means sum exact integer CENTS
    (BIGINT, like events_seasonal_decompose): Spark's ordered
    aggregate() fold and DuckDB's unordered SUM could otherwise differ
    by one ulp on a value landing exactly on a rounding boundary, and a
    single flipped init bit would propagate through the whole serial
    recursion.  Each daily v is then one exact division cents/100.0 —
    order-free on both engines."""
    ALPHA, BETA, GAMMA = 0.3, 0.1, 0.2
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    per = (
        daily.groupBy("event_type")
        .agg(F.array_sort(F.collect_list(F.struct("day", "cents"))).alias("sv"))
        .select(
            "event_type",
            F.transform(F.col("sv"), lambda x: x["cents"]).alias("cs"),
        )
        .filter(F.size("cs") >= 14)
    )
    zero = F.lit(0).cast("bigint")
    c1 = F.aggregate(F.slice("cs", 1, 7), zero, lambda a, x: a + x)
    c2 = F.aggregate(F.slice("cs", 8, 7), zero, lambda a, x: a + x)
    per = per.select(
        "event_type",
        F.transform("cs", lambda c: c / 100.0).alias("vs"),
        F.round(c1 / 700.0, 8).alias("lvl0"),
        F.round((c2 - c1) / 4900.0, 8).alias("tr0"),
    )
    per = per.select(
        "event_type", "vs", "lvl0", "tr0",
        F.transform(
            F.slice("vs", 1, 7), lambda x: F.round(x - F.col("lvl0"), 8)
        ).alias("s0"),
    )

    def step(acc, v):
        s_t = F.element_at(acc["season"], (acc["t"] % 7 + 1).cast("int"))
        lvl_new = F.round(
            ALPHA * (v - s_t) + (1 - ALPHA) * (acc["level"] + acc["trend"]), 8
        )
        tr_new = F.round(
            BETA * (lvl_new - acc["level"]) + (1 - BETA) * acc["trend"], 8
        )
        season_new = F.transform(
            acc["season"],
            lambda s, j: F.when(
                j == (acc["t"] % 7),
                F.round(GAMMA * (v - lvl_new) + (1 - GAMMA) * s, 8),
            ).otherwise(s),
        )
        return F.struct(
            lvl_new.alias("level"),
            tr_new.alias("trend"),
            season_new.alias("season"),
            (acc["t"] + 1).alias("t"),
        )

    init = F.struct(
        F.col("lvl0").alias("level"),
        F.col("tr0").alias("trend"),
        F.col("s0").alias("season"),
        F.lit(7).alias("t"),
    )
    fin = F.aggregate(F.slice(F.col("vs"), F.lit(8), F.size("vs") - 7), init, step)
    per2 = per.select("event_type", F.size("vs").alias("n"), fin.alias("fin"))
    out = per2.select(
        "event_type", "n", "fin",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"),
    )
    forecast = (
        F.col("fin.level")
        + F.col("h") * F.col("fin.trend")
        + F.element_at(
            F.col("fin.season"),
            ((F.col("n") - 1 + F.col("h")) % 7 + 1).cast("int"),
        )
    )
    return out.select(
        "event_type",
        F.col("h").cast("int").alias("h"),
        F.round(forecast, 4).alias("forecast"),
    )


HOLT_WINTERS_SQL = """
WITH RECURSIVE daily AS (
    -- exact integer cents: order-free on both engines (see docstring)
    SELECT event_type, CAST(ts AS DATE) AS day,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
    FROM events GROUP BY 1, 2
), seq AS (
    SELECT event_type, cents / 100.0 AS v, cents,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1 AS t,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM daily
), init AS (
    SELECT event_type,
           ROUND(SUM(CASE WHEN t < 7 THEN cents END) / 700.0, 8) AS lvl0,
           ROUND((SUM(CASE WHEN t BETWEEN 7 AND 13 THEN cents END)
                  - SUM(CASE WHEN t < 7 THEN cents END)) / 4900.0, 8) AS tr0,
           MAX(n) AS n
    FROM seq GROUP BY 1 HAVING MAX(n) >= 14
), sz AS (
    SELECT s.event_type, list(ROUND(s.v - i.lvl0, 8) ORDER BY s.t) AS s0
    FROM seq s JOIN init i USING (event_type) WHERE s.t < 7 GROUP BY 1
), rec(event_type, t, level, trend, season) AS (
    SELECT i.event_type, 7, i.lvl0, i.tr0, z.s0
    FROM init i JOIN sz z USING (event_type)
    UNION ALL
    SELECT event_type, t + 1,
           lvl_new,
           ROUND(0.1 * (lvl_new - level) + 0.9 * trend, 8),
           [CASE WHEN j = t % 7
                 THEN ROUND(0.2 * (v - lvl_new) + 0.8 * season[j + 1], 8)
                 ELSE season[j + 1] END FOR j IN range(0, 7)]
    FROM (
        SELECT r.event_type, r.t, r.level, r.trend, r.season, s.v,
               ROUND(0.3 * (s.v - r.season[(r.t % 7) + 1])
                     + 0.7 * (r.level + r.trend), 8) AS lvl_new
        FROM rec r
        JOIN seq s ON s.event_type = r.event_type AND s.t = r.t
        JOIN init i ON i.event_type = r.event_type
        WHERE r.t < i.n
    )
), fin AS (
    SELECT r.event_type, r.level, r.trend, r.season, i.n
    FROM rec r JOIN init i USING (event_type) WHERE r.t = i.n
)
SELECT event_type, CAST(hh.h AS INT) AS h,
       ROUND(level + hh.h * trend + season[((n - 1 + hh.h) % 7) + 1], 4) AS forecast
FROM fin CROSS JOIN (SELECT unnest(range(1, 8)) AS h) hh
"""

QUERIES["events_holt_winters"] = events_holt_winters
ORACLES["events_holt_winters"] = HOLT_WINTERS_SQL


def open_orderlines_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent OPEN order-lines per order priority, by SWEEP
    LINE — the scalable idiom for interval concurrency: no interval
    self-join at all.  Each line's fulfillment window
    [o_orderdate, l_shipdate] emits a +1 at its start day and a -1 the
    day after it ships; the running sum of the day-grain deltas IS the
    number of lines awaiting shipment.  The running window partitions
    by priority and spans only the DATE dimension (~2,500 rows per
    priority — the bounded-dimension window class of
    running_daily_revenue).  Ties on the peak break to the earliest
    day.  Returns (o_orderpriority, peak_open, peak_day)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_orderpriority",
        F.to_date("o_orderdate").alias("order_d"),
    )
    iv = li.join(orders, "l_orderkey")
    starts = iv.select(
        "o_orderpriority", F.col("order_d").alias("d"), F.lit(1).alias("delta")
    )
    ends = iv.select(
        "o_orderpriority",
        F.date_add(F.col("ship_d"), 1).alias("d"),
        F.lit(-1).alias("delta"),
    )
    daily = (
        starts.unionByName(ends)
        .groupBy("o_orderpriority", "d")
        .agg(F.sum("delta").alias("delta"))
    )
    from pyspark.sql.window import Window

    run_w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = daily.withColumn("n_open", F.sum("delta").over(run_w))
    return (
        run.groupBy("o_orderpriority")
        .agg(
            F.max_by(
                F.struct(F.col("n_open"), F.col("d")),
                F.struct(F.col("n_open"), -F.unix_date(F.col("d"))),
            ).alias("pk")
        )
        .select(
            "o_orderpriority",
            F.col("pk.n_open").cast("int").alias("peak_open"),
            F.col("pk.d").alias("peak_day"),
        )
    )


OPEN_PEAK_SQL = """
WITH iv AS (
    SELECT o.o_orderpriority, CAST(o.o_orderdate AS DATE) AS order_d,
           CAST(l.l_shipdate AS DATE) AS ship_d
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), ev AS (
    SELECT o_orderpriority, order_d AS d, 1 AS delta FROM iv
    UNION ALL
    SELECT o_orderpriority, ship_d + INTERVAL 1 DAY, -1 FROM iv
), daily AS (
    SELECT o_orderpriority, CAST(d AS DATE) AS d, SUM(delta) AS delta
    FROM ev GROUP BY 1, 2
), run AS (
    SELECT o_orderpriority, d,
           SUM(delta) OVER (PARTITION BY o_orderpriority ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_open
    FROM daily
), pk AS (
    SELECT o_orderpriority, d, n_open,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY n_open DESC, d ASC) AS rn
    FROM run
)
SELECT o_orderpriority, CAST(n_open AS INT) AS peak_open, d AS peak_day
FROM pk WHERE rn = 1
"""

QUERIES["open_orderlines_peak"] = open_orderlines_peak
ORACLES["open_orderlines_peak"] = OPEN_PEAK_SQL
