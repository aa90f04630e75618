"""Operator tests for time-series gap fill (oracle sweep covers the
events query; these pin the fill semantics on a hand-built series)."""

from __future__ import annotations

import datetime

from chewdata_spark.operators.timeseries import resample_forward_fill


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


def test_gap_fill_emits_empty_buckets_and_forward_fills(spark):
    t = datetime.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t, 10.0, 1),
        (1, t + datetime.timedelta(hours=3), 30.0, 2),  # 2-hour gap
    ]
    out = resample_forward_fill(
        _events(spark, rows), "user_id", "ts", "value", tiebreak_col="event_id"
    ).collect()
    got = {(r.bucket.hour): (r.n_events, r.filled_value) for r in out}
    assert got == {0: (1, 10.0), 1: (0, 10.0), 2: (0, 10.0), 3: (1, 30.0)}


def test_gap_fill_last_value_tiebreak(spark):
    t = datetime.datetime(2024, 1, 1, 5, 0)
    rows = [  # same timestamp: higher event_id wins
        (7, t, 1.0, 10),
        (7, t, 2.0, 11),
        (7, t + datetime.timedelta(minutes=5), 9.0, 9),  # later ts beats ids
    ]
    out = resample_forward_fill(
        _events(spark, rows), "user_id", "ts", "value", tiebreak_col="event_id"
    ).collect()
    assert len(out) == 1
    assert (out[0].n_events, out[0].filled_value) == (3, 9.0)


def test_gap_fill_keys_independent(spark):
    t = datetime.datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, t, 1.0, 1),
        (2, t + datetime.timedelta(hours=5), 5.0, 2),
    ]
    out = resample_forward_fill(
        _events(spark, rows), "user_id", "ts", "value", tiebreak_col="event_id"
    ).collect()
    # each key's grid spans only its own range: one bucket each
    assert sorted((r.user_id, r.bucket.hour, r.filled_value) for r in out) == [
        (1, 0, 1.0),
        (2, 5, 5.0),
    ]


def test_quantile_sketch_tracks_order_statistics(spark, sf_dir):
    """The histogram estimate interpolates INSIDE the bin holding the
    ceil(p*n)-th order statistic, so it must land within one bin width
    of that discrete quantile for every (type, p) — the sketch's actual
    guarantee (the continuous interpolated quantile can sit a data-gap
    away in sparse tails)."""
    import math

    from chewdata_spark.operators.timeseries import sketch_quantiles
    from chewdata_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    est = {
        (r.key, r.p): r.est
        for r in sketch_quantiles(
            ev, "event_type", "value", probs=(0.5, 0.95), bins=1024
        ).collect()
    }
    by_type: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        if r.value is not None:
            by_type.setdefault(r.event_type, []).append(r.value)
    for (k, p), e in est.items():
        vals = sorted(by_type[k])
        disc = vals[math.ceil(p * len(vals)) - 1]
        bin_w = (vals[-1] - vals[0]) / 1024 + 1e-9
        assert abs(e - disc) <= bin_w, (k, p, e, disc)


def test_quantile_sketch_monotone_and_bounded(spark, sf_dir):
    from chewdata_spark.operators.timeseries import sketch_quantiles
    from chewdata_spark.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    rows = sketch_quantiles(
        ev, "event_type", "value", probs=(0.5, 0.95, 0.99), bins=1024
    ).collect()
    rng = {
        r.event_type: (r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.key, {})[r.p] = r.est
        lo, hi = rng[r.key]
        assert lo - 1e-9 <= r.est <= hi + 1e-9, (r.key, r.p, r.est)
    for k, ests in by_key.items():
        assert ests[0.5] <= ests[0.95] <= ests[0.99], (k, ests)


def test_holt_winters_matches_python_reference(spark, tmp_path):
    """The aggregate()-fold Holt-Winters recursion must equal a plain
    sequential Python implementation (same 8-dp state rounding) on a
    planted 21-day series with trend + weekly season."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    season = [5, 3, -2, -4, 0, 1, -3]
    rows = []
    for t in range(21):
        v = 100 + 2 * t + season[t % 7]
        rows.append((t, base + dt.timedelta(days=t), 1, "plant", float(v), "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)

    from chewdata_spark.queries.timeseries_queries import events_holt_winters
    import chewdata_spark.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda s, d, t: spark.read.parquet(p)
        import chewdata_spark.queries.timeseries_queries as tq
        saved = tq.load_table
        tq.load_table = tables.load_table
        out = {r.h: r.forecast for r in events_holt_winters(spark, "ignored").collect()}
    finally:
        tables.load_table = orig
        tq.load_table = saved

    # sequential reference
    vs = [round(float(100 + 2 * t + season[t % 7]), 6) for t in range(21)]
    lvl = round(sum(vs[:7]) / 7.0, 8)
    tr = round((sum(vs[7:14]) / 7.0 - sum(vs[:7]) / 7.0) / 7.0, 8)
    s = [round(v - lvl, 8) for v in vs[:7]]
    A, B, G = 0.3, 0.1, 0.2
    for t in range(7, 21):
        st = s[t % 7]
        lvl_new = round(A * (vs[t] - st) + (1 - A) * (lvl + tr), 8)
        tr_new = round(B * (lvl_new - lvl) + (1 - B) * tr, 8)
        s[t % 7] = round(G * (vs[t] - lvl_new) + (1 - G) * st, 8)
        lvl, tr = lvl_new, tr_new
    n = 21
    exp = {
        h: round(lvl + h * tr + s[(n - 1 + h) % 7], 4) for h in range(1, 8)
    }
    assert out == exp
    # and the forecast actually tracks the planted trend (+2/day)
    assert abs((out[7] - out[1]) / 6 - 2) < 1.0
