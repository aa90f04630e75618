"""Unit tests for the range-join operators.

``interval_overlap_join`` is checked against a brute-force cross
product on fixtures that include INVERTED windows (end before start)
and multi-cell spans — each qualifying pair must appear exactly once
(the first-shared-cell device), with no duplicates from spans that
share several grid cells.
"""

from __future__ import annotations

import datetime as dt
import itertools

import pytest

from chewdata_spark.operators.rangejoin import (
    banded_range_join,
    interval_overlap_join,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, dt.date.fromisoformat(s), dt.date.fromisoformat(e), i)
         for k, s, e, i in rows],
        "k int, s date, e date, rid int",
    )


FIXTURE = [
    # (key, start, end, row-id) — mixes long spans, point spans,
    # inverted windows, adjacent-month touches, and a second key group
    (1, "2020-01-15", "2020-04-10", 1),
    (1, "2020-03-01", "2020-03-05", 2),     # nested inside rid 1
    (1, "2020-04-10", "2020-06-01", 3),     # touches rid 1 at a day
    (1, "2020-07-01", "2020-07-01", 4),     # point span, no overlap
    (1, "2020-05-20", "2020-02-02", 5),     # INVERTED window
    (1, "2019-12-31", "2020-01-01", 6),     # month-boundary straddle
    (2, "2020-01-01", "2020-12-31", 7),     # other key: never joins k=1
    (2, "2020-06-01", "2020-06-30", 8),
    (3, "2021-02-28", "2021-01-01", 9),     # inverted, alone in group
]


def _brute_pairs(grid_rows):
    """Reference: raw-orientation overlap within each key group."""
    out = set()
    for a, b in itertools.product(grid_rows, repeat=2):
        if a[0] != b[0]:
            continue
        sa, ea = dt.date.fromisoformat(a[1]), dt.date.fromisoformat(a[2])
        sb, eb = dt.date.fromisoformat(b[1]), dt.date.fromisoformat(b[2])
        if sa <= eb and sb <= ea:
            out.add((a[3], b[3]))
    return out


@pytest.mark.parametrize("grid", ["month", "quarter", "year", "week"])
def test_interval_overlap_join_matches_brute_force(spark, grid):
    left = _mk(spark, FIXTURE).withColumnsRenamed(
        {"s": "s_a", "e": "e_a", "rid": "rid_a"}
    )
    right = _mk(spark, FIXTURE).withColumnsRenamed(
        {"s": "s_b", "e": "e_b", "rid": "rid_b"}
    )
    got = interval_overlap_join(
        left, right,
        on=["k"],
        left_start="s_a", left_end="e_a",
        right_start="s_b", right_end="e_b",
        grid=grid,
    ).select("rid_a", "rid_b").collect()
    pairs = [(r.rid_a, r.rid_b) for r in got]
    # exactly once per qualifying ordered pair — any duplicate means a
    # pair met in more than one grid cell
    assert len(pairs) == len(set(pairs)), "pair emitted in >1 cell"
    assert set(pairs) == _brute_pairs(FIXTURE)


def test_interval_overlap_join_rejects_bad_grid(spark):
    df = _mk(spark, FIXTURE)
    with pytest.raises(ValueError, match="grid"):
        interval_overlap_join(
            df, df.withColumnsRenamed({"s": "s2", "e": "e2", "rid": "r2"}),
            on=["k"], left_start="s", left_end="e",
            right_start="s2", right_end="e2", grid="day",
        )


def test_interval_overlap_join_plan_has_no_dedup(spark):
    """The operator's contract is emit-once: no Deduplicate/Distinct
    node anywhere in the plan (the dropDuplicates it replaces was both
    a shuffle and a correctness trap on non-key dedup columns)."""
    left = _mk(spark, FIXTURE).withColumnsRenamed(
        {"s": "s_a", "e": "e_a", "rid": "rid_a"}
    )
    right = _mk(spark, FIXTURE).withColumnsRenamed(
        {"s": "s_b", "e": "e_b", "rid": "rid_b"}
    )
    out = interval_overlap_join(
        left, right, on=["k"],
        left_start="s_a", left_end="e_a",
        right_start="s_b", right_end="e_b",
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in plan


def test_banded_range_join_still_exact(spark):
    left = spark.createDataFrame([(i, float(i)) for i in range(20)], "lid int, x double")
    right = spark.createDataFrame([(j, j * 1.5) for j in range(20)], "rid int, y double")
    got = banded_range_join(left, right, "x", "y", max_distance=2.0)
    pairs = {(r.lid, r.rid) for r in got.collect()}
    want = {
        (i, j) for i in range(20) for j in range(20)
        if abs(i - j * 1.5) <= 2.0
    }
    assert pairs == want


def test_interval_overlap_join_randomized_brute_force(spark):
    """200 seeded-random intervals (random keys, ~half inverted, span
    lengths from point to multi-year) vs a brute-force cross product,
    at two grid units — emit-once must hold everywhere."""
    import random

    rng = random.Random(42)
    base = dt.date(2019, 6, 1)
    rows = []
    for rid in range(200):
        k = rng.randint(1, 8)
        s = base + dt.timedelta(days=rng.randint(0, 900))
        e = s + dt.timedelta(days=rng.randint(0, 700))
        if rng.random() < 0.5:
            s, e = e, s  # inverted window
        rows.append((k, s.isoformat(), e.isoformat(), rid))
    for grid in ("month", "year"):
        left = _mk(spark, rows).withColumnsRenamed(
            {"s": "s_a", "e": "e_a", "rid": "rid_a"}
        )
        right = _mk(spark, rows).withColumnsRenamed(
            {"s": "s_b", "e": "e_b", "rid": "rid_b"}
        )
        got = interval_overlap_join(
            left, right, on=["k"],
            left_start="s_a", left_end="e_a",
            right_start="s_b", right_end="e_b", grid=grid,
        ).select("rid_a", "rid_b").collect()
        pairs = [(r.rid_a, r.rid_b) for r in got]
        assert len(pairs) == len(set(pairs)), f"dup pair at grid={grid}"
        assert set(pairs) == _brute_pairs(rows), f"wrong pairs at grid={grid}"
