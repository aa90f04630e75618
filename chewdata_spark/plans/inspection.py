"""Physical-plan inspection helpers.

Scale regressions usually appear in the plan before they appear in the
wall clock: a filter that stopped pushing down, a broadcast that became
a sort-merge join, a scan reading every column for a two-column
projection.  These helpers parse ``explain("formatted")`` output so
tests can pin the plan properties that matter at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet-scan PushedFilters entries (flattened)."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        m = re.search(r"PushedFilters: \[(.*)\]", line)
        if m and m.group(1).strip():
            # keep each scan's filter list whole: individual predicates
            # like EqualTo(a,b) contain commas themselves
            out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each scan actually reads (column-pruning check)."""
    out = []
    for line in formatted_plan(df).splitlines():
        m = re.search(r"ReadSchema: struct<(.*)>", line)
        if m:
            out.append([c.split(":")[0] for c in m.group(1).split(",") if c])
    return out


def join_counts(df: DataFrame) -> dict[str, int]:
    plan = formatted_plan(df)
    return {
        "broadcast_hash": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "nested_loop": plan.count("BroadcastNestedLoopJoin"),
    }


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (lower is better; broadcasts excluded).

    Counts both layouts: "Exchange hash/rangepartitioning(...)" (simple
    mode / single-line) and the formatted-mode detail entry
    "(n) Exchange" whose partitioning argument sits on the following
    line.  On executed AQE plans the formatted output repeats nodes
    under "== Initial Plan ==" — only the final section is counted.
    BroadcastExchange never matches either pattern.
    """
    plan = formatted_plan(df).split("== Initial Plan ==")[0]
    detail = len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))
    inline = len(
        re.findall(r"\bExchange (?:hash|range)partitioning|\bExchange SinglePartition", plan)
    )
    return max(detail, inline)


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), (
        f"expected a pushed filter containing {fragment!r}; got {filters}"
    )


def assert_scan_prunes_to(df: DataFrame, table_cols: set[str]) -> None:
    """Assert some scan reads exactly `table_cols` (order-insensitive)."""
    schemas = [set(s) for s in read_schemas(df)]
    assert table_cols in schemas, f"no scan reads exactly {table_cols}; scans={schemas}"


def assert_no_sort_merge_join(df: DataFrame) -> None:
    jc = join_counts(df)
    assert jc["sort_merge"] == 0, f"unexpected sort-merge join: {jc}"
