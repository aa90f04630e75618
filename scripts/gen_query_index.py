"""Regenerate docs/QUERIES.md — the grouped index of every registered
query, its oracle status, and the first docstring line.  Run:
    python scripts/gen_query_index.py
"""
from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chewdata_spark.queries import _modules, all_oracles  # noqa: E402


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    line = doc.split("\n")[0].strip().rstrip(".")
    return line or "—"


def main() -> None:
    oracles = set(all_oracles())
    out = [
        "# Query index (auto-generated — `python scripts/gen_query_index.py`)",
        "",
        "`oracle` = full DuckDB value-hash check; `rows` = rows-only driver",
        "check (recall-tested against an exact or portable twin — see",
        "docs/VERIFICATION.md).",
        "",
    ]
    total = n_oracle = 0
    for mod in _modules():
        name = mod.__name__.split(".")[-1]
        out.append(f"## {name}")
        out.append("")
        out.append("| query | check | what |")
        out.append("|---|---|---|")
        for qname in sorted(mod.QUERIES):
            fn = mod.QUERIES[qname]
            kind = "oracle" if qname in oracles else "rows"
            total += 1
            n_oracle += qname in oracles
            out.append(f"| `{qname}` | {kind} | {first_line(fn)} |")
        out.append("")
    out.insert(5, f"**{total} queries, {n_oracle} oracle-backed.**")
    out.insert(6, "")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "QUERIES.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote docs/QUERIES.md: {total} queries, {n_oracle} oracle-backed")


if __name__ == "__main__":
    main()
