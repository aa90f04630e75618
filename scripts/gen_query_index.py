"""Regenerate docs/QUERIES.md from the live query registry."""
from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from chewdata_spark.queries import query_index_markdown  # noqa: E402

if __name__ == "__main__":
    path = os.path.join(ROOT, "docs", "QUERIES.md")
    with open(path, "w") as f:
        f.write(query_index_markdown())
    print(f"wrote {path}")
