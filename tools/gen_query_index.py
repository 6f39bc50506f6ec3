"""Regenerate QUERIES.md — the navigable index of every declared query.

Run after adding queries: ``python tools/gen_query_index.py``.
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from audios_to_dataset_spark.plans import all_queries

    qs = all_queries()
    lines = [
        "# Query index",
        "",
        "Auto-generated (`python tools/gen_query_index.py`): every declared",
        "driver query, its module, and the first docstring line. All "
        f"{len(qs)} have full DuckDB value-hash oracles.",
        "",
        "| Query | Module | What it does |",
        "|---|---|---|",
    ]
    for name, fn in qs.items():
        doc = (inspect.getdoc(fn) or "").split("\n")[0].rstrip(".")
        mod = fn.__module__.replace("audios_to_dataset_spark.", "")
        lines.append(f"| `{name}` | {mod} | {doc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{len(qs)} queries indexed -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
