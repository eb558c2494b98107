#!/usr/bin/env python
"""Regenerate QUERIES.md from the query modules' docstrings.

Usage: python scripts/gen_queries_md.py > QUERIES.md
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    "relational",
    "events",
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "rm_pipeline",
    "graph",
]

HEADER = """# Query inventory index

Auto-generated from `data_platform_spark/queries/` docstrings
(regenerate with `python scripts/gen_queries_md.py > QUERIES.md`).
Oracle = hash-compared against DuckDB at sf0.01 by the driver and
`tests/test_oracle_parity.py`; rows-only = Pandas-UDF/sequential/
sketch ops with pytest evidence instead.
"""


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    line = doc.splitlines()[0].strip() if doc else ""
    return line.rstrip(".").replace("|", "\\|")[:100]


def main() -> None:
    out = [HEADER]
    total = oracled = 0
    for name in MODULES:
        mod = importlib.import_module(f"data_platform_spark.queries.{name}")
        out.append(f"\n## {name} ({len(mod.QUERIES)} queries)\n")
        out.append("| query | check | what it exercises |")
        out.append("|---|---|---|")
        for qname, fn in mod.QUERIES.items():
            check = "oracle" if qname in mod.ORACLE else "rows-only"
            total += 1
            oracled += qname in mod.ORACLE
            out.append(f"| `{qname}` | {check} | {first_line(fn)} |")
    out.append(
        f"\n**{total} queries, {oracled} oracle-checked, "
        f"{total - oracled} rows-only.**"
    )
    print("\n".join(out))


if __name__ == "__main__":
    main()
