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

## Evidence-age policy (standing; VERDICT r11 item 4)

The driver hash-gates only the FIRST ~50 registered queries per round
(`_R{N}_WINDOW` in `data_platform_spark/queries/__init__.py`). Each
round's window is built in this fixed order:

1. queries with NO driver CORRECTNESS row (never-green, including
   everything registered since the last window froze);
2. re-proofs — queries whose implementation or oracle changed since
   their latest green row (a green row certifies the CODE it measured,
   not the name);
3. the remaining slots refresh the OLDEST green rows in the registry.

Registration is capped at what the window can absorb: new queries per
round ≤ 50 minus (holes + re-proofs + the refresh debt's fair share),
so the never-green backlog cannot regrow (the r10 lesson — 49 queries
deep before the r11 drain). Every window entry is preflighted at
sf0.01 through `tests/oracle_harness.compare` (the driver-shaped
canonicalization) BEFORE the window is committed; a red preflight
blocks registration, not the round.
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
