#!/usr/bin/env python
"""Quantify parquet stat-pruning under three layouts of `events`.

Writes the events table (default sf0.1) three ways — range-clustered on
user_id (the one-dimension layout that serves user_id predicates),
range-clustered on value, and Z-ordered on (user_id, value) — then
computes, from parquet FOOTER statistics alone, how many row groups a
reader must touch for:

  - the user_id quarter-mass predicate,
  - the value quarter-mass predicate,
  - the two-dimensional box both combined (the
    events_zorder_two_dim_slice workload).

A row group is skippable iff its min/max range misses the predicate on
ANY constrained dimension — exactly the parquet reader's rule, computed
deterministically here instead of scraping scan metrics. Prints a
markdown table (paste into PLANS.md) plus one JSON line.

Usage: python scripts/measure_zorder_pruning.py [sf_dir] [n_files]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_platform_spark.ops.layout import cluster_write, zorder_write  # noqa: E402
from data_platform_spark.session import get_spark  # noqa: E402
from data_platform_spark.sources.tables import load_table  # noqa: E402


def rowgroup_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per row group: {col: (min, max)} folded from footer stats."""
    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            ranges = {}
            for ci in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema in cols:
                    st = c.statistics
                    ranges[c.path_in_schema] = (st.min, st.max)
            out.append(ranges)
    return out


def must_read(ranges: dict, preds: dict) -> bool:
    """Reader rule: touch the row group unless some predicate dimension's
    [lo, hi] misses the row group's [min, max] entirely."""
    for col, (lo, hi) in preds.items():
        mn, mx = ranges[col]
        if mx < lo or mn > hi:
            return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="dps-zorder-pruning")
    ev = load_table(spark, sf_dir, "events")

    u_q, v_q = ev.approxQuantile(["user_id", "value"], [0.0, 0.25], 0.001)
    preds = {
        "user_id": (u_q[0], u_q[1]),
        "value": (v_q[0], v_q[1]),
    }

    base = tempfile.mkdtemp(prefix="dps_zorder_measure_")
    layouts = {}
    cluster_write(ev, base + "/linear_user", ["user_id"], n_files=n_files)
    layouts["linear(user_id)"] = base + "/linear_user"
    cluster_write(ev, base + "/linear_value", ["value"], n_files=n_files)
    layouts["linear(value)"] = base + "/linear_value"
    zorder_write(
        ev, base + "/zorder", ["user_id", "value"], n_files=n_files
    )
    layouts["zorder(user_id,value)"] = base + "/zorder"

    cases = {
        "user_id 25%": {"user_id": preds["user_id"]},
        "value 25%": {"value": preds["value"]},
        "2-dim box": preds,
    }
    rows = []
    result: dict = {"sf_dir": sf_dir, "n_files": n_files, "layouts": {}}
    for name, path in layouts.items():
        rgs = rowgroup_ranges(path, ["user_id", "value"])
        total = len(rgs)
        entry = {"row_groups": total}
        cells = []
        for cname, p in cases.items():
            read = sum(1 for r in rgs if must_read(r, p))
            skip_pct = 100.0 * (1 - read / total)
            entry[cname] = {"read": read, "skip_pct": round(skip_pct, 1)}
            cells.append(f"{read}/{total} ({skip_pct:.0f}% skipped)")
        result["layouts"][name] = entry
        rows.append(f"| {name} | " + " | ".join(cells) + " |")

    print("\n| layout | user_id 25% pred | value 25% pred | 2-dim box |")
    print("|---|---|---|---|")
    for r in rows:
        print(r)
    print()
    print(json.dumps(result))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
