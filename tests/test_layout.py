"""Layout writers must actually enable stat-based pruning: after
cluster_write / zorder_write, parquet footer min/max ranges per file must
be narrow enough that range predicates overlap only a fraction of files —
the property file- and row-group-pruning depends on."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_platform_spark.ops.layout import cluster_write, zorder_write
from data_platform_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of `col` per parquet file, folded over row groups."""
    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col:
                    st = c.statistics
                    mins.append(st.min)
                    maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def _overlap_count(ranges, lo, hi) -> int:
    return sum(1 for mn, mx in ranges if mx >= lo and mn <= hi)


def test_cluster_write_narrows_file_ranges(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "ev_by_ts")
    cluster_write(ev, path, ["ts"], n_files=8)

    ranges = _file_ranges(path, "ts")
    assert len(ranges) == 8
    g_lo = min(r[0] for r in ranges)
    g_hi = max(r[1] for r in ranges)
    span = (g_hi - g_lo).total_seconds()
    spans = sorted((mx - mn).total_seconds() for mn, mx in ranges)
    # range clustering: median file covers a narrow slice of the domain
    assert spans[len(spans) // 2] < 0.3 * span
    # a 10%-of-domain predicate touches only a few files
    import datetime

    lo = g_lo + datetime.timedelta(seconds=0.45 * span)
    hi = g_lo + datetime.timedelta(seconds=0.55 * span)
    assert _overlap_count(ranges, lo, hi) <= 3


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    zpath = str(tmp_path / "ev_z")
    rpath = str(tmp_path / "ev_random")
    zorder_write(ev, zpath, ["user_id", "value"], n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(rpath)

    # quarter-of-mass predicate on EACH z column independently (rank
    # bucketing equalizes mass per bucket, so mass is what prunes)
    row = ev.agg(F.min("user_id"), F.min("value")).collect()[0]
    u_q, v_q = ev.approxQuantile(["user_id", "value"], [0.25], 0.001)
    u_pred = (row[0], u_q[0])
    v_pred = (row[1], v_q[0])

    zu = _overlap_count(_file_ranges(zpath, "user_id"), *u_pred)
    zv = _overlap_count(_file_ranges(zpath, "value"), *v_pred)
    ru = _overlap_count(_file_ranges(rpath, "user_id"), *u_pred)
    rv = _overlap_count(_file_ranges(rpath, "value"), *v_pred)

    # random layout: essentially every file overlaps every predicate
    assert ru >= 14 and rv >= 14
    # z-order: both dimensions prune (each predicate skips >= half)
    assert zu <= 8, f"user_id overlap {zu}/16"
    assert zv <= 8, f"value overlap {zv}/16"


def test_zorder_write_preserves_rows(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    zpath = str(tmp_path / "ev_z2")
    zorder_write(ev, zpath, ["user_id", "value"], n_files=4)
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert set(back.columns) == set(ev.columns)
    assert (
        back.agg(F.sum("event_id")).collect()[0][0]
        == ev.agg(F.sum("event_id")).collect()[0][0]
    )
