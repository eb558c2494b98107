"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a declared Spark query and its oracle SQL on the same parquet dir,
sorts columns by name and rows by value, hashes both — any mismatch shows
up here before the driver sees it. Timestamps/doubles are normalized the
same way for both engines (string render, NaN-safe).
"""

from __future__ import annotations

import math

import duckdb

from data_platform_spark.sources.tables import TESTDATA_TABLES


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(rows: list[dict], cols: list[str]) -> list[tuple]:
    cols_sorted = sorted(cols)
    out = [tuple(_norm_cell(r[c]) for c in cols_sorted) for r in rows]
    out.sort()
    return out


def run_spark_query(spark, fn, sf_dir: str):
    df = fn(spark, sf_dir)
    cols = df.columns
    rows = [r.asDict() for r in df.collect()]
    return rows, cols


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = [dict(zip(cols, row)) for row in res.fetchall()]
    con.close()
    return rows, cols


def compare(spark, fn, sql: str, sf_dir: str) -> dict:
    s_rows, s_cols = run_spark_query(spark, fn, sf_dir)
    o_rows, o_cols = run_oracle(sql, sf_dir)
    result = {
        "rowcount_match": len(s_rows) == len(o_rows),
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
        "columns_match": sorted(s_cols) == sorted(o_cols),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
    }
    if result["rowcount_match"] and result["columns_match"]:
        sn = _normalize(s_rows, s_cols)
        on = _normalize(o_rows, o_cols)
        result["values_match"] = sn == on
        if not result["values_match"]:
            diffs = [
                (a, b) for a, b in zip(sn, on) if a != b
            ][:5]
            result["first_diffs"] = diffs
    else:
        result["values_match"] = False
    return result
