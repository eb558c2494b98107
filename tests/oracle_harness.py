"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a declared Spark query and its oracle SQL on the same parquet dir and
compares them THE DRIVER'S WAY: both result sets are canonicalized through
pandas DataFrames (Spark rows -> pd.DataFrame, DuckDB -> .df()), columns
sorted by name, rows sorted by value, then cell-rendered and compared.

Canonicalizing through pandas is the point (round-1 lesson): the driver's
comparator converts through pandas, which (a) overflows on 9999-12-31
timestamp sentinels, (b) turns DuckDB HUGEINT integer sums into float64
("5.0" vs Spark's "5"), and (c) cannot sort/hash list cells. A harness
that renders Python objects with str() hides all three classes — this one
reproduces them locally so they fail pre-commit instead of in
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from data_platform_spark.sources.tables import TESTDATA_TABLES


def _render_cell(v) -> str:
    """Deterministic string render of one canonical pandas cell.

    Int-like and float-like values render DIFFERENTLY ("5" vs "5.0") on
    purpose: a dtype drift (HUGEINT->float64) must fail the compare, like
    the driver's hash does.
    """
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"  # pandas uses NaN for missing floats
        return repr(v)
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s or "0"
    if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
        # Equate DATE and midnight-TIMESTAMP: DuckDB's .df() widens DATE to
        # datetime64 while Spark keeps datetime.date; the driver treats the
        # two as equal (p5_guarded_date_roundtrip passed round 1).
        s = str(v)
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, (list, tuple, np.ndarray)):
        # Driver dies on list cells before rendering; _canon raises first.
        return "[" + ",".join(_render_cell(x) for x in v) + "]"
    if v is pd.NaT:
        return "NULL"
    return str(v)


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    """Driver-shaped canonicalization: sort columns by name, rows by value.

    Raises (like the driver) on list-typed cells — pandas cannot factorize
    them for the lexsort.
    """
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
    rendered = []
    for row in pdf.itertuples(index=False, name=None):
        rendered.append(tuple(_render_cell(v) for v in row))
    rendered.sort()
    return rendered


def spark_to_pandas(df) -> pd.DataFrame:
    """Collect a Spark DataFrame into pandas the driver's way.

    pd.DataFrame over collected Row objects — NOT toPandas()/Arrow — so a
    9999-12-31 timestamp overflows here exactly as it does in the driver.
    """
    rows = [r.asDict() for r in df.collect()]
    pdf = pd.DataFrame(rows, columns=df.columns)
    # Coerce datetime-ish object columns to datetime64 the way the driver
    # does (its round-1 traceback is pd.to_datetime's objects_to_datetime64):
    # this is what overflows on 9999-12-31 sentinels.
    for c in pdf.columns:
        if pdf[c].dtype == object:
            non_null = pdf[c].dropna()
            if len(non_null) and isinstance(
                non_null.iloc[0], (_dt.date, _dt.datetime)
            ):
                pdf[c] = pd.to_datetime(pdf[c])
    return pdf


def run_spark_query(spark, fn, sf_dir: str) -> pd.DataFrame:
    return spark_to_pandas(fn(spark, sf_dir))


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def compare(spark, fn, sql: str, sf_dir: str) -> dict:
    try:
        s_pdf = run_spark_query(spark, fn, sf_dir)
        o_pdf = run_oracle(sql, sf_dir)
    except Exception as e:  # mirror the driver's err column
        return {
            "rowcount_match": False,
            "columns_match": False,
            "values_match": False,
            "err": f"{type(e).__name__}: {e}",
        }
    result = {
        "rowcount_match": len(s_pdf) == len(o_pdf),
        "spark_rows": len(s_pdf),
        "oracle_rows": len(o_pdf),
        "columns_match": sorted(s_pdf.columns) == sorted(o_pdf.columns),
        "spark_cols": sorted(s_pdf.columns),
        "oracle_cols": sorted(o_pdf.columns),
        "err": None,
    }
    if result["rowcount_match"] and result["columns_match"]:
        try:
            sn = _canon(s_pdf)
            on = _canon(o_pdf)
        except Exception as e:  # e.g. unhashable list cells in sort
            result["values_match"] = False
            result["err"] = f"{type(e).__name__}: {e}"
            return result
        result["values_match"] = sn == on
        if not result["values_match"]:
            result["first_diffs"] = [
                (a, b) for a, b in zip(sn, on) if a != b
            ][:5]
    else:
        result["values_match"] = False
    return result
