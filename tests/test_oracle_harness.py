"""The local harness must reproduce the driver's pandas-canonicalization
failure modes (round-1 finding: a str()-based mirror hid all three classes
and 4 queries failed only at the driver).

Each test feeds the harness a synthetic query pair exhibiting one class
and asserts the harness FAILS it, the way the driver did.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


def test_out_of_bounds_timestamp_sentinel_fails(spark):
    """TIMESTAMP '9999-12-31' in output -> pandas OutOfBoundsDatetime."""

    def q(spark, sf_dir):
        return spark.range(2).select(
            F.col("id"),
            F.lit("9999-12-31 00:00:00").cast("timestamp").alias("valid_to"),
        )

    sql = "SELECT range AS id, TIMESTAMP '9999-12-31' AS valid_to FROM range(2)"
    res = compare(spark, q, sql, SF_ORACLE)
    assert not res["values_match"]
    assert res["err"] and "OutOfBounds" in res["err"], res


def test_array_output_column_fails(spark):
    """List-typed cells -> pandas lexsort 'unhashable type: list'."""

    def q(spark, sf_dir):
        return spark.range(2).select(
            F.col("id"), F.array(F.col("id"), F.col("id") + 1).alias("arr")
        )

    sql = "SELECT range AS id, [range, range + 1] AS arr FROM range(2)"
    res = compare(spark, q, sql, SF_ORACLE)
    assert not res["values_match"]
    assert res["err"] and "unhashable" in res["err"], res


def test_hugeint_sum_dtype_drift_fails(spark):
    """DuckDB integer sum() -> HUGEINT -> pandas float64 ('3.0' vs '3')."""

    def q(spark, sf_dir):
        return spark.range(3).agg(F.sum("id").alias("total"))

    sql = "SELECT sum(range) AS total FROM range(3)"
    res = compare(spark, q, sql, SF_ORACLE)
    assert res["rowcount_match"] and res["columns_match"]
    assert not res["values_match"], res


def test_bigint_cast_fixes_hugeint_drift(spark):
    """...and CAST(sum(...) AS BIGINT) is the documented fix."""

    def q(spark, sf_dir):
        return spark.range(3).agg(F.sum("id").alias("total"))

    sql = "SELECT CAST(sum(range) AS BIGINT) AS total FROM range(3)"
    res = compare(spark, q, sql, SF_ORACLE)
    assert res["values_match"], res
