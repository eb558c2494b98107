"""Every declared query with an oracle must hash-match DuckDB on the same
parquet — the local mirror of the driver's t2 gate (run at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

import importlib

entry = importlib.import_module("__spark_entry__")

_QUERIES = entry.queries()
_ORACLES = entry.oracle_sql()


def test_every_oracle_key_has_query():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracle keys without queries: {missing}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, name):
    res = compare(spark, _QUERIES[name], _ORACLES[name], SF_ORACLE)
    assert res["columns_match"], res
    assert res["rowcount_match"], res
    assert res["values_match"], res


@pytest.mark.parametrize(
    "name", sorted(set(_QUERIES) - set(_ORACLES))
)
def test_rows_only_queries_run(spark, name):
    from tests.oracle_harness import _canon, spark_to_pandas

    df = _QUERIES[name](spark, SF_ORACLE)
    assert len(df.schema.fields) > 0
    # The driver's rows-only check still hashes cells through pandas, so a
    # query emitting array/list cells fails it even without an oracle
    # (multimodal_features, CORRECTNESS_r04). Canonicalize the driver's
    # way — this raises on unhashable cells pre-commit.
    _canon(spark_to_pandas(df))


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
