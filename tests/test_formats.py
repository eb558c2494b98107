"""Source/sink format breadth: the engine round-trips its relations
through parquet, JSON and CSV with declared schemas (never inferred)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_platform_spark.sources.tables import load_table


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip_formats(spark, tmp_path, fmt):
    src = load_table(spark, "/root/testdata/sf0.001", "customer")
    path = str(tmp_path / f"customer_{fmt}")
    writer = src.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)

    reader = spark.read.format(fmt).schema(src.schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    back = reader.load(path)

    assert back.schema == src.schema
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
