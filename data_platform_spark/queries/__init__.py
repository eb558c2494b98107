"""Declared analytic query inventory — the oracle-checked surface.

Each submodule exports:
- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLE:  dict[str, str]`` — ANSI SQL equivalents runnable by DuckDB on
  the same parquet tables (keys without an oracle get a rows-only check).

``all_queries()`` / ``all_oracles()`` merge every submodule; this is what
``__spark_entry__.py`` hands to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from data_platform_spark.queries import (
        dedup,
        events,
        multimodal,
        relational,
        rm_pipeline,
        similarity,
        text,
    )

    return (relational, events, text, dedup, similarity, multimodal, rm_pipeline)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLE)
    return merged
