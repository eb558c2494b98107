from data_platform_spark.ops.asof import asof_join
from data_platform_spark.ops.core import (
    VALID_TO_INFINITY,
    anti_append,
    assign_sk,
    changed,
    dim_as_of,
    guarded_to_date,
    normalize_empty_to_null,
    union_distinct,
    upsert_preserving,
)
from data_platform_spark.ops.scd2 import scd2_apply

__all__ = [
    "VALID_TO_INFINITY",
    "anti_append",
    "asof_join",
    "assign_sk",
    "changed",
    "dim_as_of",
    "guarded_to_date",
    "normalize_empty_to_null",
    "scd2_apply",
    "union_distinct",
    "upsert_preserving",
]
