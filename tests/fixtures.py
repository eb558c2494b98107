"""Re-export: fixtures moved into the package (they also back the
oracle-checked reference-pipeline queries in queries/rm_pipeline.py)."""

from data_platform_spark.sources.fixtures import (  # noqa: F401
    CHAR_URL,
    EP_URL,
    LOC_URL,
    base_universe,
    character,
    episode,
    location,
    mutated_universe,
)
