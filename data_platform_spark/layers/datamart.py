"""Datamart layer: consumption-ready aggregates over the DWH.

The reference creates the ``datamart`` schema but never populates it
(/root/reference/dags/configure.py:46-52 — no datamart queries exist in
the repo). These builders supply that missing layer with the aggregation
surface SURVEY.md §2.4 notes the engine must provide (groupBy/agg,
windows, ordered top-k) — all over current dimension versions + facts.

Scale notes: facts shuffle once on their SK group key; dims are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def character_episode_counts(
    dim_character: DataFrame, fact_char_ep: DataFrame
) -> DataFrame:
    """Episodes per current character, with a dense appearance rank."""
    cur = dim_character.filter("is_current").select(
        "character_sk", "character_id", "name", "status"
    )
    counts = (
        fact_char_ep.groupBy("character_sk")
        .agg(F.count(F.lit(1)).alias("n_episodes"))
    )
    joined = cur.join(counts, "character_sk", "left").withColumn(
        "n_episodes", F.coalesce(F.col("n_episodes"), F.lit(0))
    )
    w = Window.orderBy(F.desc("n_episodes"), F.asc("character_id"))
    return joined.withColumn("appearance_rank", F.dense_rank().over(w)).select(
        "character_id", "name", "status", "n_episodes", "appearance_rank"
    )


def location_population(
    dim_location: DataFrame,
    fact_char_loc: DataFrame,
    role_dim: DataFrame,
) -> DataFrame:
    """Residents ('last'-role characters) per current location, Unknown
    member included — the datamart consumer of the sentinel join."""
    cur = dim_location.filter("is_current").select(
        "location_sk", "location_id", "name"
    )
    last_role = role_dim.filter(F.col("role_name") == "last").select("role_id")
    residents = (
        fact_char_loc.join(F.broadcast(last_role), "role_id")
        .groupBy("location_sk")
        .agg(F.count(F.lit(1)).alias("n_residents"))
    )
    return (
        cur.join(residents, "location_sk", "left")
        .withColumn("n_residents", F.coalesce(F.col("n_residents"), F.lit(0)))
        .select("location_id", "name", "n_residents")
    )


def status_summary(dim_character: DataFrame) -> DataFrame:
    """Current-version status distribution (the 'how many alive' query)."""
    return (
        dim_character.filter("is_current")
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_characters"))
    )
