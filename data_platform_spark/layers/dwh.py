"""DWH layer: SCD2 dimensions, static/seed dimensions, incremental facts.

Reference: /root/reference/dags/dwh_dim_character.py, dwh_dim_location.py,
dwh_dim_episode.py (SCD2 close+open transactions), dags/configure.py:267-329
(Unknown seed + role dim), dwh_fact_character_episode.py /
dwh_fact_charer_location.py (union-dedup edge extraction, SK resolution,
anti-join incrementality, disjunctive Unknown join).

Scale notes: dims are orders of magnitude smaller than facts → broadcast
on the fact-side SK-resolution joins; fact builds shuffle once per join
key; anti-join incrementality reads only (key-cols) of the existing fact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_platform_spark.ops.core import anti_append, union_distinct
from data_platform_spark.ops.scd2 import scd2_apply

UNKNOWN_URL_SENTINEL = "__UNKNOWN__"

DIM_CHARACTER_TRACKED = ["name", "status", "species", "type", "gender", "image"]
DIM_LOCATION_TRACKED = ["name", "type", "dimension"]
DIM_EPISODE_TRACKED = ["name", "episode", "air_date"]


def build_dim_character(
    dim: DataFrame | None, stg_character: DataFrame, batch_ts: Column
) -> DataFrame:
    """SCD2 over characters (dags/dwh_dim_character.py:49-118)."""
    snap = stg_character.select(
        F.col("id").alias("character_id"),
        *DIM_CHARACTER_TRACKED,
        F.col("url").alias("character_url"),
        "source_created_at",
    )
    return scd2_apply(
        dim,
        snap,
        business_key="character_id",
        tracked_cols=DIM_CHARACTER_TRACKED,
        carried_cols=["character_url", "source_created_at"],
        sk_col="character_sk",
        batch_ts=batch_ts,
    )


def unknown_location_seed(spark: SparkSession, batch_ts) -> DataFrame:
    """The Unknown member row (dags/configure.py:267-303): location_id=-1,
    sentinel url so the fact join stays an equi-join (J5 rewrite)."""
    schema = T.StructType(
        [
            T.StructField("location_id", T.IntegerType(), False),
            T.StructField("name", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("dimension", T.StringType()),
            T.StructField("location_url", T.StringType()),
            T.StructField("source_created_at", T.TimestampType()),
        ]
    )
    return spark.createDataFrame(
        [(-1, "Unknown", "Unknown", "Unknown", UNKNOWN_URL_SENTINEL, None)],
        schema,
    )


def build_dim_location(
    dim: DataFrame | None,
    stg_location: DataFrame,
    spark: SparkSession,
    batch_ts: Column,
) -> DataFrame:
    """SCD2 over locations + seeded Unknown member."""
    snap = stg_location.select(
        F.col("id").alias("location_id"),
        *DIM_LOCATION_TRACKED,
        F.col("url").alias("location_url"),
        "source_created_at",
    )
    seed = unknown_location_seed(spark, batch_ts)
    # seed participates as an ordinary business key: first load opens it,
    # later loads see it unchanged (attributes are constant)
    snap_with_seed = seed.unionByName(snap)
    return scd2_apply(
        dim,
        snap_with_seed,
        business_key="location_id",
        tracked_cols=DIM_LOCATION_TRACKED,
        carried_cols=["location_url", "source_created_at"],
        sk_col="location_sk",
        batch_ts=batch_ts,
    )


def build_dim_episode(
    dim: DataFrame | None, stg_episode: DataFrame, batch_ts: Column
) -> DataFrame:
    snap = stg_episode.select(
        F.col("id").alias("episode_id"),
        *DIM_EPISODE_TRACKED,
        F.col("url").alias("episode_url"),
        "source_created_at",
    )
    return scd2_apply(
        dim,
        snap,
        business_key="episode_id",
        tracked_cols=DIM_EPISODE_TRACKED,
        carried_cols=["episode_url", "source_created_at"],
        sk_col="episode_sk",
        batch_ts=batch_ts,
    )


def dim_location_role(spark: SparkSession) -> DataFrame:
    """Static role dim (dags/configure.py:305-329): (1 origin, 2 last)."""
    schema = T.StructType(
        [
            T.StructField("role_id", T.ShortType(), False),
            T.StructField("role_name", T.StringType(), False),
        ]
    )
    return spark.createDataFrame([(1, "origin"), (2, "last")], schema)


# ---------------------------------------------------------------------------
# facts
# ---------------------------------------------------------------------------


def build_fact_char_ep(
    existing_fact: DataFrame | None,
    stg_episode_ch: DataFrame,
    stg_character_ep: DataFrame,
    stg_character: DataFrame,
    stg_episode: DataFrame,
    dim_character: DataFrame,
    dim_episode: DataFrame,
    batch_ts: Column,
) -> DataFrame:
    """Incremental character↔episode fact
    (dags/dwh_fact_character_episode.py:45-113).

    unified (U1) = char-side edges ∪ episode-side edges, resolved to
    business ids via URL joins (J1), deduped (U2), SK-resolved against
    current dims (J2, broadcast — dims are small), anti-joined against the
    existing fact (J4), appended with batch_ts.
    """
    # char payload lists episode URLs: (character_id, episode_url) × episode
    e1 = (
        stg_episode_ch.alias("ec")
        .join(stg_episode.alias("e"), F.col("ec.url") == F.col("e.url"))
        .select(
            F.col("ec.id").alias("character_id"),
            F.col("e.id").alias("episode_id"),
        )
    )
    # episode payload lists character URLs: (episode_id, character_url) × character
    e2 = (
        stg_character_ep.alias("ce")
        .join(stg_character.alias("c"), F.col("ce.url") == F.col("c.url"))
        .select(
            F.col("c.id").alias("character_id"),
            F.col("ce.id").alias("episode_id"),
        )
    )
    edges = union_distinct(e1, e2)

    resolved = (
        edges.join(
            F.broadcast(
                dim_character.filter("is_current").select(
                    "character_id", "character_sk"
                )
            ),
            "character_id",
        )
        .join(
            F.broadcast(
                dim_episode.filter("is_current").select(
                    "episode_id", "episode_sk"
                )
            ),
            "episode_id",
        )
        .select("character_sk", "episode_sk")
    )

    new_rows = (
        resolved
        if existing_fact is None
        else anti_append(resolved, existing_fact, ["character_sk", "episode_sk"])
    ).select("character_sk", "episode_sk", batch_ts.alias("created_at"))

    return (
        new_rows
        if existing_fact is None
        else existing_fact.unionByName(new_rows)
    )


def build_fact_char_loc(
    existing_fact: DataFrame | None,
    stg_location_ch: DataFrame,
    stg_character_loc: DataFrame,
    stg_character: DataFrame,
    dim_character: DataFrame,
    dim_location: DataFrame,
    role_dim: DataFrame,
    batch_ts: Column,
) -> DataFrame:
    """Incremental character↔location fact with Unknown fallback
    (dags/dwh_fact_charer_location.py:49-140).

    The reference's disjunctive join (url match OR (url IS NULL AND
    location_id = -1), :108-111) is rewritten scale-safe: NULL urls
    coalesce to the sentinel the Unknown dim row carries → equi-join.
    """
    # char-side edges carry a role; NULL url → Unknown sentinel
    c_edges = stg_location_ch.select(
        F.col("id").alias("character_id"),
        F.coalesce(F.col("url"), F.lit(UNKNOWN_URL_SENTINEL)).alias(
            "location_url"
        ),
        F.col("role").alias("role_name"),
    )
    # location-side residents: (location url via dim) role 'last'
    l_edges = (
        stg_character_loc.alias("cl")
        .join(stg_character.alias("c"), F.col("cl.url") == F.col("c.url"))
        .join(
            F.broadcast(
                dim_location.filter("is_current").select(
                    F.col("location_id").alias("loc_id"), "location_url"
                )
            ),
            F.col("cl.id") == F.col("loc_id"),
        )
        .select(
            F.col("c.id").alias("character_id"),
            F.col("location_url"),
            F.lit("last").alias("role_name"),
        )
    )
    edges = union_distinct(c_edges, l_edges)

    resolved = (
        edges.join(
            F.broadcast(
                dim_character.filter("is_current").select(
                    "character_id", "character_sk"
                )
            ),
            "character_id",
        )
        .join(
            F.broadcast(
                dim_location.filter("is_current").select(
                    "location_url", "location_sk"
                )
            ),
            "location_url",
        )
        .join(F.broadcast(role_dim), "role_name")
        .select("character_sk", "location_sk", "role_id")
    )

    new_rows = (
        resolved
        if existing_fact is None
        else anti_append(
            resolved, existing_fact, ["character_sk", "location_sk", "role_id"]
        )
    ).select(
        "character_sk", "location_sk", "role_id", batch_ts.alias("created_at")
    )

    return (
        new_rows
        if existing_fact is None
        else existing_fact.unionByName(new_rows)
    )
