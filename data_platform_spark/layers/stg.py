"""Silver (staging) layer: typed, normalized, one row per business key,
plus exploded link tables.

Reference: /root/reference/dags/stg_character.py, stg_location.py,
stg_episode.py — JSONB field extraction (P1–P4), guarded date parse (P5),
empty-url normalization (P6), conditional upsert preserving timestamps
(S5), array explosion into link tables (A1+S6).

All builders are pure: (raw_df, existing_df, batch_ts) → full new table
state. ``from_json`` with the declared payload schema does the extraction
in one codegen'd pass — the reference's eight ``payload ->> 'x'`` probes
become struct field accesses on a single parse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_platform_spark.ops.core import (
    anti_append,
    explode_links,
    guarded_to_date,
    normalize_empty_to_null,
    upsert_preserving,
)
from data_platform_spark.schemas import (
    CHARACTER_PAYLOAD,
    EPISODE_PAYLOAD,
    LOCATION_PAYLOAD,
)

CHARACTER_TRACKED = [
    "name", "status", "species", "type", "gender", "image", "url",
    "source_created_at",
]
LOCATION_TRACKED = ["name", "type", "dimension", "url", "source_created_at"]
EPISODE_TRACKED = ["name", "episode", "air_date", "url", "source_created_at"]


def _parsed(raw: DataFrame, schema) -> DataFrame:
    """Parse payloads; drop rows whose JSON is unparseable or lacks the
    business key (from_json yields NULL on malformed input — without this
    guard a corrupt payload would flow a NULL key into every downstream
    upsert and join)."""
    return raw.select(F.from_json("payload", schema).alias("d")).filter(
        F.col("d").isNotNull() & F.col("d.id").isNotNull()
    )


def extract_character(raw: DataFrame) -> DataFrame:
    """stg.character snapshot columns from raw payloads
    (dags/stg_character.py:52-63)."""
    return _parsed(raw, CHARACTER_PAYLOAD).select(
        F.col("d.id").alias("id"),
        F.col("d.name").alias("name"),
        F.col("d.status").alias("status"),
        F.col("d.species").alias("species"),
        F.col("d.type").alias("type"),
        F.col("d.gender").alias("gender"),
        F.col("d.image").alias("image"),
        F.col("d.url").alias("url"),
        F.to_timestamp("d.created").alias("source_created_at"),
    )


def extract_location(raw: DataFrame) -> DataFrame:
    """(dags/stg_location.py:46-54)"""
    return _parsed(raw, LOCATION_PAYLOAD).select(
        F.col("d.id").alias("id"),
        F.col("d.name").alias("name"),
        F.col("d.type").alias("type"),
        F.col("d.dimension").alias("dimension"),
        F.col("d.url").alias("url"),
        F.to_timestamp("d.created").alias("source_created_at"),
    )


def extract_episode(raw: DataFrame) -> DataFrame:
    """(dags/stg_episode.py:44-57) incl. guarded air_date parse (P5)."""
    return _parsed(raw, EPISODE_PAYLOAD).select(
        F.col("d.id").alias("id"),
        F.col("d.name").alias("name"),
        F.col("d.episode").alias("episode"),
        guarded_to_date(F.col("d.air_date")).alias("air_date"),
        F.col("d.url").alias("url"),
        F.to_timestamp("d.created").alias("source_created_at"),
    )


def build_stg_character(
    raw: DataFrame, existing: DataFrame | None, batch_ts: Column
) -> DataFrame:
    return upsert_preserving(
        existing, extract_character(raw), "id", CHARACTER_TRACKED, batch_ts
    ) if existing is not None else _first_load(extract_character(raw), batch_ts)


def build_stg_location(
    raw: DataFrame, existing: DataFrame | None, batch_ts: Column
) -> DataFrame:
    return upsert_preserving(
        existing, extract_location(raw), "id", LOCATION_TRACKED, batch_ts
    ) if existing is not None else _first_load(extract_location(raw), batch_ts)


def build_stg_episode(
    raw: DataFrame, existing: DataFrame | None, batch_ts: Column
) -> DataFrame:
    return upsert_preserving(
        existing, extract_episode(raw), "id", EPISODE_TRACKED, batch_ts
    ) if existing is not None else _first_load(extract_episode(raw), batch_ts)


def _first_load(snapshot: DataFrame, batch_ts: Column) -> DataFrame:
    return snapshot.select(
        "*", batch_ts.alias("loaded_at"), batch_ts.alias("last_upd_at")
    )


# ---------------------------------------------------------------------------
# link tables (A1 + S6)
# ---------------------------------------------------------------------------


def _link_do_nothing(
    snapshot: DataFrame, existing: DataFrame | None, keys: list[str]
) -> DataFrame:
    """``ON CONFLICT DO NOTHING`` link semantics: existing rows keep their
    original ``loaded_at``; only never-seen keys append with the current
    batch clock (dags/stg_character.py:171 et al.). One anti-join shuffle
    on the PK, no rewrite of surviving rows' values."""
    if existing is None:
        return snapshot
    return existing.unionByName(anti_append(snapshot, existing, keys))


def build_episode_ch(
    raw_character: DataFrame, batch_ts: Column, existing: DataFrame | None = None
) -> DataFrame:
    """stg.episode_ch: (character id, episode url), PK (id, url) DO NOTHING
    (dags/stg_character.py:161-173)."""
    d = _parsed(raw_character, CHARACTER_PAYLOAD)
    snap = explode_links(d, "d.id", F.col("d.episode")).select(
        F.col("id"), F.col("url"), batch_ts.alias("loaded_at")
    )
    return _link_do_nothing(snap, existing, ["id", "url"])


def build_character_ep(
    raw_episode: DataFrame, batch_ts: Column, existing: DataFrame | None = None
) -> DataFrame:
    """stg.character_ep: (episode id, character url), PK (id, url)
    DO NOTHING (dags/stg_episode.py:86-98)."""
    d = _parsed(raw_episode, EPISODE_PAYLOAD)
    snap = explode_links(d, "d.id", F.col("d.characters")).select(
        F.col("id"), F.col("url"), batch_ts.alias("loaded_at")
    )
    return _link_do_nothing(snap, existing, ["id", "url"])


def build_character_loc(
    raw_location: DataFrame, batch_ts: Column, existing: DataFrame | None = None
) -> DataFrame:
    """stg.character_loc: (location id, resident character url), PK
    (id, url) DO NOTHING (dags/stg_location.py:82-94)."""
    d = _parsed(raw_location, LOCATION_PAYLOAD)
    snap = explode_links(d, "d.id", F.col("d.residents")).select(
        F.col("id"), F.col("url"), batch_ts.alias("loaded_at")
    )
    return _link_do_nothing(snap, existing, ["id", "url"])


def build_location_ch(
    raw_character: DataFrame, batch_ts: Column, existing: DataFrame | None = None
) -> DataFrame:
    """stg.location_ch: character's origin + last-known location with role
    (dags/stg_character.py:100-147) — two projections of the same parse,
    empty urls normalized to NULL (P6, load-bearing for the Unknown join),
    rows with NULL url kept only when the reference keeps them (the
    reference filters ``url IS NOT NULL``, :113,:137).

    PK (id, role) with conditional update on (name, url): unchanged rows
    keep loaded_at AND last_upd_at; changed rows bump last_upd_at only
    (dags/stg_character.py:114-120) — upsert_preserving with a composite
    key, exactly the entity-table S5 path.
    """
    d = _parsed(raw_character, CHARACTER_PAYLOAD)
    last = d.select(
        F.col("d.id").alias("id"),
        F.col("d.location.name").alias("name"),
        normalize_empty_to_null(F.col("d.location.url")).alias("url"),
        F.lit("last").alias("role"),
    ).filter(F.col("d.location.url").isNotNull())
    origin = d.select(
        F.col("d.id").alias("id"),
        F.col("d.origin.name").alias("name"),
        normalize_empty_to_null(F.col("d.origin.url")).alias("url"),
        F.lit("origin").alias("role"),
    ).filter(F.col("d.origin.url").isNotNull())
    snap = (
        last.unionByName(origin)
        .dropDuplicates(["id", "role"])
        .select("id", "name", "url", "role")
    )
    if existing is None:
        return snap.select(
            "*", batch_ts.alias("loaded_at"), batch_ts.alias("last_upd_at")
        )
    return upsert_preserving(
        existing, snap, ["id", "role"], ["name", "url"], batch_ts
    )
