"""StructType registry — single source of truth for every engine schema.

The reference duplicates DDL per-DAG (e.g. `/root/reference/dags/
configure.py:90-108` repeated at `dags/stg_character.py:27-45`); here each
schema exists exactly once. Payload schemas mirror the fields the
reference's staging layer extracts from raw JSONB
(`dags/stg_character.py:52-63`, `dags/stg_episode.py:44-57`,
`dags/stg_location.py:46-54`) — declared, never inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# bronze (raw) layer: (source_id, payload json-string, loaded_at)
# — raw.character/location/episode (dags/configure.py:54-88)
# --------------------------------------------------------------------------

RAW_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.IntegerType(), False),
        T.StructField("payload", T.StringType(), False),
        T.StructField("loaded_at", T.TimestampType(), False),
    ]
)

# payload schemas for from_json (schema-on-read at staging time)
_NAME_URL = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)

CHARACTER_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("species", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("image", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("created", T.StringType()),
        T.StructField("origin", _NAME_URL),
        T.StructField("location", _NAME_URL),
        T.StructField("episode", T.ArrayType(T.StringType())),
    ]
)

LOCATION_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("dimension", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("created", T.StringType()),
        T.StructField("residents", T.ArrayType(T.StringType())),
    ]
)

EPISODE_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("episode", T.StringType()),
        T.StructField("air_date", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("created", T.StringType()),
        T.StructField("characters", T.ArrayType(T.StringType())),
    ]
)

PAYLOAD_SCHEMAS = {
    "character": CHARACTER_PAYLOAD,
    "location": LOCATION_PAYLOAD,
    "episode": EPISODE_PAYLOAD,
}

# --------------------------------------------------------------------------
# silver (stg) layer — dags/configure.py:90-193
# --------------------------------------------------------------------------

STG_CHARACTER = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("species", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("image", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("source_created_at", T.TimestampType()),
        T.StructField("loaded_at", T.TimestampType()),
        T.StructField("last_upd_at", T.TimestampType()),
    ]
)

STG_LOCATION = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("dimension", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("source_created_at", T.TimestampType()),
        T.StructField("loaded_at", T.TimestampType()),
        T.StructField("last_upd_at", T.TimestampType()),
    ]
)

STG_EPISODE = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("episode", T.StringType()),
        T.StructField("air_date", T.DateType()),
        T.StructField("url", T.StringType()),
        T.StructField("source_created_at", T.TimestampType()),
        T.StructField("loaded_at", T.TimestampType()),
        T.StructField("last_upd_at", T.TimestampType()),
    ]
)

# link tables (dags/configure.py:110-135,154-164,183-193)
STG_LINK = T.StructType(  # episode_ch / character_ep / character_loc
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("loaded_at", T.TimestampType()),
    ]
)

STG_LOCATION_CH = T.StructType(  # location_ch: PK (id, role)
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("role", T.StringType(), False),  # 'origin' | 'last'
        T.StructField("loaded_at", T.TimestampType()),
    ]
)
