"""Reference-pipeline parity queries: the Rick&Morty-shaped ELT run over
the deterministic fixture universe, oracle-checked end to end.

These put the engine's FLAGSHIP surface — raw JSON → staging extraction →
SCD2 first load → fact build with Unknown-member resolution — into the
driver's correctness gate, not just pytest. Both sides consume the exact
same payload JSON (embedded as literals in the oracle SQL), a fixed batch
clock, and the engine's deterministic SK ordering, so every value is
reproducible.

sf_dir is ignored: the reference pipeline's inputs are API payloads, not
the benchmark star schema (multi-run SCD2 evolution is covered by
tests/test_pipeline.py and the hypothesis property suite).
"""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.layers import dwh as L_dwh
from data_platform_spark.layers import stg as L_stg
from data_platform_spark.ops.core import VALID_TO_INFINITY
from data_platform_spark.schemas import RAW_SCHEMA
from data_platform_spark.sources.fixtures import base_universe

BATCH_TS = datetime(2026, 1, 1, 12, 0, 0)
_TS_SQL = "TIMESTAMP '2026-01-01 12:00:00'"
_INF_SQL = f"TIMESTAMP '{VALID_TO_INFINITY}'"
# valid_to leaves the dim as a STRING in gate queries: the 9999-12-31 open
# sentinel overflows pandas ns timestamps in the driver's canonicalizer.
_INF_STR = f"'{VALID_TO_INFINITY}'"
def _valid_to_str():
    return F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to")


def _payloads(entities) -> list[str]:
    return [json.dumps(e, sort_keys=True) for e in entities]


def _bronze(spark: SparkSession, entities) -> DataFrame:
    rows = [(e["id"], json.dumps(e, sort_keys=True), BATCH_TS) for e in entities]
    return spark.createDataFrame(rows, RAW_SCHEMA)


def _sql_values(entities) -> str:
    vals = ",\n                ".join(
        "('" + p.replace("'", "''") + "'::JSON)" for p in _payloads(entities)
    )
    return f"(VALUES\n                {vals}) AS t(j)"


def rm_dim_character_first_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raw → stg → SCD2 first load of dim_character (engine path), against
    an oracle that re-derives the same dimension from the same JSON."""
    raw = _bronze(spark, base_universe()[0])
    stg = L_stg.build_stg_character(raw, None, F.lit(BATCH_TS))
    dim = L_dwh.build_dim_character(None, stg, F.lit(BATCH_TS))
    return dim.select(
        "character_sk",
        "character_id",
        "name",
        "status",
        "species",
        "type",
        "gender",
        "character_url",
        "valid_from",
        _valid_to_str(),
        "is_current",
    )


def rm_fact_char_loc_first_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full first-load fact build: link extraction (P6 normalization +
    Unknown sentinel), both dims, role resolution, SK joins — the
    reference's hardest path (J5) oracle-checked end to end."""
    chars, locs, _eps = base_universe()
    raw_ch = _bronze(spark, chars)
    raw_loc = _bronze(spark, locs)
    ts = F.lit(BATCH_TS)
    stg_ch = L_stg.build_stg_character(raw_ch, None, ts)
    stg_loc = L_stg.build_stg_location(raw_loc, None, ts)
    location_ch = L_stg.build_location_ch(raw_ch, ts)
    character_loc = L_stg.build_character_loc(raw_loc, ts)
    dim_ch = L_dwh.build_dim_character(None, stg_ch, ts)
    dim_loc = L_dwh.build_dim_location(None, stg_loc, spark, ts)
    fact = L_dwh.build_fact_char_loc(
        None, location_ch, character_loc, stg_ch, dim_ch, dim_loc,
        L_dwh.dim_location_role(spark), ts,
    )
    return fact.select(
        "character_sk", "location_sk", F.col("role_id").cast("int").alias("role_id")
    )


QUERIES = {
    "rm_dim_character_first_load": rm_dim_character_first_load,
    "rm_fact_char_loc_first_load": rm_fact_char_loc_first_load,
}


def _build_oracle() -> dict[str, str]:
    chars, locs, _eps = base_universe()
    chars_values = _sql_values(chars)
    locs_values = _sql_values(locs)
    return {
        "rm_dim_character_first_load": f"""
            SELECT
                row_number() OVER (ORDER BY json_extract_string(j,'$.id')::INT)
                    AS character_sk,
                json_extract_string(j,'$.id')::INT AS character_id,
                json_extract_string(j,'$.name') AS name,
                json_extract_string(j,'$.status') AS status,
                json_extract_string(j,'$.species') AS species,
                json_extract_string(j,'$.type') AS type,
                json_extract_string(j,'$.gender') AS gender,
                json_extract_string(j,'$.url') AS character_url,
                {_TS_SQL} AS valid_from,
                {_INF_STR} AS valid_to,
                TRUE AS is_current
            FROM {chars_values}
        """,
        "rm_fact_char_loc_first_load": f"""
            WITH chars AS (
                SELECT
                    json_extract_string(j,'$.id')::INT AS character_id,
                    json_extract_string(j,'$.url') AS char_url,
                    nullif(trim(json_extract_string(j,'$.location.url')), '')
                        AS last_url_raw,
                    json_extract_string(j,'$.location.url') AS last_url_present,
                    nullif(trim(json_extract_string(j,'$.origin.url')), '')
                        AS origin_url_raw,
                    json_extract_string(j,'$.origin.url') AS origin_url_present
                FROM {chars_values}
            ),
            locs AS (
                SELECT
                    json_extract_string(j,'$.id')::INT AS location_id,
                    json_extract_string(j,'$.url') AS location_url,
                    (j->'$.residents')::VARCHAR[] AS residents
                FROM {locs_values}
            ),
            dim_character AS (
                SELECT character_id,
                       char_url,
                       row_number() OVER (ORDER BY character_id) AS character_sk
                FROM chars
            ),
            dim_location AS (
                SELECT location_id, location_url,
                       row_number() OVER (ORDER BY location_id) AS location_sk
                FROM (
                    SELECT -1 AS location_id, '__UNKNOWN__' AS location_url
                    UNION ALL
                    SELECT location_id, location_url FROM locs
                )
            ),
            c_edges AS (
                -- role 'last' from character.location (present but maybe
                -- empty -> sentinel), role 'origin' from character.origin
                SELECT character_id,
                       coalesce(last_url_raw, '__UNKNOWN__') AS location_url,
                       'last' AS role_name
                FROM chars WHERE last_url_present IS NOT NULL
                UNION
                SELECT character_id,
                       coalesce(origin_url_raw, '__UNKNOWN__') AS location_url,
                       'origin' AS role_name
                FROM chars WHERE origin_url_present IS NOT NULL
            ),
            l_edges AS (
                SELECT c.character_id,
                       l.location_url,
                       'last' AS role_name
                FROM locs l, unnest(l.residents) AS r(resident_url)
                JOIN chars c ON c.char_url = r.resident_url
            ),
            edges AS (
                SELECT * FROM c_edges UNION SELECT * FROM l_edges
            )
            SELECT
                dc.character_sk,
                dl.location_sk,
                CASE e.role_name WHEN 'origin' THEN 1 ELSE 2 END AS role_id
            FROM edges e
            JOIN dim_character dc ON dc.character_id = e.character_id
            JOIN dim_location dl ON dl.location_url = e.location_url
        """,
    }


ORACLE = _build_oracle()


BATCH_TS2 = datetime(2026, 2, 1, 12, 0, 0)
_TS2_SQL = "TIMESTAMP '2026-02-01 12:00:00'"
_TS2_STR = "'2026-02-01 12:00:00'"


def rm_dim_character_after_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 close+open semantics in the correctness gate: run 1 loads the
    base universe, run 2 applies the mutated universe (char 1 status
    change, char 3 type change) — the oracle re-derives the exact final
    dimension (closed/opened versions, aligned timestamps, incremental
    SKs) from both embedded snapshots."""
    from data_platform_spark.sources.fixtures import mutated_universe

    ts1, ts2 = F.lit(BATCH_TS), F.lit(BATCH_TS2)
    stg1 = L_stg.build_stg_character(_bronze(spark, base_universe()[0]), None, ts1)
    dim1 = L_dwh.build_dim_character(None, stg1, ts1)
    # materialize run 1 (the warehouse write/read cycle) so run 2's plan
    # doesn't recompute it twice with fresh SK windows; localCheckpoint
    # pins the rows executor-side — no driver roundtrip
    dim1 = dim1.localCheckpoint(eager=True)
    stg2 = L_stg.build_stg_character(
        _bronze(spark, mutated_universe()[0]), None, ts2
    )
    dim2 = L_dwh.build_dim_character(dim1, stg2, ts2)
    return dim2.select(
        "character_sk",
        "character_id",
        "status",
        "type",
        "valid_from",
        _valid_to_str(),
        "is_current",
    )


QUERIES["rm_dim_character_after_mutation"] = rm_dim_character_after_mutation


def _mutation_oracle() -> str:
    from data_platform_spark.sources.fixtures import mutated_universe

    base_values = _sql_values(base_universe()[0])
    mut_values = _sql_values(mutated_universe()[0])
    # tracked attribute set of build_dim_character
    cols = ["name", "status", "species", "type", "gender", "image"]
    parse = ",\n                    ".join(
        f"json_extract_string(j,'$.{c}') AS {c}" for c in cols
    )
    changed = " OR ".join(
        f"b.{c} IS DISTINCT FROM m.{c}" for c in cols
    )
    return f"""
        WITH base AS (
            SELECT json_extract_string(j,'$.id')::INT AS character_id,
                    {parse}
            FROM {base_values}
        ),
        mut AS (
            SELECT json_extract_string(j,'$.id')::INT AS character_id,
                    {parse}
            FROM {mut_values}
        ),
        sk1 AS (
            SELECT character_id,
                   row_number() OVER (ORDER BY character_id) AS character_sk
            FROM base
        ),
        flags AS (
            SELECT b.character_id, ({changed}) AS is_changed
            FROM base b JOIN mut m ON b.character_id = m.character_id
        ),
        sk2 AS (
            -- run-2 SKs: max run-1 SK + row_number over changed keys
            SELECT f.character_id,
                   (SELECT max(character_sk) FROM sk1)
                   + row_number() OVER (ORDER BY f.character_id) AS character_sk
            FROM flags f WHERE f.is_changed
        )
        -- unchanged current versions (run 1 values, still open)
        SELECT s.character_sk, b.character_id, b.status, b.type,
               {_TS_SQL} AS valid_from, {_INF_STR} AS valid_to,
               TRUE AS is_current
        FROM base b
        JOIN sk1 s ON s.character_id = b.character_id
        JOIN flags f ON f.character_id = b.character_id AND NOT f.is_changed
        UNION ALL
        -- closed-out old versions of changed keys
        SELECT s.character_sk, b.character_id, b.status, b.type,
               {_TS_SQL} AS valid_from, {_TS2_STR} AS valid_to,
               FALSE AS is_current
        FROM base b
        JOIN sk1 s ON s.character_id = b.character_id
        JOIN flags f ON f.character_id = b.character_id AND f.is_changed
        UNION ALL
        -- newly opened versions with run-2 values and fresh SKs
        SELECT s2.character_sk, m.character_id, m.status, m.type,
               {_TS2_SQL} AS valid_from, {_INF_STR} AS valid_to,
               TRUE AS is_current
        FROM mut m
        JOIN sk2 s2 ON s2.character_id = m.character_id
    """


ORACLE["rm_dim_character_after_mutation"] = _mutation_oracle()


BATCH_TS3 = datetime(2026, 3, 1, 12, 0, 0)
_TS3_SQL = "TIMESTAMP '2026-03-01 12:00:00'"
_TS3_STR = "'2026-03-01 12:00:00'"


def rm_dim_character_three_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-clock SCD2 evolution in the correctness gate: base load, run-2
    mutation (char 1 Alive→Dead, char 3 type change), run-3 mutation
    (char 1 REVERTS to Alive — third version of the same key — and char 5
    changes for the first time). Exercises close-out of an already-closed
    key's successor, re-open with a fresh SK, and interleaved stable keys
    across batches (dags/dwh_dim_character.py:53-116 rerun three times)."""
    from data_platform_spark.sources.fixtures import (
        mutated_universe,
        mutated_universe_2,
    )

    ts1, ts2, ts3 = F.lit(BATCH_TS), F.lit(BATCH_TS2), F.lit(BATCH_TS3)
    stg1 = L_stg.build_stg_character(_bronze(spark, base_universe()[0]), None, ts1)
    dim1 = L_dwh.build_dim_character(None, stg1, ts1)
    dim1 = dim1.localCheckpoint(eager=True)  # pin run-1 state
    stg2 = L_stg.build_stg_character(
        _bronze(spark, mutated_universe()[0]), None, ts2
    )
    dim2 = L_dwh.build_dim_character(dim1, stg2, ts2)
    dim2 = dim2.localCheckpoint(eager=True)  # pin run-2 state
    stg3 = L_stg.build_stg_character(
        _bronze(spark, mutated_universe_2()[0]), None, ts3
    )
    dim3 = L_dwh.build_dim_character(dim2, stg3, ts3)
    return dim3.select(
        "character_sk",
        "character_id",
        "status",
        "species",
        "type",
        "valid_from",
        _valid_to_str(),
        "is_current",
    )


QUERIES["rm_dim_character_three_batches"] = rm_dim_character_three_batches


def _three_batch_oracle() -> str:
    from data_platform_spark.sources.fixtures import (
        mutated_universe,
        mutated_universe_2,
    )

    v1 = _sql_values(base_universe()[0])
    v2 = _sql_values(mutated_universe()[0])
    v3 = _sql_values(mutated_universe_2()[0])
    cols = ["name", "status", "species", "type", "gender", "image"]
    parse = ",\n                    ".join(
        f"json_extract_string(j,'$.{c}') AS {c}" for c in cols
    )

    def changed(a: str, b: str) -> str:
        return " OR ".join(f"{a}.{c} IS DISTINCT FROM {b}.{c}" for c in cols)

    return f"""
        WITH s1 AS (
            SELECT json_extract_string(j,'$.id')::INT AS character_id, {parse}
            FROM {v1}
        ),
        s2 AS (
            SELECT json_extract_string(j,'$.id')::INT AS character_id, {parse}
            FROM {v2}
        ),
        s3 AS (
            SELECT json_extract_string(j,'$.id')::INT AS character_id, {parse}
            FROM {v3}
        ),
        ch2 AS (
            SELECT a.character_id, ({changed("a", "b")}) AS chg
            FROM s1 a JOIN s2 b USING (character_id)
        ),
        ch3 AS (
            SELECT b.character_id, ({changed("b", "c")}) AS chg
            FROM s2 b JOIN s3 c USING (character_id)
        ),
        sk1 AS (
            SELECT character_id,
                   row_number() OVER (ORDER BY character_id) AS sk
            FROM s1
        ),
        sk2 AS (
            SELECT character_id,
                   (SELECT max(sk) FROM sk1)
                   + row_number() OVER (ORDER BY character_id) AS sk
            FROM ch2 WHERE chg
        ),
        sk3 AS (
            SELECT character_id,
                   (SELECT max(sk) FROM (
                       SELECT sk FROM sk1 UNION ALL SELECT sk FROM sk2
                   ))
                   + row_number() OVER (ORDER BY character_id) AS sk
            FROM ch3 WHERE chg
        )
        -- run-1 versions: close at T2 if changed then, else at T3 if
        -- changed then, else still open
        SELECT k.sk AS character_sk, s1.character_id, s1.status, s1.species,
               s1.type,
               {_TS_SQL} AS valid_from,
               CASE WHEN c2.chg THEN {_TS2_STR}
                    WHEN c3.chg THEN {_TS3_STR}
                    ELSE {_INF_STR} END AS valid_to,
               (NOT c2.chg AND NOT c3.chg) AS is_current
        FROM s1
        JOIN sk1 k USING (character_id)
        JOIN ch2 c2 USING (character_id)
        JOIN ch3 c3 USING (character_id)
        UNION ALL
        -- run-2 versions (only keys changed at run 2)
        SELECT k2.sk, s2.character_id, s2.status, s2.species, s2.type,
               {_TS2_SQL} AS valid_from,
               CASE WHEN c3.chg THEN {_TS3_STR} ELSE {_INF_STR} END,
               NOT c3.chg
        FROM s2
        JOIN sk2 k2 USING (character_id)
        JOIN ch3 c3 USING (character_id)
        UNION ALL
        -- run-3 versions (only keys changed at run 3)
        SELECT k3.sk, s3.character_id, s3.status, s3.species, s3.type,
               {_TS3_SQL} AS valid_from, {_INF_STR}, TRUE
        FROM s3
        JOIN sk3 k3 USING (character_id)
    """


ORACLE["rm_dim_character_three_batches"] = _three_batch_oracle()


# ---------------------------------------------------------------------------
# FK integrity: the reference's declarative constraints as a query
# ---------------------------------------------------------------------------


def fact_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FK constraints, checked as an engine query.

    Postgres enforces fact_char_loc's three FKs declaratively
    (dags/configure.py:341-354: character_sk -> dim_character,
    location_sk -> dim_location, role_id -> dim_location_role); the lake
    engine proves the same integrity with ops.integrity.fk_check — one
    broadcast-key join per FK over the first-load fact build. Expected:
    every FK row reports n_orphans = 0 with the true fact row count.
    """
    from data_platform_spark.ops.integrity import FkSpec, fk_check

    chars, locs, _eps = base_universe()
    raw_ch = _bronze(spark, chars)
    raw_loc = _bronze(spark, locs)
    ts = F.lit(BATCH_TS)
    stg_ch = L_stg.build_stg_character(raw_ch, None, ts)
    stg_loc = L_stg.build_stg_location(raw_loc, None, ts)
    location_ch = L_stg.build_location_ch(raw_ch, ts)
    character_loc = L_stg.build_character_loc(raw_loc, ts)
    dim_ch = L_dwh.build_dim_character(None, stg_ch, ts)
    dim_loc = L_dwh.build_dim_location(None, stg_loc, spark, ts)
    role = L_dwh.dim_location_role(spark)
    fact = L_dwh.build_fact_char_loc(
        None, location_ch, character_loc, stg_ch, dim_ch, dim_loc, role, ts
    )
    return fk_check(
        [
            FkSpec(fact, "fact_char_loc", "character_sk",
                   dim_ch, "dim_character", "character_sk"),
            FkSpec(fact, "fact_char_loc", "location_sk",
                   dim_loc, "dim_location", "location_sk"),
            FkSpec(fact, "fact_char_loc", "role_id",
                   role, "dim_location_role", "role_id"),
        ]
    )


QUERIES["fact_fk_orphans"] = fact_fk_orphans

# n_rows is genuinely re-derived (the full fact oracle as a subquery);
# n_orphans = 0 states exactly the constraint the reference declares.
_FACT_SQL = ORACLE["rm_fact_char_loc_first_load"]
ORACLE["fact_fk_orphans"] = f"""
    SELECT
        'fact_char_loc' AS fact_table,
        fk.fk_col,
        fk.ref_table,
        (SELECT count(*) FROM ({_FACT_SQL})) AS n_rows,
        CAST(0 AS BIGINT) AS n_orphans
    FROM (VALUES
        ('character_sk', 'dim_character'),
        ('location_sk', 'dim_location'),
        ('role_id', 'dim_location_role')
    ) AS fk(fk_col, ref_table)
"""
