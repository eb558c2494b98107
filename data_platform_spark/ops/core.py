"""Reusable operator library — the reference's SQL idioms as DataFrame
algebra (SURVEY.md §2 mappings).

Every function is pure (DataFrame in → DataFrame out), declarative, and
shuffle-aware; none require custom Catalyst rules. Citations point into
/root/reference/ for parity checking.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Engine replacement for Postgres 'infinity'::timestamptz
# (dags/dwh_dim_character.py:102, dags/configure.py:294).
VALID_TO_INFINITY = "9999-12-31 00:00:00"


def infinity_ts() -> Column:
    return F.lit(VALID_TO_INFINITY).cast("timestamp")


def changed(left: str, right: str, cols: list[str]) -> Column:
    """Null-safe any-column-differs predicate (P10).

    The reference's ``a.c IS DISTINCT FROM b.c OR ...`` fold
    (dags/stg_character.py:75-81, dags/dwh_dim_character.py:63-69) —
    Spark's eqNullSafe negated and OR-folded. ``left``/``right`` are
    dataframe aliases.
    """
    return reduce(
        or_,
        [
            ~F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
            for c in cols
        ],
    )


def normalize_empty_to_null(col: Column) -> Column:
    """``NULLIF(TRIM(url), '')`` (P6, dags/stg_character.py:108).

    Load-bearing: the API encodes "unknown origin" as ``url: ""``; the
    Unknown-member join keys on the resulting NULL.
    """
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(None).cast("string")).otherwise(trimmed)


def guarded_to_date(col: Column) -> Column:
    """Regex-guarded 'Month D, YYYY' parse (P5, dags/stg_episode.py:49-53).

    PG pattern ``Month DD, YYYY`` ↔ Spark ``MMMM d, yyyy``; anything not
    matching the shape (e.g. 'unknown') → NULL instead of a parse error.
    """
    shape = r"^[A-Za-z]+ [0-9]{1,2}, [0-9]{4}$"
    return F.when(
        col.rlike(shape), F.to_date(col, "MMMM d, yyyy")
    ).otherwise(F.lit(None).cast("date"))


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """PG ``UNION`` semantics (U1): Spark union does NOT dedup — pair it.

    (dags/dwh_fact_character_episode.py:55-74)
    """
    return reduce(DataFrame.union, dfs).distinct()


def anti_append(new: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Insert-if-absent (S6/J4): rows of ``new`` whose key is not in
    ``existing`` — the reference's ``ON CONFLICT DO NOTHING`` and fact
    anti-join incrementality (dags/dwh_fact_character_episode.py:103-110).
    """
    return new.join(existing.select(*keys), keys, "left_anti")


def upsert_preserving(
    existing: DataFrame,
    incoming: DataFrame,
    key: str | list[str],
    tracked_cols: list[str],
    batch_ts: Column,
    preserved_cols: tuple[str, str] = ("loaded_at", "last_upd_at"),
) -> DataFrame:
    """Conditional upsert with change predicate (S5).

    The reference's ``ON CONFLICT DO UPDATE ... WHERE any col IS DISTINCT
    FROM EXCLUDED`` (dags/stg_character.py:65-81): update only rows that
    actually changed, preserving ``loaded_at`` and bumping ``last_upd_at``
    for changed rows only. Functional rewrite: full-outer join old/new,
    per-row three-way case. One shuffle on the key; output is the complete
    new table state (write-and-swap, SURVEY.md §4.3.5).

    ``key`` may be a composite key (list) — e.g. the reference's
    ``location_ch`` PK (id, role) (dags/stg_character.py:114).

    ``incoming`` must carry ``key`` + ``tracked_cols``; timestamps are
    assigned here from the single ``batch_ts`` (P7 determinism: one clock
    per pipeline run, like PG's transaction-constant now()).
    """
    keys = [key] if isinstance(key, str) else list(key)
    loaded_col, upd_col = preserved_cols
    old = existing.alias("old")
    new = incoming.alias("new")
    cond = changed("old", "new", tracked_cols)
    on = reduce(
        lambda a, b: a & b,
        [F.col(f"old.{k}") == F.col(f"new.{k}") for k in keys],
    )
    joined = old.join(new, on=on, how="full_outer")

    is_insert = F.col(f"old.{keys[0]}").isNull()
    is_update = (~is_insert) & F.col(f"new.{keys[0]}").isNotNull() & cond

    out_cols = [
        F.coalesce(F.col(f"new.{k}"), F.col(f"old.{k}")).alias(k) for k in keys
    ]
    for c in tracked_cols:
        out_cols.append(
            F.when(is_insert | is_update, F.col(f"new.{c}"))
            .otherwise(F.col(f"old.{c}"))
            .alias(c)
        )
    out_cols.append(
        F.when(is_insert, batch_ts).otherwise(F.col(f"old.{loaded_col}")).alias(loaded_col)
    )
    out_cols.append(
        F.when(is_insert | is_update, batch_ts)
        .otherwise(F.col(f"old.{upd_col}"))
        .alias(upd_col)
    )
    return joined.select(*out_cols)


def assign_sk(
    df: DataFrame,
    sk_col: str,
    order_by: list[str],
    start_at: int = 1,
) -> DataFrame:
    """Deterministic surrogate keys replacing SERIAL (dags/configure.py:200).

    row_number over a global window ordered by business key, offset by the
    current max. Deterministic across reruns and partition layouts (unlike
    monotonically_increasing_id). The single-partition window is applied
    only to the INCREMENT (new versions per batch — small); never to the
    full dimension (SURVEY.md §4.3.3).
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(
        sk_col, (F.row_number().over(w) + F.lit(start_at - 1)).cast("long")
    )


def explode_links(
    df: DataFrame, id_col: str, array_col: Column, out_col: str = "url"
) -> DataFrame:
    """JSON-array → link-table rows (A1, dags/stg_character.py:161-173):
    one row per (id, element), deduped — PK(id, url) semantics.

    ``id_col`` may be a struct path ("d.id"); output column is its leaf.
    """
    leaf = id_col.split(".")[-1]
    return (
        df.select(F.col(id_col).alias(leaf), F.explode(array_col).alias(out_col))
        .dropDuplicates([leaf, out_col])
    )


def dim_as_of(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time view of an SCD2 dimension: the version of each
    business key valid at ``ts`` (valid_from <= ts < valid_to).

    The payoff of SCD2 bookkeeping: any historical join reproduces the
    world as of that moment (facts join this instead of is_current).
    """
    t = F.lit(ts).cast("timestamp")
    return dim.filter((F.col("valid_from") <= t) & (t < F.col("valid_to")))


def with_sentinel_key(
    df: DataFrame, key_col: str, sentinel: str = "__UNKNOWN__"
) -> DataFrame:
    """Rewrite a NULLable join key to a sentinel value (J5 rewrite).

    The reference's disjunctive Unknown-member join
    (dags/dwh_fact_charer_location.py:108-111) would plan as a
    broadcast-nested-loop; coalescing NULL keys to a sentinel that the
    dimension also carries turns it into a plain equi-join.
    """
    return df.withColumn(key_col, F.coalesce(F.col(key_col), F.lit(sentinel)))


def corpus_version_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    content_cols: list[str],
) -> DataFrame:
    """Content-hash diff between two corpus snapshots (pairs with the
    warehouse's time-travel reads): per key, classify as ``added``,
    ``removed``, ``changed`` or ``unchanged`` — the audit that answers
    "what moved between the corpus that trained run A and run B".

    One shuffle each side on the key (full-outer join of (key, hash)
    projections — content never shuffles); classification is a per-row
    CASE. Returns (key, status, old_hash, new_hash).

    NULLs are hashed distinguishably: concat_ws silently DROPS null
    arguments, so without the sentinel a column flipping NULL↔'' (or a
    value sliding into an adjacent column across a NULL) would collide
    to the same hash and a changed row would read 'unchanged'. Each
    content column is coalesced to a sentinel that cannot appear in
    real data (\\x00-prefixed) before concatenation.
    """

    def _nn(c: str) -> Column:
        return F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))

    oh = old.select(
        F.col(key),
        F.md5(F.concat_ws("\x1f", *[_nn(c) for c in content_cols])).alias(
            "old_hash"
        ),
    )
    nh = new.select(
        F.col(key),
        F.md5(F.concat_ws("\x1f", *[_nn(c) for c in content_cols])).alias(
            "new_hash"
        ),
    )
    j = oh.join(nh, key, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(key, status.alias("status"), "old_hash", "new_hash")
