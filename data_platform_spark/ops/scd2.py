"""SCD Type-2 dimension maintenance as a single declarative plan.

The reference implements SCD2 as a Postgres transaction: UPDATE close-out
of changed current versions + INSERT of new versions
(/root/reference/dags/dwh_dim_character.py:49-118, dwh_dim_location.py:51-101,
dwh_dim_episode.py:51-104). Spark has no UPDATE; the engine computes the
COMPLETE new dimension state in one Catalyst plan:

    history (is_current = false)          -- untouched
  ∪ unchanged current versions            -- carried over
  ∪ closed-out versions (valid_to=batch_ts, is_current=false)
  ∪ newly opened versions (valid_from=batch_ts, valid_to=∞, sk assigned)

and the caller atomically swaps the table (write-temp-then-rename,
pipeline.Warehouse). Close and open timestamps share one ``batch_ts`` —
the engine's analog of PG's transaction-constant now()
(SURVEY.md §4.3.1).

Scale: the joins are keyed on the business key (shuffle once); the only
global window is SK assignment over the batch INCREMENT (new/changed rows
only — small relative to the dimension), per SURVEY.md §4.3.3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_platform_spark.ops.core import assign_sk, changed, infinity_ts


def scd2_apply(
    dim: DataFrame | None,
    stg: DataFrame,
    business_key: str,
    tracked_cols: list[str],
    carried_cols: list[str],
    sk_col: str,
    batch_ts: Column,
    close_missing: bool = False,
) -> DataFrame:
    """Return the full new state of an SCD2 dimension.

    dim: current dimension state (None or empty for first load) with
         columns [sk_col, business_key, *tracked_cols, *carried_cols,
         created_at, last_upd_at, valid_from, valid_to, is_current].
    stg: staging snapshot, one row per business key, with
         [business_key, *tracked_cols, *carried_cols].
    tracked_cols: change-detected attributes (IS DISTINCT FROM set,
         dags/dwh_dim_character.py:63-69).
    carried_cols: attributes copied to new versions but not change-
         detected (e.g. source_created_at).
    close_missing: source-delete handling. The reference never closes a
         key that vanished from the snapshot (absent keys stay current —
         its API is append-only); with ``close_missing=True`` such keys
         are soft-closed at ``batch_ts`` instead (full-snapshot sources
         where absence means deletion).
    """
    attr_cols = tracked_cols + carried_cols

    if dim is None or not dim.columns:
        new_versions = assign_sk(
            stg.select(business_key, *attr_cols),
            sk_col,
            order_by=[business_key],
            start_at=1,
        )
        return new_versions.select(
            sk_col,
            business_key,
            *attr_cols,
            batch_ts.alias("created_at"),
            batch_ts.alias("last_upd_at"),
            batch_ts.alias("valid_from"),
            infinity_ts().alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    cur = current.alias("cur")
    snap = stg.alias("snap")
    match = F.col(f"cur.{business_key}") == F.col(f"snap.{business_key}")
    is_changed = changed("cur", "snap", tracked_cols)

    joined = cur.join(snap, match, "left")

    snap_missing = F.col(f"snap.{business_key}").isNull()
    if close_missing:
        # absent key = source delete: keep only unchanged PRESENT keys,
        # close both changed and vanished keys
        unchanged = joined.filter(~snap_missing & ~is_changed).select("cur.*")
        close_pred = snap_missing | is_changed
    else:
        # reference semantics: absent keys stay current untouched
        unchanged = joined.filter(snap_missing | ~is_changed).select("cur.*")
        close_pred = ~snap_missing & is_changed

    # current rows to close out
    closed = joined.filter(close_pred).select(
        F.col(f"cur.{sk_col}").alias(sk_col),
        F.col(f"cur.{business_key}").alias(business_key),
        *[F.col(f"cur.{c}").alias(c) for c in attr_cols],
        F.col("cur.created_at").alias("created_at"),
        batch_ts.alias("last_upd_at"),
        F.col("cur.valid_from").alias("valid_from"),
        batch_ts.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )

    # snapshot rows that are new keys or changed keys: open new versions
    opened_src = (
        snap.join(cur, match, "left")
        .filter(F.col(f"cur.{business_key}").isNull() | is_changed)
        .select("snap.*")
    )
    max_sk = (dim.agg(F.max(sk_col)).collect()[0][0]) or 0
    opened = assign_sk(
        opened_src.select(business_key, *attr_cols),
        sk_col,
        order_by=[business_key],
        start_at=int(max_sk) + 1,
    ).select(
        sk_col,
        business_key,
        *attr_cols,
        batch_ts.alias("created_at"),
        batch_ts.alias("last_upd_at"),
        batch_ts.alias("valid_from"),
        infinity_ts().alias("valid_to"),
        F.lit(True).alias("is_current"),
    )

    ordered_cols = [
        sk_col,
        business_key,
        *attr_cols,
        "created_at",
        "last_upd_at",
        "valid_from",
        "valid_to",
        "is_current",
    ]
    return (
        history.select(*ordered_cols)
        .unionByName(unchanged.select(*ordered_cols))
        .unionByName(closed)
        .unionByName(opened)
    )
