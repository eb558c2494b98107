"""Incremental maintenance of an SCD2-versioned join view (temporal ΔV).

ops/join_view.py maintains a denormalized fact ⋈ dim view for an SCD1
dimension (upserts overwrite in place, every fact row tracks the CURRENT
image). This module is the TEMPORAL composition with ops/scd2.py: the
dimension is versioned (``valid_from``/``valid_to`` half-open intervals,
one open version per key), and each fact row resolves against the version
valid at its own event date — the maintained, incremental form of the
point-in-time enrichment (``orders_customer_point_in_time``,
queries/relational.py) and the correct SK-resolution join for backfills
and late-arriving facts. The reference approximates this with an
``is_current`` join (/root/reference/dags/dwh_fact_charer_location.py:107-112),
which is only right for current-dated facts; resolving as-of the event
date is right for every fact, which is why an incremental view over it
needs versioned delta rules.

Delta rules (the SCD2 twist on ΔV = ΔF ⋈ D ∪ F ⋈ ΔD):

- **Fact delta**: the batch as-of joins the CURRENT version table —
  equi-join on the key with the validity range as a residual predicate
  (BroadcastHashJoin whenever the version table is dimension-sized —
  SCD2 keeps it a small multiple of the key count). Rows whose event
  date falls in no version's interval park in the ORPHAN ledger.
- **Dim delta**: an SCD2 dimension batch at ``batch_ts`` only CLOSES
  open versions at ``batch_ts`` and APPENDS versions — history rows are
  immutable (the scd2_apply contract). A fact row resolved to a version
  interval entirely below ``batch_ts`` is therefore untouched; the only
  rows whose resolution can change are (a) view rows of a changed key
  with ``event >= batch_ts`` (their open version closed — they re-resolve
  to the new version, or DEMOTE to orphans when the key was soft-closed
  with no successor) and (b) orphans of a touched key at ANY date (a
  backdated insert — valid_from below batch_ts — may claim an old
  orphan). This touches strictly FEWER rows than the SCD1 dim delta:
  an attribute change refreshes only future-dated facts, not the key's
  whole history.

The maintained view carries the resolved payload plus ``valid_from`` (the
identity of the version a row resolved to — immutable once a version
opens). ``valid_to`` is deliberately NOT materialized in the view: it is
the one mutable field of a version (a later batch closes it), so storing
it would force the dim delta to rewrite every fact row of a changed key
instead of only the future-dated ones.

Invariant (pinned by tests and the oracle-gated
``order_customer_scd2_view_incremental``): after any interleaving of
fact batches and SCD2 dim batches, ``view ∪ orphans`` partitions the
facts seen so far and ``view`` equals the one-shot as-of join of those
facts against the FINAL version table. Crash posture of the persisted
legs matches ops/join_view.py: inserts land before cross-ledger deletes,
so a crash window shows a key in BOTH ledgers, never in neither.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_platform_spark.ops.join_view import (
    _DEL,
    _DIM_KEY,
    _ORPHANS_SUFFIX,
    _has_data,
    _leg_done,
    _mark_leg,
    _null_like,
    _upsert,
    JoinViewState,
)

VALID_FROM = "valid_from"
VALID_TO = "valid_to"


def _asof_split(
    fact: DataFrame,
    dim_versions: DataFrame,
    fact_on: str,
    dim_on: str,
    event_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Split fact rows into (resolved, unresolved) against a version
    table ``[dim_on, *payload, valid_from, valid_to]``. Versions are
    half-open ``[valid_from, valid_to)`` and non-overlapping per key, so
    each fact row matches at most one version — the join cannot fan out.
    The matched half carries the payload + ``valid_from``; ``valid_to``
    is dropped (see module note). Plan shape: equi-join on the key with
    the range as a residual filter — a hash join, never a range-only
    nested loop."""
    dimr = dim_versions.withColumnRenamed(dim_on, _DIM_KEY)
    cond = (
        (fact[fact_on] == F.col(_DIM_KEY))
        & (fact[event_col] >= F.col(VALID_FROM))
        & (fact[event_col] < F.col(VALID_TO))
    )
    matched = fact.join(dimr, cond, "inner").drop(_DIM_KEY, VALID_TO)
    unmatched = fact.join(dimr, cond, "left_anti")
    return matched, unmatched


def init_scd2_join_view(
    fact: DataFrame,
    dim_versions: DataFrame,
    fact_on: str,
    dim_on: str,
    event_col: str,
) -> JoinViewState:
    """First load: as-of join the initial fact image; rows with no valid
    version at their event date park as orphans."""
    matched, unmatched = _asof_split(
        fact, dim_versions, fact_on, dim_on, event_col
    )
    return JoinViewState(view=matched, orphans=unmatched)


def apply_fact_batch_scd2(
    state: JoinViewState,
    batch: DataFrame,
    dim_versions: DataFrame,
    fact_on: str,
    dim_on: str,
    fact_key: str,
    event_col: str,
) -> JoinViewState:
    """Fold one fact batch against the CURRENT version table. O(batch):
    the standing state is touched only by the fact-key upsert probes.
    A late-arriving fact resolves to whichever version covers its event
    date — including versions CLOSED long ago (the backfill case the
    is_current join gets wrong). ``batch`` must be unique per
    ``fact_key`` (upstream contract, as in ops/join_view.py)."""
    matched, unmatched = _asof_split(
        batch, dim_versions, fact_on, dim_on, event_col
    )
    # cross-ledger eviction probes broadcast the batch-derived key sets
    # (r16, guide §3.1): O(batch) by contract — the standing ledgers
    # never shuffle on a probe (the planner otherwise SortMergeJoins
    # them: join-product size estimates are inflated)
    return JoinViewState(
        view=_upsert(
            state.view.join(
                F.broadcast(unmatched.select(fact_key)),
                [fact_key],
                "left_anti",
            ),
            matched,
            fact_key,
        ),
        orphans=_upsert(
            state.orphans.join(
                F.broadcast(matched.select(fact_key)),
                [fact_key],
                "left_anti",
            ),
            unmatched,
            fact_key,
        ),
    )


def apply_scd2_dim_batch(
    state: JoinViewState,
    dim_versions: DataFrame,
    touched_keys: DataFrame,
    batch_ts,
    fact_on: str,
    dim_on: str,
    fact_key: str,
    event_col: str,
    dim_payload: list[str],
) -> JoinViewState:
    """Fold one SCD2 dimension batch into the state.

    ``dim_versions`` is the NEW version table (post ``scd2_apply`` —
    history immutable, open versions of touched keys closed at
    ``batch_ts``, new versions appended). ``touched_keys`` is a one-
    column frame of the business keys in the staging batch (a superset
    of the actually-changed keys is safe — an untouched key's
    re-resolution is the identity). ``batch_ts`` is the batch's
    close/open instant (python datetime/date or literal).

    Probe set — the ONLY rows whose resolution can change:
    view rows of a touched key with ``event >= batch_ts`` (strip payload
    + valid_from, re-resolve) ∪ orphans of a touched key at any date
    (backdated inserts may claim them). Both probes are semi-joins
    against the (broadcastable) key set; the re-resolution joins the
    version table restricted to those keys. Facts resolved to closed
    versions are never read, which is what makes an SCD2 attribute
    change cheaper than its SCD1 counterpart: O(future-dated facts of
    touched keys), not O(all facts of touched keys).
    """
    # the touched-key set is staging-batch-sized (its docstring
    # contract) — broadcast every probe against it, exactly as the
    # persisted twin (scd2_join_view_dim_persisted) already does; the
    # ``distinct`` stays because ``touched_keys`` may legitimately carry
    # duplicates ("a superset ... is safe") and it bounds the broadcast
    keys = F.broadcast(touched_keys.select(dim_on).distinct())
    ts = F.lit(batch_ts)

    touched_view = (
        state.view.filter(F.col(event_col) >= ts)
        .join(keys, state.view[fact_on] == keys[dim_on], "left_semi")
        .drop(*dim_payload, VALID_FROM)
    )
    touched_orphans = state.orphans.join(
        keys, state.orphans[fact_on] == keys[dim_on], "left_semi"
    )
    to_probe = touched_view.unionByName(touched_orphans)
    versions_of_keys = F.broadcast(
        dim_versions.join(keys, [dim_on], "left_semi")
    )
    matched, unmatched = _asof_split(
        to_probe, versions_of_keys, fact_on, dim_on, event_col
    )
    # Evictions probe on the BATCH-SIZED key set, not on broadcast
    # matched/unmatched fact-key sets (ADVICE r16 #2: those are O(fact
    # rows of touched keys) — unbounded by the dim batch, so a hot key
    # could push the forced broadcast past the 8 GB / 512M-row cap).
    # The removal sets are provably equal: ``_asof_split`` partitions
    # ``to_probe`` (matched ∪ unmatched keys = to_probe keys, every key
    # in exactly one half), the view's intersection with to_probe is
    # exactly its rows with ``event >= ts`` and ``fact_on ∈ keys`` (the
    # touched_view probe), and the orphans' intersection is exactly its
    # rows with ``fact_on ∈ keys`` — promoted/demoted keys can't sit in
    # the other ledger (``view ∪ orphans`` partitions the facts). So the
    # anti probes below remove the same rows the two fact-key upsert
    # probes did, with the broadcast bounded by the staging batch and,
    # at scale, prunable on the join key the ledgers are laid out by.
    return JoinViewState(
        view=state.view.join(
            keys,
            (state.view[fact_on] == keys[dim_on])
            & (state.view[event_col] >= ts),
            "left_anti",
        ).unionByName(matched),
        orphans=state.orphans.join(
            keys, state.orphans[fact_on] == keys[dim_on], "left_anti"
        ).unionByName(unmatched),
    )


# --- persisted variants (Warehouse-backed) ----------------------------------


def incremental_scd2_join_view(
    spark,
    wh,
    schema: str,
    table: str,
    fact_batch: DataFrame,
    dim_versions: DataFrame,
    *,
    fact_on: str,
    dim_on: str,
    fact_key: str,
    event_col: str,
    dim_payload: list[str],
    partition_col: str,
    batch_id: str | None = None,
) -> list[str]:
    """Fold one fact batch into the stored SCD2 view (as-of resolution
    against the current version table). Same merge discipline as
    ops/join_view.incremental_join_view — inserts before cross-ledger
    deletes, ``fact--<id>`` replay markers, partition-pruned journaled
    merges. Returns the rewritten partition list (``[]`` for a replay)."""
    if batch_id is not None and _leg_done(wh, schema, table, "fact", batch_id):
        return []
    matched, unmatched = _asof_split(
        fact_batch, dim_versions, fact_on, dim_on, event_col
    )
    matched = matched.localCheckpoint()
    unmatched = unmatched.localCheckpoint()
    has_unmatched = bool(unmatched.limit(1).count())
    written: list[str] = []
    orph_table = table + _ORPHANS_SUFFIX

    view_existed = _has_data(wh, schema, table, partition_col)
    if not view_existed:
        wh.write(matched, schema, table, partition_by=[partition_col])
        written.append(f"first-load {schema}/{table}")
    else:
        written += wh.merge(
            spark, schema, table, matched, [fact_key], partition_col
        )

    if not _has_data(wh, schema, orph_table, partition_col):
        if has_unmatched:
            wh.write(unmatched, schema, orph_table, partition_by=[partition_col])
            written.append(f"first-load {schema}/{orph_table}")
    else:
        orph_ups = unmatched.withColumn(_DEL, F.lit(False)).unionByName(
            matched.select(*unmatched.columns).withColumn(_DEL, F.lit(True))
        )
        written += wh.merge(
            spark,
            schema,
            orph_table,
            orph_ups,
            [fact_key],
            partition_col,
            delete_col=_DEL,
        )

    if has_unmatched and view_existed:
        dels = _null_like(
            unmatched, matched, dim_payload + [VALID_FROM]
        ).withColumn(_DEL, F.lit(True))
        written += wh.merge(
            spark, schema, table, dels, [fact_key], partition_col, delete_col=_DEL
        )

    if batch_id is not None:
        _mark_leg(wh, schema, table, "fact", batch_id)
    return written


def scd2_join_view_dim_persisted(
    spark,
    wh,
    schema: str,
    table: str,
    dim_versions: DataFrame,
    touched_keys: DataFrame,
    batch_ts,
    *,
    fact_on: str,
    dim_on: str,
    fact_key: str,
    event_col: str,
    dim_payload: list[str],
    partition_col: str,
    batch_id: str | None = None,
) -> list[str]:
    """Persisted SCD2 dim batch: re-resolve exactly the future-dated view
    rows of touched keys plus their orphans against the new version
    table. Promotions land in the view, demotions (a soft-closed key
    with no successor version) land in orphans — inserts before the
    cross-ledger deletes, ``dim--<id>`` replay markers."""
    if batch_id is not None and _leg_done(wh, schema, table, "dim", batch_id):
        return []
    keys = touched_keys.select(dim_on).distinct()
    ts = F.lit(batch_ts)
    written: list[str] = []
    orph_table = table + _ORPHANS_SUFFIX

    parts: list[DataFrame] = []
    view_existed = _has_data(wh, schema, table, partition_col)
    if view_existed:
        view = wh.read(spark, schema, table)
        parts.append(
            view.filter(F.col(event_col) >= ts)
            .join(F.broadcast(keys), view[fact_on] == keys[dim_on], "left_semi")
            .drop(*dim_payload, VALID_FROM)
        )
    orph_existed = _has_data(wh, schema, orph_table, partition_col)
    if orph_existed:
        orphans = wh.read(spark, schema, orph_table)
        touched_orphans = orphans.join(
            F.broadcast(keys), orphans[fact_on] == keys[dim_on], "left_semi"
        )
        parts.append(
            touched_orphans.select(*parts[0].columns)
            if parts
            else touched_orphans
        )
    if not parts:
        return written
    to_probe = parts[0]
    for p in parts[1:]:
        to_probe = to_probe.unionByName(p)
    versions_of_keys = dim_versions.join(F.broadcast(keys), [dim_on], "left_semi")
    matched, unmatched = _asof_split(
        to_probe, F.broadcast(versions_of_keys), fact_on, dim_on, event_col
    )
    # a crash between merges can leave a moved key in BOTH ledgers; the
    # replay's probe then sees the row twice — dedupe by key (images are
    # identical: both derive from the same immutable fact columns)
    matched = matched.dropDuplicates([fact_key]).localCheckpoint()
    unmatched = unmatched.dropDuplicates([fact_key]).localCheckpoint()
    has_matched = bool(matched.limit(1).count())
    has_unmatched = bool(unmatched.limit(1).count())

    # INSERT halves first (module crash posture)
    if has_matched:
        if view_existed:
            written += wh.merge(
                spark, schema, table, matched, [fact_key], partition_col
            )
        else:
            wh.write(matched, schema, table, partition_by=[partition_col])
            written.append(f"first-load {schema}/{table}")
    if has_unmatched:
        if orph_existed:
            written += wh.merge(
                spark, schema, orph_table, unmatched, [fact_key], partition_col
            )
        else:
            wh.write(unmatched, schema, orph_table, partition_by=[partition_col])
            written.append(f"first-load {schema}/{orph_table}")

    # DELETE halves: evict moved keys from the opposite ledger
    if has_matched and orph_existed:
        od = matched.select(*to_probe.columns).withColumn(_DEL, F.lit(True))
        written += wh.merge(
            spark, schema, orph_table, od, [fact_key], partition_col,
            delete_col=_DEL,
        )
    if has_unmatched and view_existed:
        vd = _null_like(
            unmatched, matched, dim_payload + [VALID_FROM]
        ).withColumn(_DEL, F.lit(True))
        written += wh.merge(
            spark, schema, table, vd, [fact_key], partition_col,
            delete_col=_DEL,
        )

    if batch_id is not None:
        _mark_leg(wh, schema, table, "dim", batch_id)
    return written
