"""Incremental equi-join view maintenance (fact ⋈ dim denormalization).

At 100 TB you never re-join the full fact table because a batch of fact
rows arrived or a handful of dimension rows changed; you MAINTAIN the
denormalized view. This is the classic delta rule for select-project-join
views — ΔV = ΔF ⋈ D  ∪  F ⋈ ΔD — expressed as DataFrame algebra, the
join-view counterpart of ops/incremental.py's rollup maintenance (and the
enrichment analog of the reference's incremental fact loads,
/root/reference/dags/dwh_fact_charer_location.py:55-117, which re-resolve
dimension attributes per batch rather than per full table):

- **Fact delta**: join ONLY the batch against the current dim image —
  O(batch), broadcast-joinable whenever the dim is dimension-sized — and
  upsert by fact key. Batch rows with no dim match park in an ORPHAN
  ledger (fact columns only) instead of being dropped, so a late-arriving
  dimension row can still claim them.
- **Dim upsert delta**: re-derive ONLY the view rows whose join key
  changed — a semi-join of the standing view/orphans against the changed
  keys picks the affected rows (at scale this is a partition-/bucket-
  pruned probe on the join key, never a view scan), their fact columns
  re-join the new dim image, and the refreshed + newly-promoted rows
  upsert by fact key. Cost is O(fact rows referencing changed keys),
  independent of view size.

Supported dim mutations are INSERT and UPDATE (the SCD1 surface: the key
set may grow, attributes may change in place). Dim DELETEs are out of
scope — a deleted dimension key under inner-join semantics demotes its
view rows back to orphans, which composes from the same primitives but is
not a shape the curation pipelines here produce.

Invariant (pinned by tests and the oracle-gated
``order_customer_view_incremental``): after any interleaving of fact
batches and dim upserts, ``view ∪ orphans`` partitions the fact rows seen
so far, and ``view`` equals the one-shot ``fact ⋈ current-dim`` — the
maintained state is indistinguishable from a full recompute.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class JoinViewState:
    """Maintained state: the denormalized view (fact + dim columns) and
    the orphan ledger (fact columns only — rows awaiting a dim match)."""

    view: DataFrame
    orphans: DataFrame


def _upsert(standing: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """Pure upsert by key: delta rows replace standing rows with the same
    key, unmatched keys insert (the in-memory analog of Warehouse.merge)."""
    return standing.join(delta, [key], "left_anti").unionByName(delta)


def init_join_view(
    fact: DataFrame, dim: DataFrame, fact_on: str, dim_on: str
) -> JoinViewState:
    """First load: split the initial fact image into matched view rows and
    orphans. One join on the dim key — at scale the dim side broadcasts."""
    matched = fact.join(dim, fact[fact_on] == dim[dim_on], "inner").drop(dim_on)
    orphans = fact.join(dim, fact[fact_on] == dim[dim_on], "left_anti")
    return JoinViewState(view=matched, orphans=orphans)


def apply_fact_batch(
    state: JoinViewState,
    batch: DataFrame,
    dim: DataFrame,
    fact_on: str,
    dim_on: str,
    fact_key: str,
) -> JoinViewState:
    """Fold one batch of fact rows into the state against the CURRENT dim
    image. O(batch): the standing view is touched only by the fact-key
    upsert (an anti-join probe — partition-prunable on the fact key)."""
    matched = batch.join(dim, batch[fact_on] == dim[dim_on], "inner").drop(dim_on)
    unmatched = batch.join(dim, batch[fact_on] == dim[dim_on], "left_anti")
    return JoinViewState(
        view=_upsert(state.view, matched, fact_key),
        # a replayed/updated fact key must not linger in BOTH ledgers:
        # matched batch rows evict their key from orphans, unmatched ones
        # from the view (cross-ledger moves on fact re-delivery)
        orphans=_upsert(
            state.orphans.join(matched.select(fact_key), [fact_key], "left_anti"),
            unmatched,
            fact_key,
        ),
    )


def apply_dim_upsert(
    state: JoinViewState,
    dim_upserts: DataFrame,
    fact_on: str,
    dim_on: str,
    fact_key: str,
    dim_payload: list[str],
) -> JoinViewState:
    """Fold a batch of dimension inserts/updates into the state.

    ``dim_upserts`` carries the FULL new image of each changed dim row
    (key + payload). ``dim_payload`` names the dim's non-key columns as
    they appear in the view — they are stripped from touched view rows
    before the re-join so the refreshed rows carry exactly the new image.

    Touches only rows referencing a changed key: two semi-join probes
    (view, orphans) + one join of the touched fact rows against the
    (dimension-sized, broadcastable) upsert batch.
    """
    changed = dim_upserts.select(dim_on).distinct()

    touched_view_facts = state.view.join(
        changed, state.view[fact_on] == changed[dim_on], "left_semi"
    ).drop(*dim_payload)
    touched_orphans = state.orphans.join(
        changed, state.orphans[fact_on] == changed[dim_on], "left_semi"
    )
    to_rejoin = touched_view_facts.unionByName(touched_orphans)
    refreshed = to_rejoin.join(
        dim_upserts, to_rejoin[fact_on] == dim_upserts[dim_on], "inner"
    ).drop(dim_on)

    return JoinViewState(
        view=_upsert(state.view, refreshed, fact_key),
        # promoted orphans leave the ledger; an UPDATE never creates one
        orphans=state.orphans.join(
            changed, state.orphans[fact_on] == changed[dim_on], "left_anti"
        ),
    )
