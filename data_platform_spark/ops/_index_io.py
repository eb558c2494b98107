"""Shared filesystem discipline for persisted index maintenance.

Two primitives both index families (MinHash bands, PQ, IVF) rely on:

- :func:`move_staged_files` — the crash-safe idempotent append: a batch
  is fully staged first, then every staged parquet file moves into the
  live index under a DETERMINISTIC ``<batch_id>-N`` name (preserving
  partition subdirectories); a move is skipped when its target exists,
  so a retried append completes exactly the missing files and can never
  duplicate rows — provided each destination's staged content is a pure
  function of the batch (single file per destination, enforced by the
  callers' ``coalesce(1)``).
- :func:`swap_in_stage` / :func:`recover_index_dir` — the atomic
  rebuild swap: a fully-built stage (carrying a ``_COMPLETE`` marker)
  replaces the live dir via rename-old-aside → rename-stage-in;
  recovery promotes a COMPLETE stage or restores the old dir, healing
  the one crash window between the renames.
- :func:`begin_batch` / :func:`finish_batch` /
  :func:`assert_no_inflight_appends` — the two-phase append-marker
  protocol (ADVICE r8). The done marker ``batches/<batch_id>`` makes a
  replayed batch a no-op even after a rebuild/compaction renamed the
  batch's files (the rebuilt index contains its rows by construction).
  The INTENT marker (written before any file moves) closes the
  remaining hole: a rebuild interleaving between a crashed partial
  append and its retry would bake the partial rows into fresh-named
  files, and the retry — finding neither marker nor targets — would
  re-move the whole batch, duplicating the partially-appended rows.
  Maintenance ops therefore REFUSE to run while an intent without a
  done marker is outstanding: the append's idempotent retry must
  complete first (it always can — pre-rebuild, the deterministic-name
  skip makes the retry exact).
"""

from __future__ import annotations

import os
import shutil

STAGE_SUFFIX = ".rebuild-stage"
OLD_SUFFIX = ".old-rebuild"
COMPLETE_MARKER = "_COMPLETE"
BATCHES_DIR = "batches"
INTENT_SUFFIX = ".intent"
REBUILDS_DIR = "rebuilds"


def stage_rebuild_marker(path: str, marker: str) -> None:
    """Stamp ``rebuilds/<marker>`` INTO the rebuild stage dir, so the
    marker becomes live atomically WITH the swap (ADVICE r10: a crash
    between the swap and the maintenance-ledger upsert made the
    replayed batch re-evaluate drift against the freshly-rebuilt
    baseline and record rebuilt=False for a batch that actually
    rebuilt — the ledger's rebuilt flag must derive from state the
    swap itself publishes, not from a post-swap recomputation)."""
    d = os.path.join(path + STAGE_SUFFIX, REBUILDS_DIR)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, marker), "w") as f:
        f.write("ok")


def rebuild_done(path: str, marker: str) -> bool:
    """True iff a swap published ``rebuilds/<marker>`` — the
    crash-replay-safe 'did this batch trigger a rebuild' check."""
    return os.path.exists(os.path.join(path, REBUILDS_DIR, marker))


def prune_rebuild_markers(
    path: str, before_batch: int, prefix: str = "stream-"
) -> int:
    """Drop ``rebuilds/<prefix><n>`` markers with n < ``before_batch``;
    returns the number pruned (non-conforming names are kept —
    conservative). Markers accumulate unboundedly otherwise: every
    drift rebuild copies the full ``rebuilds/`` dir forward and nothing
    else ever removes them (ADVICE r11).

    Why strictly-older-than-current is the safe bound: a marker is only
    read by ``rebuild_done`` while the marker's OWN batch evaluates its
    ledger row. With an intact checkpoint only the current batch can
    replay (older ones are commit-logged). In a fresh-checkpoint FULL
    replay, foreachBatch re-runs batches strictly in order, so when
    batch n prunes markers < n, every older batch has already
    re-upserted its ledger row this replay — and markers ≥ n (the
    batches still to replay) are untouched, preserving the
    marker-derived rebuilt flag the r10 fix introduced.

    Residual (ADVICE r12): that argument covers pruning DURING the
    fresh-checkpoint replay itself. A marker pruned in the ORIGINAL run
    (batch 7 pruning batch 5's marker) is already gone when a LATER
    fresh-checkpoint full replay re-runs batch 5, so batch 5's replayed
    ledger row derives its rebuilt flag from a fresh drift evaluation
    alone and can flip True→False. Accepted: the ledger is
    observability (search correctness never reads it), fresh-replay
    batch numbering is not guaranteed to match the original run's
    anyway, and the alternative — keeping every marker forever — is the
    unbounded growth this function exists to stop."""
    d = os.path.join(path, REBUILDS_DIR)
    if not os.path.isdir(d):
        return 0
    pruned = 0
    for f in os.listdir(d):
        if f.startswith(prefix):
            suffix = f[len(prefix):]
            if suffix.isdigit() and int(suffix) < before_batch:
                os.remove(os.path.join(d, f))
                pruned += 1
    return pruned


def batch_done(path: str, batch_id: str) -> bool:
    """True iff the batch's DONE marker exists — the replay check."""
    return os.path.exists(os.path.join(path, BATCHES_DIR, batch_id))


def begin_batch(path: str, batch_id: str) -> None:
    """Record append intent BEFORE any file move (phase one)."""
    d = os.path.join(path, BATCHES_DIR)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, batch_id + INTENT_SUFFIX), "w") as f:
        f.write("ok")


def finish_batch(path: str, batch_id: str) -> None:
    """Promote intent → done after every file landed (phase two)."""
    d = os.path.join(path, BATCHES_DIR)
    with open(os.path.join(d, batch_id), "w") as f:
        f.write("ok")
    try:
        os.remove(os.path.join(d, batch_id + INTENT_SUFFIX))
    except FileNotFoundError:
        pass  # an earlier retry already promoted it


def assert_no_inflight_appends(path: str) -> None:
    """Raise if any append intent lacks its done marker — rebuilds and
    compactions must not run over a crashed-mid-append index (see module
    docstring for the duplication scenario)."""
    d = os.path.join(path, BATCHES_DIR)
    if not os.path.isdir(d):
        return
    inflight = sorted(
        f[: -len(INTENT_SUFFIX)]
        for f in os.listdir(d)
        if f.endswith(INTENT_SUFFIX)
        and not os.path.exists(os.path.join(d, f[: -len(INTENT_SUFFIX)]))
    )
    if inflight:
        raise RuntimeError(
            f"index at {path} has in-flight append batches {inflight}; "
            "retry those appends to completion before rebuilding or "
            "compacting (a maintenance pass over a partial append would "
            "let its retry double the batch's rows)"
        )


def move_staged_files(stage_half: str, live_half: str, batch_id: str) -> None:
    """Move every ``*.parquet`` under ``stage_half`` (recursing into
    partition subdirs) to ``live_half`` under ``<batch_id>-N`` names,
    skipping targets that already exist (retry idempotence)."""
    for root, _dirs, files in os.walk(stage_half):
        rel = os.path.relpath(root, stage_half)
        parquets = sorted(f for f in files if f.endswith(".parquet"))
        for i, f in enumerate(parquets):
            dst_dir = live_half if rel == "." else os.path.join(live_half, rel)
            os.makedirs(dst_dir, exist_ok=True)
            dst = os.path.join(dst_dir, f"{batch_id}-{i}.parquet")
            if not os.path.exists(dst):
                os.rename(os.path.join(root, f), dst)


def swap_in_stage(path: str) -> None:
    """Atomically replace the live index at ``path`` with its COMPLETE
    stage sibling. The stage must already carry the marker."""
    stage = path + STAGE_SUFFIX
    old = path + OLD_SUFFIX
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(stage, path)  # crash between renames -> recover_index_dir
    shutil.rmtree(old, ignore_errors=True)
    os.remove(os.path.join(path, COMPLETE_MARKER))


def mark_stage_complete(path: str) -> None:
    with open(os.path.join(path + STAGE_SUFFIX, COMPLETE_MARKER), "w") as f:
        f.write("ok")


def recover_index_dir(path: str) -> str:
    """Heal an interrupted rebuild swap of any index dir. Cases:

    - live index present → drop any leftover stage/old droppings;
    - live missing, COMPLETE stage present → promote the stage;
    - live missing, old present → restore the old index.

    Returns a one-line description of the action taken."""
    stage = path + STAGE_SUFFIX
    old = path + OLD_SUFFIX
    if os.path.isdir(path):
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        return "live index intact; removed droppings"
    if os.path.isdir(stage) and os.path.exists(
        os.path.join(stage, COMPLETE_MARKER)
    ):
        os.rename(stage, path)
        os.remove(os.path.join(path, COMPLETE_MARKER))
        shutil.rmtree(old, ignore_errors=True)
        return "promoted completed rebuild stage"
    if os.path.isdir(old):
        shutil.rmtree(stage, ignore_errors=True)
        os.rename(old, path)
        return "restored pre-rebuild index"
    raise FileNotFoundError(
        f"no index, stage, or old dir at {path} — nothing to recover"
    )
