"""Thread-scoped cache registry — the explicit unpersist-on-materialize
convention for in-query ``persist()`` calls (VERDICT r7 "What's wrong" #3;
scoping per ADVICE r8).

Registered queries persist heavy shared relations (shingle arrays,
MinHash signatures, the two-phase rank's local-sum relation) so a
diamond-shaped plan materializes them once. Those caches are correct but
were never RELEASED: a long-lived driver composing many queries (the
bench loop, a notebook session) leaked one block per call, and
re-persisting an identical plan produced Spark's "Asked to cache already
cached data" warning — which also meant later timing runs were silently
served from the earlier run's cache.

Convention:

- query code calls :func:`scoped_persist` instead of ``DataFrame.persist``
  — same behavior, plus the handle lands in the CALLING THREAD's
  registry;
- whoever MATERIALIZES the query result (bench.py after each timed run,
  every foreachBatch sink at the end of each micro-batch) calls
  :func:`release_caches` — every block registered BY THAT THREAD is
  unpersisted and its registry empties, so the next identical plan
  persists fresh instead of warning/reusing.

Why per-thread and not a process-global list: two concurrent consumers
in one driver (e.g. two foreachBatch sinks, which Structured Streaming
runs on separate threads) would otherwise drain EACH OTHER — one sink's
end-of-batch release would unpersist the other sink's in-flight
``grouped_running_sum`` cache, and that persist is load-bearing for
CORRECTNESS, not just cost: ops/global_order.py pins
``spark_partition_id()`` via the persist so the two diamond branches see
the same partition ids. foreachBatch composes and materializes entirely
inside its own ``_apply`` thread, and the bench loop is single-threaded,
so thread identity is exactly the consumer boundary. A handle registered
on one thread and released on another is NOT drained — by design; don't
split compose/materialize across threads.

The pytest suite deliberately does NOT release between tests: its inputs
are immutable parquet fixtures, so cross-test plan-equal reuse is
semantically safe and faster — the trap this registry exists for is
reuse across MUTATED state (a grown table path between micro-batches)
or across timed runs. Short-lived sessions that never call
:func:`release_caches` behave exactly as before (LRU eviction) — the
registry holds plain references and adds no behavior until drained.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_SCOPES = threading.local()


def _registry() -> list[DataFrame]:
    reg = getattr(_SCOPES, "live", None)
    if reg is None:
        reg = []
        _SCOPES.live = reg
    return reg


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register the handle in the calling thread's
    scope for a later same-thread :func:`release_caches` sweep. Returns
    the persisted DataFrame."""
    out = df.persist()
    _registry().append(out)
    return out


def release_caches() -> int:
    """Unpersist every cache registered by the CALLING thread
    (non-blocking) and empty its registry. Returns how many blocks were
    released. Releasing after materialization never changes results —
    within a thread's compose→materialize→release cycle the persisted
    partition ids are already fixed; only a FOREIGN thread's mid-flight
    release could perturb them, which the per-thread scoping forbids."""
    reg = _registry()
    n = len(reg)
    while reg:
        try:
            reg.pop().unpersist()
        except Exception:
            # a stopped SparkContext can't unpersist; dropping the
            # reference is all that's left to do
            pass
    return n
