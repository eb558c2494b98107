"""Cache-registry scoping: release_caches() drains only the calling
thread's registrations (ADVICE r8 medium — a process-global registry let
one foreachBatch sink's end-of-batch release unpersist ANOTHER sink's
in-flight grouped_running_sum cache, which is load-bearing for
correctness, not just cost: ops/global_order.py pins
spark_partition_id() via that persist)."""

from __future__ import annotations

import threading

from data_platform_spark.cache import release_caches, scoped_persist


def test_release_caches_is_thread_scoped(spark):
    release_caches()  # start from a clean scope on this thread
    a = scoped_persist(spark.range(10).toDF("n"))
    a.count()

    b_registered = threading.Event()
    may_release_b = threading.Event()
    state: dict = {}

    def worker():
        b = scoped_persist(spark.range(20).toDF("n"))
        b.count()
        state["b"] = b
        b_registered.set()
        assert may_release_b.wait(60)
        state["b_released"] = release_caches()

    t = threading.Thread(target=worker)
    t.start()
    assert b_registered.wait(60)

    # Main thread's release drains exactly its own handle...
    assert release_caches() == 1
    assert not a.storageLevel.useMemory
    # ...and the worker thread's cache is untouched (the concurrent-sink
    # guarantee: a foreign release can't perturb in-flight partition ids).
    assert state["b"].storageLevel.useMemory

    may_release_b.set()
    t.join(60)
    assert state["b_released"] == 1
    assert not state["b"].storageLevel.useMemory


def test_release_caches_empty_scope_is_zero(spark):
    release_caches()
    assert release_caches() == 0
