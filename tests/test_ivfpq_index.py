"""Persisted IVF-PQ index family (ops/ivfpq_index.py): the composed
production ANN layout — cell-partitioned PQ codes, nprobe partition
pruning, ADC search, two-phase appends, drift rebuild, compaction.

Consistency contract under test: with nprobe = n_cells a search is
bit-identical to the flat PQ family (the ADC lookup table is the shared
ann_index._pq_query_dist_table and both quantizers train
deterministically), so everything the oracle gate proves about the PQ
math transfers to the composed layout.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from data_platform_spark.ops import _index_io as IO
from data_platform_spark.ops.ivfpq_index import (
    append_to_ivfpq_index,
    build_ivfpq_index,
    ivfpq_search_index,
    read_ivfpq_params,
    rebuild_ivfpq_if_drifted,
    recover_ivfpq_index,
)
from tests.test_ops import _pq_drift_fixture


def _adc_rows(df):
    return [(r[0], r[1]) for r in df.collect()]


def test_ivfpq_full_probe_matches_flat_pq(spark, tmp_path):
    """nprobe = n_cells ⇒ the composed index's ADC top-k — ids AND
    micro-unit distances — equals the flat PQ index built over the same
    corpus with the same geometry (both trainings are deterministic,
    the lookup table is shared code); the params sidecar records the
    full geometry; a wrong-dimension query raises."""
    from data_platform_spark.ops.ann_index import (
        build_pq_index,
        pq_search_index,
    )

    df_a, _, _, vecs = _pq_drift_fixture(spark)
    path = str(tmp_path / "ivfpq")
    flat = str(tmp_path / "pq")
    build_ivfpq_index(df_a, path, n_cells=8)
    build_pq_index(df_a, flat)

    p = read_ivfpq_params(spark, path)
    assert (
        p["n_cells"] == 8
        and p["n_sub"] == 4
        and p["n_codes"] == 8
        and p["dim"] == 64
        and p["base_distortion_micro"] > 0
    )

    got = _adc_rows(
        ivfpq_search_index(spark, path, vecs[5], nprobe=8, k=10, exclude_ids=[5])
    )
    want = _adc_rows(pq_search_index(spark, flat, vecs[5], k=10, exclude_ids=[5]))
    assert got == want and len(got) == 10

    with pytest.raises(ValueError, match="query vector has 16"):
        ivfpq_search_index(spark, path, [0.0] * 16)


def test_ivfpq_search_prunes_cells_and_reranks(spark, tmp_path):
    """nprobe < n_cells pushes the probed cell labels into the codes
    scan as a partition filter (IO bounded by the probed cells), still
    finds a planted twin, and the rerank leg fetches full vectors for
    only the shortlist and returns the exact-L2 winner."""
    df_a, _, _, vecs = _pq_drift_fixture(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(df_a, path, n_cells=8)

    res = ivfpq_search_index(spark, path, vecs[7], nprobe=2, k=10, exclude_ids=[7])
    plan = res._jdf.queryExecution().executedPlan().toString()
    cell_filters = [
        f
        for f in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "cell" in f
    ]
    assert cell_filters and "IN (" in cell_filters[0]
    got = {r.vec_id for r in res.collect()}
    # vector 7's cluster-mates (ids with the same planted label) dominate
    assert got and len(got) == 10

    rer = ivfpq_search_index(
        spark,
        path,
        vecs[7],
        nprobe=2,
        k=3,
        exclude_ids=[7],
        rerank_emb=df_a,
        shortlist=40,  # covers the query's whole planted cluster, so the
        # exact refine sees the true neighborhood (a 12-candidate ADC
        # shortlist can rank the true NN below the cutoff — that recall
        # tradeoff is the shortlist knob's job, not a defect)
    )
    rows = rer.collect()
    assert len(rows) == 3
    # the rerank distances must be the EXACT micro-unit squared L2 the
    # in-memory refine stage computes (same zip_with/floor expression)
    import numpy as np

    q = np.array(vecs[7])
    for r in rows:
        exact = float(((np.array(vecs[r.vec_id]) - q) ** 2).sum())
        assert r.d2_micro == int(np.floor(exact * 1_000_000 + 0.5))
    # nprobe=2 covers the query's own planted cluster, so the reranked
    # top-1 is the GLOBAL exact nearest neighbor
    true_nn = min(
        (((np.array(v) - q) ** 2).sum(), vid)
        for vid, v in vecs.items()
        if vid != 7 and vid < 1000
    )[1]
    assert rows[0].vec_id == true_nn


def test_ivfpq_append_uses_existing_quantizers_and_is_idempotent(
    spark, tmp_path
):
    """An appended batch assigns against the persisted centroids and
    encodes against the persisted codebook — the resulting codes/
    relation equals the batch encoded by hand against those sidecars;
    a same-batch_id replay adds zero rows; a wrong-dimension batch
    raises before any write."""
    from data_platform_spark.functions.similarity import (
        ivf_assign,
        pq_dist_table,
        pq_encode,
    )

    df_a, df_b, _, _ = _pq_drift_fixture(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(df_a, path, n_cells=8)

    append_to_ivfpq_index(df_b, path, batch_id="day1")
    codes = spark.read.parquet(f"{path}/codes")
    n1 = codes.count()
    append_to_ivfpq_index(df_b, path, batch_id="day1")  # replay
    assert spark.read.parquet(f"{path}/codes").count() == n1

    p = read_ivfpq_params(spark, path)
    codebook = spark.read.parquet(f"{path}/codebook")
    centroids = spark.read.parquet(f"{path}/centroids")
    want_codes = pq_encode(
        pq_dist_table(
            df_b,
            p["n_sub"],
            p["n_codes"],
            p["dim"],
            p["n_iter"],
            cents=codebook,
        )
    ).join(
        ivf_assign(df_b, centroids).select(
            "vec_id", F.col("assigned_label").alias("cell")
        ),
        "vec_id",
    )
    got = sorted(
        (r.vec_id, r.m, r.code, r.cell)
        for r in codes.filter(F.col("vec_id") >= 1000).collect()
    )
    want = sorted(
        (r.vec_id, r.m, r.code, r.cell) for r in want_codes.collect()
    )
    assert got == want and len(got) > 0

    bad = spark.createDataFrame(
        [(9000, 0, [0.0] * 16)],
        "vec_id: long, label: long, embedding: array<double>",
    )
    with pytest.raises(ValueError, match="expects 64-dim"):
        append_to_ivfpq_index(bad, path)


def test_rebuild_ivfpq_if_drifted_skips_then_restores(
    spark, tmp_path, monkeypatch
):
    """Maintenance loop: a no-drift check trains NOTHING (both trainers
    monkeypatch-counted); drifted appends cross the distortion
    threshold, the rebuild retrains both quantizers and swaps
    atomically, a planted drifted twin becomes findable, and a
    post-rebuild replay of the appended batch is a no-op."""
    import data_platform_spark.ops.ivfpq_index as IP

    df_a, df_b, _, vecs = _pq_drift_fixture(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(df_a, path, n_cells=8)

    calls = {"kmeans": 0, "pq": 0}
    real_kmeans, real_pq = IP.kmeans_fit, IP.pq_train_codebook
    monkeypatch.setattr(
        IP,
        "kmeans_fit",
        lambda *a, **k: (calls.__setitem__("kmeans", calls["kmeans"] + 1))
        or real_kmeans(*a, **k),
    )
    monkeypatch.setattr(
        IP,
        "pq_train_codebook",
        lambda *a, **k: (calls.__setitem__("pq", calls["pq"] + 1))
        or real_pq(*a, **k),
    )

    out = rebuild_ivfpq_if_drifted(df_a, path)
    assert out["rebuilt"] is False and calls == {"kmeans": 0, "pq": 0}

    append_to_ivfpq_index(df_b, path, batch_id="drift-day")
    df_all = df_a.union(df_b)
    out = rebuild_ivfpq_if_drifted(df_all, path)
    assert out["rebuilt"] is True and out["ratio"] > 1.5
    assert calls == {"kmeans": 1, "pq": 1}

    # the drifted twin of vector 1007 ranks in its own neighborhood now
    got = {
        r.vec_id
        for r in ivfpq_search_index(
            spark, path, vecs[1007], nprobe=8, k=5, exclude_ids=[1007]
        ).collect()
    }
    assert got & set(range(1000, 1320))

    n = spark.read.parquet(f"{path}/codes").count()
    append_to_ivfpq_index(df_b, path, batch_id="drift-day")  # replay
    assert spark.read.parquet(f"{path}/codes").count() == n


def test_ivfpq_compaction_and_crash_recovery(spark, tmp_path):
    """Appends accumulate one file per touched cell per batch; the
    generic compact_index dispatches to the IVF-PQ form (cell
    partitioning preserved, file count reduced, search bit-identical);
    an interrupted rebuild swap heals via recover_ivfpq_index; a
    crashed append intent blocks maintenance until retried."""
    import os

    from data_platform_spark.ops.compaction import compact_index

    df_a, df_b, _, vecs = _pq_drift_fixture(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(df_a, path, n_cells=8)
    half = df_b.filter(F.col("vec_id") < 1160)
    rest = df_b.filter(F.col("vec_id") >= 1160)
    append_to_ivfpq_index(half, path, batch_id="b1")
    append_to_ivfpq_index(rest, path, batch_id="b2")

    before = _adc_rows(
        ivfpq_search_index(spark, path, vecs[5], nprobe=8, k=10, exclude_ids=[5])
    )

    def _nfiles():
        n = 0
        for root, _d, files in os.walk(f"{path}/codes"):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    nf_before = _nfiles()
    out = compact_index(spark, path)
    assert out["codes"]["files_after"] < nf_before
    after = _adc_rows(
        ivfpq_search_index(spark, path, vecs[5], nprobe=8, k=10, exclude_ids=[5])
    )
    assert after == before

    # replay safety survives compaction (markers untouched)
    n = spark.read.parquet(f"{path}/codes").count()
    append_to_ivfpq_index(half, path, batch_id="b1")
    assert spark.read.parquet(f"{path}/codes").count() == n

    # crash window: live dir renamed aside mid-swap → recover restores it
    os.rename(path, path + IO.OLD_SUFFIX)
    assert recover_ivfpq_index(path) == "restored pre-rebuild index"
    assert _adc_rows(
        ivfpq_search_index(spark, path, vecs[5], nprobe=8, k=10, exclude_ids=[5])
    ) == before

    # a crashed append intent (no done marker) blocks maintenance
    IO.begin_batch(path, "crashed")
    with pytest.raises(RuntimeError, match="in-flight append"):
        compact_index(spark, path)
    IO.finish_batch(path, "crashed")
    compact_index(spark, path)  # completes once the intent is promoted
