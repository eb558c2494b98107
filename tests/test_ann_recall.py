"""ANN recall gates on a planted-cluster fixture (VERDICT r4 task #6).

The driver's embeddings table is isotropic random — recall there proves
machinery, not usefulness (recall@10 = 0.4 is the honest ceiling for any
sublinear method on structureless data). These tests plant Gaussian
clusters on the unit sphere and gate each ANN strategy at its REALISTIC
operating point:

- IVF (nprobe=2 of 8 cells): topical clusters, sigma = 0.10 — the
  labeled-centroid index recovers the query's cell essentially always.
- Multi-probe SRP (4 planes, probe 4 of 16 buckets): near-duplicate
  tightness, sigma = 0.02 — the regime the engine's dedup stack uses
  SRP for. On looser topical clusters a SINGLE hash table structurally
  loses neighbors flipped on a plane outside the query's two lowest
  margins (measured 0.4-0.5 at sigma 0.05-0.10; PLANS.md round-5 table)
  — the scale fix is OR-construction over several tables, as in the
  MinHash band stack, not more probes in one table.

The exact baseline is ``cosine_topk`` on the same fixture (same 4-dp
rounding + vec_id tie-break as the ANN rerank), so the comparison is
deterministic under ties.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_platform_spark.functions.similarity import (
    cosine_topk,
    ivf_topk,
    srp_multiprobe_topk,
)

DIM = 64
N_CLUSTERS = 8
PER_CLUSTER = 40
K = 10


def _planted(spark, sigma: float, seed: int = 5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + sigma * rng.normal(size=DIM)
            v /= np.linalg.norm(v)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id: long, label: long, embedding: array<double>"
    )


def _recall(spark, df, ann_ids: set[int]) -> float:
    qv = df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    truth = {
        r.vec_id for r in cosine_topk(df, qv, k=K, exclude_ids=[0]).collect()
    }
    return len(ann_ids & truth) / K


def test_ivf_recall_topical_clusters(spark):
    df = _planted(spark, sigma=0.10).persist()
    try:
        df.count()
        got = {r.vec_id for r in ivf_topk(df, 0, nprobe=2, k=K).collect()}
        assert _recall(spark, df, got) >= 0.8
    finally:
        df.unpersist()


def test_srp_multiprobe_recall_neardup_clusters(spark):
    df = _planted(spark, sigma=0.02).persist()
    try:
        df.count()
        got = {
            r.vec_id
            for r in srp_multiprobe_topk(
                df, 0, n_planes=4, dim=DIM, n_flip=2, k=K
            ).collect()
        }
        assert _recall(spark, df, got) >= 0.8
    finally:
        df.unpersist()


@pytest.mark.parametrize("nprobe,floor", [(1, 0.8), (2, 0.8)])
def test_ivf_recall_neardup_clusters(spark, nprobe, floor):
    df = _planted(spark, sigma=0.02).persist()
    try:
        df.count()
        got = {r.vec_id for r in ivf_topk(df, 0, nprobe=nprobe, k=K).collect()}
        assert _recall(spark, df, got) >= floor
    finally:
        df.unpersist()


def test_srp_banded_recall_mid_tightness(spark):
    """OR-construction over 4 independent plane tables moves the SRP
    recall >= 0.8 frontier from sigma 0.02 (single table) to sigma 0.05
    (measured 0.4 single-table vs 0.8 banded-4; PLANS.md round-5)."""
    from data_platform_spark.functions.similarity import srp_banded_topk

    df = _planted(spark, sigma=0.05).persist()
    try:
        df.count()
        got = {
            r.vec_id
            for r in srp_banded_topk(
                df, 0, n_tables=4, n_planes=4, dim=DIM, k=K
            ).collect()
        }
        assert _recall(spark, df, got) >= 0.8
    finally:
        df.unpersist()


@pytest.mark.parametrize("sigma", [0.02, 0.10])
def test_pq_rerank_recall(spark, sigma):
    """Two-stage PQ search (trained per-subspace codebooks, ADC
    shortlist-50, exact rerank) at both the near-dup and topical
    operating points. Training is load-bearing: with raw seed codebooks
    a far vector that quantizes onto the query's own codeword reads as
    ADC distance 0 — measured recall 0.0 on this same fixture; two
    Lloyd rounds restore it to 1.0 (gated at 0.8)."""
    from data_platform_spark.functions.similarity import pq_rerank_topk

    df = _planted(spark, sigma=sigma).persist()
    try:
        df.count()
        got = {
            r.vec_id
            for r in pq_rerank_topk(df, 0, k=K, shortlist=50, dim=DIM).collect()
        }
        assert _recall(spark, df, got) >= 0.8
    finally:
        df.unpersist()


@pytest.mark.parametrize("sigma", [0.02, 0.10])
def test_pq_rerank_recall_sampled_training(spark, sigma):
    """100 TB training posture: codebooks trained on a deterministic
    hash sample (~half the corpus) from hash-ordered seeds must hold the
    same recall gate — and the training stage must actually be bounded
    by the sample (asserted on the sampled-training codebook's input)."""
    from data_platform_spark.functions.similarity import (
        pq_rerank_topk,
        training_sample,
    )

    df = _planted(spark, sigma=sigma).persist()
    try:
        n_all = df.count()
        n_train = training_sample(df, 2, "vec_id").count()
        # the hash sample is a real subset, roughly half the corpus
        assert 0.3 * n_all < n_train < 0.7 * n_all
        got = {
            r.vec_id
            for r in pq_rerank_topk(
                df, 0, k=K, shortlist=50, dim=DIM,
                sample_mod=2, seed_by_hash=True,
            ).collect()
        }
        assert _recall(spark, df, got) >= 0.8
    finally:
        df.unpersist()


def test_kmeans_sampled_training_recall_and_full_assignment(spark):
    """kmeans_fit with hash-sampled training + hash-ordered seeds: the
    final assignment must still cover EVERY vector, and IVF search over
    the sampled-training index must hold the recall gate on topical
    clusters."""
    from data_platform_spark.functions.similarity import (
        ivf_topk_with_index,
        kmeans_fit,
    )

    df = _planted(spark, sigma=0.10).persist()
    try:
        n_all = df.count()
        cents, assign = kmeans_fit(
            df, k=8, sample_mod=2, seed_by_hash=True
        )
        assert assign.count() == n_all  # sampled TRAINING, full assignment
        got = {
            r.vec_id
            for r in ivf_topk_with_index(
                df, cents, assign, 0, nprobe=2, k=K
            ).collect()
        }
        assert _recall(spark, df, got) >= 0.8
    finally:
        df.unpersist()


def test_gram_pair_partials_partition_invariant_and_exact(spark):
    """gram_pair_partials must (a) agree exactly with a single-machine
    numpy Gram on the same quantized ints, and (b) be bit-identical
    across partitionings — the fold is exact-integer, so repartitioning
    can't change any statistic."""
    from data_platform_spark.functions.similarity import gram_pair_partials

    rng = np.random.default_rng(7)
    dim = 8
    X = rng.normal(size=(300, dim))
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")

    def collect_gram(d):
        out = gram_pair_partials(d, dim=dim).collect()
        return {
            (r.d1, r.d2): (r.n, r.s1, r.s2, r.s11, r.s22, r.s12)
            for r in out
        }

    one = collect_gram(df.coalesce(1))
    many = collect_gram(df.repartition(7))
    assert one == many
    assert len(one) == dim * (dim - 1) // 2

    Xi = np.floor(X * 10_000 + 0.5).astype(np.int64)
    G = Xi.T @ Xi
    s = Xi.sum(axis=0)
    for (d1, d2), (n, s1, s2, s11, s22, s12) in one.items():
        assert n == len(X)
        assert (s1, s2) == (s[d1], s[d2])
        assert (s11, s22, s12) == (G[d1, d1], G[d2, d2], G[d1, d2])


def test_two_level_assign_full_probe_bit_identical_to_flat(spark):
    """ivf_assign_two_level at FULL coarse probe must be bit-identical
    to flat ivf_assign on the real gate corpus — the same full-probe
    equality pin the hybrid IVF-PQ dense leg carries: with the complete
    candidate set the only thing left to trust is the decomposed join
    algebra (coarse build, live-cell routing, within-cell argmin,
    quantization, tie-break), and it must reproduce the flat argmin
    exactly. (At nprobe=1 the routing itself is the approximation — that
    case is pinned on planted clusters below, and its disagreement on
    isotropic data is REPORTED by the gated
    kmeans_two_level_assign_profile query.)"""
    from data_platform_spark.functions.similarity import (
        ivf_assign,
        ivf_assign_two_level,
        kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, _ = kmeans_fit(emb, k=8, n_iter=2)
    cents = cents.localCheckpoint()
    flat = sorted(ivf_assign(emb, cents).collect())
    full = sorted(
        ivf_assign_two_level(
            emb, cents, coarse_k=3, n_iter=2, coarse_nprobe=3
        ).collect()
    )
    assert full == flat
    assert len(full) == emb.count()  # every vector assigned


def test_two_level_assign_default_probe_matches_flat_on_clusters(spark):
    """On corpora with real cluster structure the default nprobe=1
    routing agrees with flat assignment exactly: each trained centroid
    sits near one planted cluster, the coarse quantizer groups whole
    clusters, and a vector's nearest coarse cell is the one owning its
    nearest centroid (the margin dwarfs sigma). This is the operating
    regime of the n_cells ∝ corpus posture — cells exist BECAUSE the
    data clusters."""
    from data_platform_spark.functions.similarity import (
        ivf_assign_two_level,
        kmeans_fit,
    )

    df = _planted(spark, sigma=0.10).persist()
    try:
        df.count()
        cents, flat = kmeans_fit(df, k=8, n_iter=2)
        cents = cents.localCheckpoint()
        flat_rows = sorted(flat.collect())
        two = sorted(
            ivf_assign_two_level(df, cents, coarse_k=3, n_iter=2).collect()
        )
        assert two == flat_rows
    finally:
        df.unpersist()


def test_kmeans_fit_forced_two_level_covers_all_and_deterministic(spark):
    """kmeans_fit with two_level_assign forced on (the k >
    IVF_ASSIGN_FLAT_MAX posture, exercised at small k): the final
    assignment must still cover EVERY vector exactly once, and the whole
    build must be run-to-run deterministic — centroids_wide's
    array_sort(collect_list) pivot and the routed argmin leave no
    ordering to chance. (Trained centroids may differ from the flat
    build when the round-1 seed centroids are degenerate — smallest-id
    seeds all land in one planted cluster — so end-to-end equality to
    the flat build is NOT asserted; the assignment algebra's equality
    pins live in the two tests above.)"""
    from data_platform_spark.functions.similarity import kmeans_fit

    df = _planted(spark, sigma=0.10).persist()
    try:
        n = df.count()
        _, a1 = kmeans_fit(df, k=8, n_iter=2, two_level_assign=True)
        r1 = sorted(a1.collect())
        assert len(r1) == n
        assert len({r.vec_id for r in r1}) == n
        _, a2 = kmeans_fit(df, k=8, n_iter=2, two_level_assign=True)
        assert sorted(a2.collect()) == r1
    finally:
        df.unpersist()


def test_kmeans_fit_forced_two_level_preserves_recall(spark):
    """The whole point of the two-level posture is an index that still
    SEARCHES well: kmeans_fit with two_level_assign forced on (Lloyd
    rounds AND final assignment routed coarse-first) must produce an
    IVF index that holds the same 0.8 recall gate as the flat and
    sampled-training builds on topical clusters — approximate
    assignment during training must not degrade the thing the index is
    for."""
    from data_platform_spark.functions.similarity import (
        ivf_topk_with_index,
        kmeans_fit,
    )

    df = _planted(spark, sigma=0.10).persist()
    try:
        df.count()
        cents, assign = kmeans_fit(
            df, k=8, n_iter=2, two_level_assign=True
        )
        got = {
            r.vec_id
            for r in ivf_topk_with_index(
                df, cents, assign, 0, nprobe=2, k=K
            ).collect()
        }
        assert _recall(spark, df, got) >= 0.8
    finally:
        df.unpersist()


def test_two_level_multiprobe_operating_point(spark):
    """The r13 coarse_nprobe operating point (VERDICT r12 item 7),
    gated on the deterministic gate corpus at the SemDeDup posture
    (k = n/64, hash-sampled centroids — the PLANS.md sweep harness):
    the default coarse_nprobe=2 must keep assigned-distance inflation
    vs flat exact assignment under 0.5% here (measured 0.18%; 2.11% at
    nprobe=1) and strictly dominate nprobe=1 on both disagreement and
    inflation. Candidate sets grow monotonically with nprobe, so this
    gate can only break if the routing itself regresses."""
    from pyspark.sql import functions as F

    from data_platform_spark.functions.similarity import (
        as_double,
        ivf_assign,
        ivf_assign_two_level,
    )
    from data_platform_spark.ops.global_order import global_row_number
    from data_platform_spark.sources.tables import load_table

    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .select("vec_id", "embedding")
        .localCheckpoint()
    )
    n = emb.count()
    k = max(1, n // 64)
    ck = max(1, int(-(-(k**0.5) // 1)))
    seeds = (
        global_row_number(
            emb, [F.asc(F.xxhash64(F.col("vec_id"))), F.asc("vec_id")], "__rn"
        )
        .filter(F.col("__rn") <= k)
        .select((F.col("__rn") - 1).cast("int").alias("label"), "embedding")
    )
    cents = (
        seeds.select(
            "label",
            F.posexplode(as_double(F.col("embedding"))).alias("pos", "x"),
        )
        .select(
            "label",
            "pos",
            (F.floor(F.col("x") * 10_000 + F.lit(0.5)) / 10_000).alias(
                "centroid_val"
            ),
        )
        .localCheckpoint()
    )
    flat = ivf_assign(emb, cents).localCheckpoint()
    flat_sum = flat.agg(F.sum("dist2").alias("s")).collect()[0]["s"]

    def probe_stats(nprobe):
        two = ivf_assign_two_level(
            emb, cents, coarse_k=ck, coarse_nprobe=nprobe
        )
        r = (
            two.alias("t")
            .join(flat.alias("f"), F.col("t.vec_id") == F.col("f.vec_id"))
            .agg(
                F.sum(
                    F.when(
                        F.col("t.assigned_label")
                        != F.col("f.assigned_label"),
                        1,
                    ).otherwise(0)
                ).alias("nd"),
                F.sum("t.dist2").alias("sd"),
            )
            .collect()[0]
        )
        return int(r["nd"]), r["sd"] / flat_sum

    nd1, infl1 = probe_stats(1)
    nd2, infl2 = probe_stats(2)
    assert nd2 < nd1 and infl2 <= infl1
    assert infl2 <= 1.005  # measured 1.0018 at the default operating point
    # the function's DEFAULT is the chosen operating point
    import inspect

    sig = inspect.signature(ivf_assign_two_level)
    assert sig.parameters["coarse_nprobe"].default == 2


def test_pq_train_flat_matches_join_path(spark):
    """The r17 flat PQ training path (in-row per-subspace argmin against
    a one-row broadcast codebook + same-pass re-centroid) must reproduce
    the join path's codebook BIT-FOR-BIT: the in-row fold sums squared
    diffs sequentially in pos order — exactly the order the posexploded
    (id, m, code) hash-agg partial accumulated — with the same
    pow(x-cb, 2) expression, the same floor(sum*1e6 + 0.5) LONG
    quantization, and array_min's field-lexicographic (dist asc, code
    asc) tie-break equal to the former struct-min. Both seed flavors
    and a sampled training run are pinned."""
    from data_platform_spark.functions.similarity import pq_train_codebook

    df = _planted(spark, sigma=0.10).persist()
    try:
        df.count()
        for kw in (
            {},
            {"seed_by_hash": True},
            {"sample_mod": 2, "seed_by_hash": True},
            {"n_sub": 8, "n_codes": 16},
        ):
            flat = sorted(
                pq_train_codebook(df, flat=True, **kw).collect()
            )
            joined = sorted(
                pq_train_codebook(df, flat=False, **kw).collect()
            )
            assert flat == joined, f"codebooks diverge for {kw}"
            assert len(flat) > 0
    finally:
        df.unpersist()
