"""Persisted ANN index: build-once / search-many for product
quantization.

The PQ queries in queries/similarity.py demonstrate the algorithm under
the correctness gate by (re)training per call; a production deployment
builds ONCE and serves many searches. This module materializes the two
halves of the index to parquet:

- ``codebook/``  — the trained (code, pos, cb_val) long layout
  (n_sub · n_codes · sub_dim rows — metadata scale);
- ``codes/``     — one (id, m, code) row per vector-subspace — the
  compressed corpus representation (log2(n_codes) bits of information
  per subspace; ~170× smaller than float64 vectors at the default
  4×3-bit configuration).

A search reads only these two relations: the query's distance table is
(n_sub · n_codes) rows computed from the codebook (broadcast), and the
scan side touches the codes table alone — the full-precision vectors
are never read at search time. Same integer micro-unit arithmetic as
the gated queries, so a persisted-index search returns BIT-IDENTICAL
results to the in-memory pipeline (asserted in tests/test_ops.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.functions.similarity import (
    pq_dist_table,
    pq_encode,
    pq_train_codebook,
    training_sample,
)
from data_platform_spark.ops import _index_io as IO


def _mean_distortion_micro(dist: DataFrame, id_col: str) -> int:
    """Mean per-(vector, subspace) quantization error in micro-units:
    min over codewords of the squared subspace distance, averaged over
    every (id, m) cell. THE maintenance signal for a trained quantizer —
    appended batches that drift away from the codebook's training
    distribution quantize badly, distortion rises, and ADC distances
    stop discriminating (recall decays silently). One narrow aggregate
    over the distance relation; the collect is a single scalar."""
    row = (
        dist.groupBy(id_col, "m")
        .agg(F.min("dist2_micro").alias("__d"))
        .agg(F.floor(F.avg("__d") + F.lit(0.5)).cast("long").alias("v"))
        .collect()[0]
    )
    if row["v"] is None:
        raise ValueError(
            "distortion sample is empty — corpus has no vectors (or "
            "sample_mod is too large for it); cannot evaluate drift"
        )
    return int(row["v"])


def build_pq_index(
    emb: DataFrame,
    path: str,
    n_sub: int = 4,
    n_codes: int = 8,
    dim: int = 64,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    seed_by_hash: bool = False,
) -> None:
    """Train and persist the PQ index (codebook + codes) under ``path``.
    ``sample_mod``/``seed_by_hash`` are the 100 TB training posture
    (hash-sampled Lloyd scans, hash-ordered seeds — see
    functions.similarity.training_sample); encoding always covers the
    full corpus.

    The codebook trains exactly ONCE: the trained centroids thread into
    the codes derivation (``pq_dist_table(cents=...)``), so the
    persisted halves are consistent by construction — not by hoping two
    independent training runs reproduce bit-identically — and the most
    expensive stage of the build (n_iter full Lloyd passes) isn't paid
    twice. Build parameters land in a ``params/`` sidecar so a search
    against the index can validate/derive them instead of silently
    computing a wrong subspace mapping."""
    cents = pq_train_codebook(
        emb, n_sub, n_codes, dim, n_iter, id_col, vec_col,
        sample_mod, seed_by_hash,
    )
    cents.write.mode("overwrite").parquet(f"{path}/codebook")
    dist = pq_dist_table(
        emb, n_sub, n_codes, dim, n_iter, id_col, vec_col, cents=cents
    ).persist()
    try:
        codes = pq_encode(dist, id_col)
        codes.write.mode("overwrite").parquet(f"{path}/codes")
        # Baseline quantization distortion of the corpus the codebook was
        # trained for — the drift reference rebuild_if_drifted compares
        # against. Derived from the SAME distance relation the encode
        # used (persisted above), so the baseline costs one extra narrow
        # aggregate, not a second distance pass.
        base = _mean_distortion_micro(dist, id_col)
    finally:
        dist.unpersist()
    emb.sparkSession.createDataFrame(
        [(n_sub, n_codes, dim, n_iter, base)],
        "n_sub int, n_codes int, dim int, n_iter int, "
        "base_distortion_micro long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def append_to_pq_index(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: str | None = None,
) -> None:
    """Fold a new vector batch into the persisted index — the second
    half of the daily loop (search, keep, append), the PQ twin of
    ops/neardup_index.append_to_band_index. The batch is encoded against
    the EXISTING codebook (no retraining — the codebook is the index's
    contract; rebuild_if_drifted is the maintenance leg) and its codes
    append to ``codes/``. O(batch) work; parameters come from the
    sidecar so a mismatched-geometry append cannot poison the index.

    Replay safety (since r8, same discipline as append_to_ivf_index):
    with a ``batch_id``, codes stage first and move in under
    deterministic ``<batch_id>-N`` names — a retried partial append
    completes exactly the missing files — and a ``batches/<batch_id>``
    marker (preserved across rebuild_if_drifted's swap, whose rebuilt
    codes include the batch by construction) makes a post-rebuild
    replay a no-op. Without a batch_id the append is a plain
    non-idempotent write and the caller owns replay protection."""

    spark = new_emb.sparkSession
    if batch_id is not None and IO.batch_done(path, batch_id):
        return  # replayed batch: already folded in (possibly pre-rebuild)
    p = read_pq_params(spark, path)
    # geometry check is distributed and cheap (limit-1 probe): a
    # wrong-dimension batch would encode into a subset of the subspaces
    # and spuriously rank at the top of every later ADC search.
    bad = (
        new_emb.filter(F.size(F.col(vec_col)) != p["dim"]).limit(1).count()
    )
    if bad:
        raise ValueError(
            f"index at {path} expects {p['dim']}-dim vectors; the batch "
            "contains a different dimensionality"
        )
    codebook = spark.read.parquet(f"{path}/codebook")
    dist = pq_dist_table(
        new_emb,
        p["n_sub"],
        p["n_codes"],
        p["dim"],
        p["n_iter"],
        id_col,
        vec_col,
        cents=codebook,
    )
    codes = pq_encode(dist, id_col)
    if batch_id is None:
        codes.write.mode("append").parquet(f"{path}/codes")
        return
    bid = batch_id
    stage = f"{path}/.append-stage-{bid}"
    IO.begin_batch(path, bid)
    codes.coalesce(1).write.mode("overwrite").parquet(f"{stage}/codes")
    IO.move_staged_files(f"{stage}/codes", f"{path}/codes", bid)
    shutil.rmtree(stage, ignore_errors=True)
    IO.finish_batch(path, bid)


def read_pq_params(spark: SparkSession, path: str) -> dict[str, int]:
    """The build-time parameter sidecar as a dict (n_sub, n_codes, dim,
    n_iter). Indexes built before the sidecar existed raise — rebuilding
    is cheaper than silently mis-searching."""
    row = spark.read.parquet(f"{path}/params").collect()[0]
    return {k: int(v) for k, v in row.asDict().items()}


def _pq_query_dist_table(
    codebook: DataFrame, query_vec: list[float], sub: int
) -> DataFrame:
    """The query's (m, code) ADC lookup table from the codebook relation
    alone — a projection over metadata-scale rows, same micro-unit
    quantization as the corpus encode. Shared by pq_search_index and the
    IVF-PQ search (ops/ivfpq_index.py), so the two serving paths compute
    identical ADC distances BY CONSTRUCTION."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qx = F.element_at(q, F.col("pos") + 1).cast("double")
    return (
        codebook.select(
            (F.col("pos") / sub).cast("int").alias("m"),
            "code",
            ((qx - F.col("cb_val")) ** 2).alias("d"),
        )
        .groupBy("m", "code")
        .agg(
            F.floor(F.sum("d") * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("q_dist2_micro")
        )
    )


def pq_search_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_sub: int | None = None,
    dim: int | None = None,
    exclude_ids: list[int] | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k from the PERSISTED index: no training, no full-precision
    vector reads. The query's (m, code) distance table derives from the
    codebook relation alone (literal query array indexed by pos — a
    projection over metadata-scale rows), broadcasts, and joins the
    codes scan; the ADC distance is the usual order-independent LONG sum.

    ``n_sub``/``dim`` default to the values persisted at build time
    (``params/`` sidecar); passing explicit values that contradict the
    sidecar raises instead of silently computing distances in a wrong
    subspace mapping.
    """
    params = read_pq_params(spark, path)
    for name, given in (("n_sub", n_sub), ("dim", dim)):
        if given is not None and given != params[name]:
            raise ValueError(
                f"index at {path} was built with {name}={params[name]}, "
                f"search requested {name}={given}"
            )
    n_sub = params["n_sub"]
    dim = params["dim"]
    if len(query_vec) != dim:
        raise ValueError(
            f"query vector has {len(query_vec)} dims; index expects {dim}"
        )
    sub = dim // n_sub
    codebook = spark.read.parquet(f"{path}/codebook")
    codes = spark.read.parquet(f"{path}/codes")
    qtab = _pq_query_dist_table(codebook, query_vec, sub)
    scan = codes
    if exclude_ids:
        scan = scan.filter(~F.col(id_col).isin(exclude_ids))
    adc = (
        scan.join(F.broadcast(qtab), ["m", "code"])
        .groupBy(id_col)
        .agg(F.sum("q_dist2_micro").alias("adc_micro"))
    )
    return adc.orderBy(F.asc("adc_micro"), F.asc(id_col)).limit(k)


def pq_index_distortion(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> int:
    """Mean quantization distortion (micro-units) of ``emb`` under the
    PERSISTED codebook — the drift signal. ``sample_mod`` bounds the
    scan to the deterministic ``pmod(xxhash64(id), S) = 0`` sample (the
    100 TB posture: the check costs O(corpus/S), same discipline as
    sampled training); the codebook relation is metadata scale. An
    EMPTY hash sample falls back to the full scan: that only happens
    when the corpus holds ~sample_mod rows or fewer, where the full
    scan is as cheap as the sample was meant to be — without the
    fallback a small deployment's in-stream drift check would crash."""
    spark = emb.sparkSession
    p = read_pq_params(spark, path)
    codebook = spark.read.parquet(f"{path}/codebook")

    def _eval(probe: DataFrame) -> int:
        dist = pq_dist_table(
            probe,
            p["n_sub"],
            p["n_codes"],
            p["dim"],
            p["n_iter"],
            id_col,
            vec_col,
            cents=codebook,
        )
        return _mean_distortion_micro(dist, id_col)

    try:
        return _eval(training_sample(emb, sample_mod, id_col))
    except ValueError:
        if sample_mod is None:
            raise  # genuinely empty corpus
        return _eval(emb)


def rebuild_if_drifted(
    emb: DataFrame,
    path: str,
    threshold: float = 1.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    seed_by_hash: bool = False,
) -> dict:
    """The index-maintenance leg appends were missing (VERDICT r7 item
    2): a codebook trained once degrades silently as appended batches
    drift — every new vector still encodes to SOME codeword, ADC
    distances just stop meaning anything, and recall decays with no
    error anywhere. This op closes the loop:

    1. evaluate the drift signal — current mean quantization distortion
       of ``emb`` (the full current corpus: standing + appended) against
       the persisted codebook, vs the ``base_distortion_micro`` recorded
       in the params sidecar at build time;
    2. ``current <= threshold * base`` → return without training
       (provably: the skip path never touches pq_train_codebook —
       monkeypatch-counted in tests);
    3. otherwise retrain on the CURRENT corpus into a staged sibling
       dir and atomically swap it in (the Warehouse swap discipline:
       stage fully, rename old aside, rename stage in, drop old —
       ``recover_pq_index`` heals the one crash window between the two
       renames). Search handles held open against the old dir keep
       reading their snapshot; new searches see the new index.

    Returns ``{"rebuilt": bool, "base_micro": int, "current_micro": int,
    "ratio": float}``. ``emb`` must be the corpus the index covers —
    the caller owns that contract, same as append.

    Only the PQ index needs this: the MinHash band index has no trained
    component (hash geometry never drifts — its calibration query,
    minhash_estimate_calibration, monitors estimator ERROR, which is
    band-geometry-driven, not data-driven).
    """
    spark = emb.sparkSession
    base = read_pq_params(spark, path).get("base_distortion_micro")
    if base is None:
        raise ValueError(
            f"index at {path} predates the distortion baseline sidecar; "
            "rebuild it once with build_pq_index to enable drift checks"
        )
    current = pq_index_distortion(emb, path, id_col, vec_col, sample_mod)
    ratio = current / base if base > 0 else float("inf")
    if base > 0 and current <= threshold * base:
        return {
            "rebuilt": False,
            "base_micro": base,
            "current_micro": current,
            "ratio": round(ratio, 4),
        }
    p = read_pq_params(spark, path)
    IO.assert_no_inflight_appends(path)
    stage = f"{path}{IO.STAGE_SUFFIX}"
    shutil.rmtree(stage, ignore_errors=True)  # droppings of a failed build
    build_pq_index(
        emb,
        stage,
        p["n_sub"],
        p["n_codes"],
        p["dim"],
        p["n_iter"],
        id_col,
        vec_col,
        sample_mod,
        seed_by_hash,
    )
    # the rebuilt codes include every appended batch by construction;
    # carrying the markers forward keeps replayed appends no-ops
    if os.path.isdir(f"{path}/batches"):
        shutil.copytree(f"{path}/batches", f"{stage}/batches")
    IO.mark_stage_complete(path)
    IO.swap_in_stage(path)
    return {
        "rebuilt": True,
        "base_micro": base,
        "current_micro": current,
        "ratio": round(ratio, 4),
    }


def recover_pq_index(path: str) -> str:
    """Heal an interrupted rebuild swap — see
    ops/_index_io.recover_index_dir (promote a COMPLETE stage, else
    restore the old index, else sweep droppings)."""
    return IO.recover_index_dir(path)


# ---------------------------------------------------------------------------
# persisted IVF index (round 8): the production leg of the k-means IVF
# queries, symmetric with the PQ index above. kmeans_ivf_topk_vec0
# retrains per call BY DESIGN so its DuckDB oracle verifies the full
# build; a deployment builds once, searches many, appends batches, and
# rebuilds on drift — this family.
# ---------------------------------------------------------------------------


def build_ivf_index(
    emb: DataFrame,
    path: str,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    seed_by_hash: bool = False,
) -> None:
    """Train k-means centroids (functions.similarity.kmeans_fit — the
    sampled/hash-seeded knobs are the 100 TB training posture) and
    persist under ``path``:

    - ``centroids/`` — the (label, pos, centroid_val) long layout,
      metadata scale;
    - ``vectors/``   — the full-precision vectors PARTITIONED BY their
      assigned cell, so a search's nprobe cells prune to nprobe
      directories natively (the same partition-pruning discipline as
      the band index's bucketed shingles);
    - ``params/``    — (k, n_iter, dim, base_distortion_micro): the
      geometry contract plus the drift baseline (mean squared distance
      to the assigned centroid, micro-units).
    """
    from data_platform_spark.functions.similarity import kmeans_fit

    spark = emb.sparkSession
    dim = emb.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[0][
        "d"
    ]
    cents, assign = kmeans_fit(
        emb, k, n_iter, id_col, vec_col, sample_mod, seed_by_hash
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    cells = assign.select(
        id_col, F.col("assigned_label").alias("cell"), "dist2"
    )
    emb.join(cells.select(id_col, "cell"), id_col).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(f"{path}/vectors")
    base = int(
        cells.agg(
            F.floor(F.avg(F.col("dist2") * 1_000_000) + F.lit(0.5))
            .cast("long")
            .alias("v")
        ).collect()[0]["v"]
    )
    spark.createDataFrame(
        [(k, n_iter, int(dim), base)],
        "k int, n_iter int, dim int, base_distortion_micro long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def read_ivf_params(spark: SparkSession, path: str) -> dict[str, int]:
    row = spark.read.parquet(f"{path}/params").collect()[0]
    return {k: int(v) for k, v in row.asDict().items()}


def _query_cell_dists(codebook: DataFrame, query_vec: list[float]) -> DataFrame:
    """Per-cell squared L2 of a literal query against the centroid
    relation — metadata scale, same 6-dp quantization and (dist2,
    label) ordering as functions.similarity.ivf_assign, so the probe
    set matches the in-memory search bit-for-bit."""
    from data_platform_spark.queries._util import pround

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qx = F.element_at(q, F.col("pos") + 1).cast("double")
    return codebook.groupBy("label").agg(
        pround(
            F.sum((qx - F.col("centroid_val")) * (qx - F.col("centroid_val"))),
            6,
        ).alias("dist2")
    )


def ivf_search_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    nprobe: int = 2,
    k: int = 10,
    exclude_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-rerank IVF search from the PERSISTED index: the query
    coarse-quantizes against ``centroids/`` (metadata scale), the
    nprobe nearest cell labels collect (≤ nprobe values) and push into
    the ``vectors/`` scan as a PARTITION FILTER — vector IO is bounded
    by the probed cells, not the corpus — and the exact cosine top-k
    runs over only those cells' vectors. Bit-identical to
    functions.similarity.ivf_topk_with_index over the same build
    (asserted in tests)."""
    from data_platform_spark.functions.similarity import cosine_topk

    p = read_ivf_params(spark, path)
    if len(query_vec) != p["dim"]:
        raise ValueError(
            f"query vector has {len(query_vec)} dims; index expects "
            f"{p['dim']}"
        )
    codebook = spark.read.parquet(f"{path}/centroids")
    probe = [
        r["label"]
        for r in _query_cell_dists(codebook, query_vec)
        .orderBy(F.asc("dist2"), F.asc("label"))
        .limit(nprobe)
        .collect()
    ]
    scan = spark.read.parquet(f"{path}/vectors")
    scan = (
        scan.filter(F.col("cell").isin(probe))
        if probe
        else scan.filter(F.lit(False))
    ).drop("cell")
    qv = spark.range(1).select(
        F.array(*[F.lit(float(x)) for x in query_vec]).alias("q")
    )
    return cosine_topk(
        scan, qv, k=k, id_col=id_col, vec_col=vec_col,
        exclude_ids=exclude_ids,
    )


def append_to_ivf_index(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: str | None = None,
) -> None:
    """Fold a new vector batch into the persisted index: assign against
    the EXISTING centroids (no retraining — the centroid set is the
    index's contract; rebuild_ivf_if_drifted is the maintenance leg)
    and append each vector into its cell partition under deterministic
    ``<batch_id>-N`` names (staged write + idempotent move, the shared
    ops/_index_io discipline — a retried partial append completes
    exactly the missing cells). O(batch) work; a wrong-dimension batch
    raises before any write.

    Replay safety across REBUILDS: a rebuild rewrites ``vectors/`` under
    fresh file names, so the deterministic-name skip alone cannot absorb
    a batch re-delivered after one (its targets no longer exist). A
    ``batches/<batch_id>`` done marker, PRESERVED by
    rebuild_ivf_if_drifted, records that the batch's rows are in the
    index (the rebuilt corpus includes them by construction) — a marked
    batch_id returns immediately. An INTENT marker written before any
    move makes the protocol two-phase: maintenance ops refuse to run
    over a crashed partial append, so its retry can always complete
    against unchanged file targets (ops/_index_io). Caller guarantees
    batch ids are unique per actual batch."""
    import uuid

    from data_platform_spark.functions.similarity import assign_to_centroids

    spark = new_emb.sparkSession
    if batch_id is not None and IO.batch_done(path, batch_id):
        return  # replayed batch: already folded in (possibly pre-rebuild)
    p = read_ivf_params(spark, path)
    bad = (
        new_emb.filter(F.size(F.col(vec_col)) != p["dim"]).limit(1).count()
    )
    if bad:
        raise ValueError(
            f"index at {path} expects {p['dim']}-dim vectors; the batch "
            "contains a different dimensionality"
        )
    codebook = spark.read.parquet(f"{path}/centroids")
    # shared flat/two-level routing (k from params, no distinct-count):
    # an n_cells ∝ corpus index must not broadcast its full centroid
    # set on the APPEND path either; flat below the bound, bit-identical
    assign = assign_to_centroids(
        new_emb, codebook, id_col, vec_col, n_iter=p["n_iter"], k=p["k"]
    )
    bid = batch_id if batch_id is not None else uuid.uuid4().hex[:12]
    stage = f"{path}/.append-stage-{bid}"
    if batch_id is not None:
        IO.begin_batch(path, batch_id)
    new_emb.join(
        assign.select(id_col, F.col("assigned_label").alias("cell")), id_col
    ).coalesce(1).write.partitionBy("cell").mode("overwrite").parquet(
        f"{stage}/vectors"
    )
    IO.move_staged_files(f"{stage}/vectors", f"{path}/vectors", bid)
    shutil.rmtree(stage, ignore_errors=True)
    if batch_id is not None:
        IO.finish_batch(path, batch_id)


def ivf_index_distortion(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> int:
    """Mean squared distance (micro-units) of ``emb`` to its nearest
    persisted centroid — the IVF drift signal (cells stop representing
    the data ⇒ probes stop finding true neighbors). ``sample_mod``
    bounds the scan to the deterministic hash sample; an EMPTY sample
    falls back to the full scan (only possible when the corpus holds
    ~sample_mod rows or fewer — see pq_index_distortion).

    Assignment routes through the shared flat/two-level rule (k from
    params): past IVF_ASSIGN_FLAT_MAX the per-batch drift check must
    not broadcast the full centroid set; the two-level distance is an
    upper bound on the exact one there (nprobe mis-routes inflate
    dist2 slightly), which only makes the drift signal conservative."""
    from data_platform_spark.functions.similarity import assign_to_centroids

    spark = emb.sparkSession
    p = read_ivf_params(spark, path)
    codebook = spark.read.parquet(f"{path}/centroids")

    def _eval(probe: DataFrame) -> int:
        assign = assign_to_centroids(
            probe, codebook, id_col, vec_col, n_iter=p["n_iter"], k=p["k"]
        )
        row = assign.agg(
            F.floor(F.avg(F.col("dist2") * 1_000_000) + F.lit(0.5))
            .cast("long")
            .alias("v")
        ).collect()[0]
        if row["v"] is None:
            raise ValueError(
                "distortion sample is empty — corpus has no vectors (or "
                "sample_mod is too large for it); cannot evaluate drift"
            )
        return int(row["v"])

    try:
        return _eval(training_sample(emb, sample_mod, id_col))
    except ValueError:
        if sample_mod is None:
            raise  # genuinely empty corpus
        return _eval(emb)


def rebuild_ivf_if_drifted(
    emb: DataFrame,
    path: str,
    threshold: float = 1.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    seed_by_hash: bool = False,
    rebuild_marker: str | None = None,
) -> dict:
    """The IVF twin of rebuild_if_drifted: evaluate the assignment
    distortion of the CURRENT corpus against the sidecar baseline, skip
    (provably — the skip path never reaches kmeans_fit) under the
    threshold, else retrain on the current corpus into a staged sibling
    and atomically swap (recover via recover_ivf_index).

    ``rebuild_marker`` (streaming sinks pass their batch id) stamps
    ``rebuilds/<marker>`` into the stage so it becomes live atomically
    WITH the swap; ``IO.rebuild_done`` then answers 'did this batch
    trigger a rebuild' idempotently across crash replays (ADVICE r10 —
    a crash between swap and ledger upsert otherwise re-evaluates
    drift against the fresh baseline and under-reports the rebuild)."""

    spark = emb.sparkSession
    p = read_ivf_params(spark, path)
    base = p.get("base_distortion_micro")
    if base is None:
        raise ValueError(
            f"index at {path} predates the distortion baseline sidecar; "
            "rebuild it once with build_ivf_index to enable drift checks"
        )
    current = ivf_index_distortion(emb, path, id_col, vec_col, sample_mod)
    ratio = current / base if base > 0 else float("inf")
    if base > 0 and current <= threshold * base:
        return {
            "rebuilt": False,
            "base_micro": base,
            "current_micro": current,
            "ratio": round(ratio, 4),
        }
    IO.assert_no_inflight_appends(path)
    stage = f"{path}{IO.STAGE_SUFFIX}"
    shutil.rmtree(stage, ignore_errors=True)
    build_ivf_index(
        emb, stage, p["k"], p["n_iter"], id_col, vec_col,
        sample_mod, seed_by_hash,
    )
    # the rebuilt corpus includes every appended batch by construction;
    # carrying the markers forward keeps replayed appends no-ops
    if os.path.isdir(f"{path}/batches"):
        shutil.copytree(f"{path}/batches", f"{stage}/batches")
    if os.path.isdir(f"{path}/{IO.REBUILDS_DIR}"):
        shutil.copytree(
            f"{path}/{IO.REBUILDS_DIR}", f"{stage}/{IO.REBUILDS_DIR}"
        )
    if rebuild_marker is not None:
        IO.stage_rebuild_marker(path, rebuild_marker)
    IO.mark_stage_complete(path)
    IO.swap_in_stage(path)
    return {
        "rebuilt": True,
        "base_micro": base,
        "current_micro": current,
        "ratio": round(ratio, 4),
    }


def recover_ivf_index(path: str) -> str:
    """Heal an interrupted IVF rebuild swap (ops/_index_io)."""
    return IO.recover_index_dir(path)
