"""Persisted IVF-PQ index — the production ANN layout that composes the
two quantizers the separate index families already serve alone:

- the IVF coarse quantizer bounds **IO**: codes partition by their
  nearest-centroid cell, so a search's nprobe cells prune to nprobe
  directories natively (the band-index / IVF-index partition-pruning
  discipline);
- the PQ fine quantizer bounds **bytes**: inside the probed cells the
  scan touches only (id, m, code) rows — log2(n_codes) bits per
  subspace, never the full-precision vectors.

This is the FAISS ``IVFx,PQy`` layout re-expressed as parquet + Catalyst:
at 100 TB neither half suffices alone (IVF over raw vectors still reads
full-width floats inside the probed cells; flat PQ still scans every
code row), composed they make search IO ∝ (corpus/n_cells)·nprobe·codes
bytes. Layout under ``path``:

- ``centroids/`` — coarse k-means centroids, (label, pos, centroid_val)
  long layout, metadata scale;
- ``codebook/``  — PQ codebook, (code, pos, cb_val) long layout,
  metadata scale;
- ``codes/``     — one (id, m, code) row per vector-subspace,
  PARTITIONED BY the assigned ``cell``;
- ``params/``    — geometry contract + the PQ distortion drift baseline.

Codes encode the RAW vectors (not per-cell residuals) against one shared
codebook — the same math as the flat PQ family, so with ``nprobe =
n_cells`` a search is BIT-IDENTICAL to ``pq_search_index`` over the same
corpus (asserted in tests; the ADC lookup table is literally the shared
``ann_index._pq_query_dist_table``). Residual encoding buys finer cells
at the cost of per-cell codebooks; the shared-codebook form keeps the
oracle-gated PQ math intact end-to-end, which is this engine's
correctness instrument.

Maintenance legs mirror the sibling families: batch append under the
two-phase ``_index_io`` marker protocol, distortion-triggered rebuild
with atomic staged swap, crash recovery, and per-cell compaction
(ops/compaction.py).

No reference parity: the reference (Airflow DAG scaffolding,
/root/reference/dags/) has no vector surface; this is charter extension
scope (similarity search at training-data scale).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.functions.similarity import (
    assign_to_centroids,
    kmeans_fit,
    pq_dist_table,
    pq_encode,
    pq_train_codebook,
    training_sample,
)
from data_platform_spark.ops import _index_io as IO
from data_platform_spark.ops.ann_index import (
    _mean_distortion_micro,
    _pq_query_dist_table,
    _query_cell_dists,
)


def build_ivfpq_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 8,
    n_sub: int = 4,
    n_codes: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    seed_by_hash: bool = False,
) -> None:
    """Train both quantizers and persist the composed index under
    ``path``. Each trains exactly once: the k-means assignment threads
    into the cell partitioning and the PQ codebook threads into the
    encode (``pq_dist_table(cents=...)``), so the persisted halves are
    consistent by construction. ``sample_mod``/``seed_by_hash`` are the
    100 TB training posture for BOTH quantizers (hash-sampled Lloyd
    scans, hash-ordered seeds); assignment and encoding always cover
    the full corpus. The PQ quantization distortion baseline lands in
    the params sidecar — the drift reference for
    :func:`rebuild_ivfpq_if_drifted` (cell-assignment drift and code
    drift share the root cause — the data moved — and the PQ signal is
    the finer of the two)."""
    spark = emb.sparkSession
    dim = emb.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[
        0
    ]["d"]
    cents, assign = kmeans_fit(
        emb, n_cells, n_iter, id_col, vec_col, sample_mod, seed_by_hash
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    codebook = pq_train_codebook(
        emb, n_sub, n_codes, dim, n_iter, id_col, vec_col,
        sample_mod, seed_by_hash,
    )
    codebook.write.mode("overwrite").parquet(f"{path}/codebook")
    dist = pq_dist_table(
        emb, n_sub, n_codes, dim, n_iter, id_col, vec_col, cents=codebook
    ).persist()
    try:
        codes = pq_encode(dist, id_col)
        cells = assign.select(id_col, F.col("assigned_label").alias("cell"))
        codes.join(cells, id_col).write.partitionBy("cell").mode(
            "overwrite"
        ).parquet(f"{path}/codes")
        base = _mean_distortion_micro(dist, id_col)
    finally:
        dist.unpersist()
    spark.createDataFrame(
        [(n_cells, n_sub, n_codes, int(dim), n_iter, base)],
        "n_cells int, n_sub int, n_codes int, dim int, n_iter int, "
        "base_distortion_micro long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def read_ivfpq_params(spark: SparkSession, path: str) -> dict[str, int]:
    """The build-time parameter sidecar as a dict."""
    row = spark.read.parquet(f"{path}/params").collect()[0]
    return {k: int(v) for k, v in row.asDict().items()}


def ivfpq_search_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    nprobe: int = 2,
    k: int = 10,
    exclude_ids: list[int] | None = None,
    id_col: str = "vec_id",
    rerank_emb: DataFrame | None = None,
    shortlist: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k from the persisted composed index. The query coarse-
    quantizes against ``centroids/`` (metadata scale, same 6-dp cell
    ordering as the IVF family), the nprobe nearest cell labels push
    into the ``codes/`` scan as a PARTITION FILTER, and the ADC distance
    (broadcast lookup table from ``codebook/`` — the shared
    ``_pq_query_dist_table``) sums per id over only the probed cells'
    code rows. Neither full-precision vectors nor unprobed cells are
    read. With ``nprobe >= n_cells`` the result is bit-identical to
    ``pq_search_index`` over the same corpus (tested).

    ``rerank_emb`` adds the exact refine stage (the FAISS ``refine``
    wrapper): the ADC pass keeps a ``shortlist`` (default ``4*k``) of
    candidates, the full-precision vectors are fetched for ONLY those
    ids (an id-keyed semi-join against the caller's corpus relation —
    the index itself stays compressed), and exact squared-L2 reranks to
    the final k. Returns (id, adc_micro) without rerank, (id, d2_micro)
    with."""
    p = read_ivfpq_params(spark, path)
    if len(query_vec) != p["dim"]:
        raise ValueError(
            f"query vector has {len(query_vec)} dims; index expects "
            f"{p['dim']}"
        )
    sub = p["dim"] // p["n_sub"]
    centroids = spark.read.parquet(f"{path}/centroids")
    probe = [
        r["label"]
        for r in _query_cell_dists(centroids, query_vec)
        .orderBy(F.asc("dist2"), F.asc("label"))
        .limit(nprobe)
        .collect()
    ]
    codes = spark.read.parquet(f"{path}/codes")
    scan = (
        codes.filter(F.col("cell").isin(probe))
        if probe
        else codes.filter(F.lit(False))
    ).drop("cell")
    if exclude_ids:
        scan = scan.filter(~F.col(id_col).isin(exclude_ids))
    codebook = spark.read.parquet(f"{path}/codebook")
    qtab = _pq_query_dist_table(codebook, query_vec, sub)
    adc = (
        scan.join(F.broadcast(qtab), ["m", "code"])
        .groupBy(id_col)
        .agg(F.sum("q_dist2_micro").alias("adc_micro"))
    )
    if rerank_emb is None:
        return adc.orderBy(F.asc("adc_micro"), F.asc(id_col)).limit(k)
    short = adc.orderBy(F.asc("adc_micro"), F.asc(id_col)).limit(
        shortlist if shortlist is not None else 4 * k
    )
    from data_platform_spark.functions.similarity import as_double

    qv = spark.range(1).select(
        F.array(*[F.lit(float(x)) for x in query_vec]).alias("__q")
    )
    cand = rerank_emb.join(short.select(id_col), id_col)
    d2 = F.aggregate(
        F.zip_with(
            as_double(F.col(vec_col)),
            as_double(F.col("__q")),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cand.crossJoin(F.broadcast(qv)).select(
        id_col,
        F.floor(d2 * 1_000_000 + F.lit(0.5)).cast("long").alias("d2_micro"),
    )
    return scored.orderBy(F.asc("d2_micro"), F.asc(id_col)).limit(k)


def append_to_ivfpq_index(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: str | None = None,
) -> None:
    """Fold a new vector batch in: assign cells against the EXISTING
    centroids, encode against the EXISTING codebook (no retraining —
    both quantizers are the index's contract; the drift rebuild is the
    maintenance leg), and land the batch's code rows in their cell
    partitions under deterministic ``<batch_id>-N`` names. O(batch)
    work; a wrong-dimension batch raises before any write.

    Replay safety is the shared two-phase ``_index_io`` protocol: a
    ``batches/<batch_id>`` done marker (preserved across rebuilds and
    compactions) short-circuits re-delivery; the INTENT marker written
    before any move makes maintenance ops refuse over a crashed partial
    append so its retry always completes against unchanged targets."""
    import uuid

    spark = new_emb.sparkSession
    if batch_id is not None and IO.batch_done(path, batch_id):
        return  # replayed batch: already folded in (possibly pre-rebuild)
    p = read_ivfpq_params(spark, path)
    bad = (
        new_emb.filter(F.size(F.col(vec_col)) != p["dim"]).limit(1).count()
    )
    if bad:
        raise ValueError(
            f"index at {path} expects {p['dim']}-dim vectors; the batch "
            "contains a different dimensionality"
        )
    centroids = spark.read.parquet(f"{path}/centroids")
    codebook = spark.read.parquet(f"{path}/codebook")
    # shared flat/two-level routing (k from params): the append path
    # must not broadcast an n_cells ∝ corpus centroid set; flat below
    # IVF_ASSIGN_FLAT_MAX, bit-identical for every existing consumer
    assign = assign_to_centroids(
        new_emb, centroids, id_col, vec_col,
        n_iter=p["n_iter"], k=p["n_cells"],
    )
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
    codes = pq_encode(dist, id_col).join(
        assign.select(id_col, F.col("assigned_label").alias("cell")), id_col
    )
    bid = batch_id if batch_id is not None else uuid.uuid4().hex[:12]
    stage = f"{path}/.append-stage-{bid}"
    if batch_id is not None:
        IO.begin_batch(path, batch_id)
    codes.coalesce(1).write.partitionBy("cell").mode("overwrite").parquet(
        f"{stage}/codes"
    )
    IO.move_staged_files(f"{stage}/codes", f"{path}/codes", bid)
    shutil.rmtree(stage, ignore_errors=True)
    if batch_id is not None:
        IO.finish_batch(path, batch_id)


def ivfpq_index_distortion(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> int:
    """Mean PQ quantization distortion (micro-units) of ``emb`` under
    the persisted codebook — the drift signal (same semantics as
    pq_index_distortion; the codebook is the half whose degradation
    silently destroys ADC discrimination). ``sample_mod`` bounds the
    scan to the deterministic hash sample; an EMPTY sample falls back
    to the full scan (only possible when the corpus holds ~sample_mod
    rows or fewer)."""
    spark = emb.sparkSession
    p = read_ivfpq_params(spark, path)
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


def rebuild_ivfpq_if_drifted(
    emb: DataFrame,
    path: str,
    threshold: float = 1.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    seed_by_hash: bool = False,
    rebuild_marker: str | None = None,
) -> dict:
    """The composed maintenance leg: evaluate the PQ distortion of the
    CURRENT corpus against the sidecar baseline; under the threshold,
    return without training (the skip path never reaches kmeans_fit or
    pq_train_codebook — monkeypatch-counted in tests); otherwise retrain
    BOTH quantizers on the current corpus into a staged sibling and
    atomically swap, carrying the ``batches/`` markers so replayed
    appends stay no-ops (the rebuilt corpus includes them by
    construction). Refuses over an in-flight append (two-phase
    protocol). Heal an interrupted swap via
    :func:`recover_ivfpq_index`.

    ``rebuild_marker`` stamps ``rebuilds/<marker>`` into the stage so
    it goes live atomically WITH the swap — the crash-replay-safe
    'did this batch rebuild' signal the streaming sink's ledger derives
    its rebuilt flag from (ADVICE r10; see rebuild_ivf_if_drifted)."""
    spark = emb.sparkSession
    p = read_ivfpq_params(spark, path)
    base = p.get("base_distortion_micro")
    if base is None:
        raise ValueError(
            f"index at {path} predates the distortion baseline sidecar; "
            "rebuild it once with build_ivfpq_index to enable drift checks"
        )
    current = ivfpq_index_distortion(emb, path, id_col, vec_col, sample_mod)
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
    build_ivfpq_index(
        emb,
        stage,
        p["n_cells"],
        p["n_sub"],
        p["n_codes"],
        p["n_iter"],
        id_col,
        vec_col,
        sample_mod,
        seed_by_hash,
    )
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


def recover_ivfpq_index(path: str) -> str:
    """Heal an interrupted rebuild swap (ops/_index_io)."""
    return IO.recover_index_dir(path)


__all__ = [
    "append_to_ivfpq_index",
    "build_ivfpq_index",
    "ivfpq_index_distortion",
    "ivfpq_search_index",
    "read_ivfpq_params",
    "rebuild_ivfpq_if_drifted",
    "recover_ivfpq_index",
]
