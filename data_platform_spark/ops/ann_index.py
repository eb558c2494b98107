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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.functions.similarity import (
    pq_dist_table,
    pq_encode,
    pq_train_codebook,
)


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
    )
    codes = pq_encode(dist, id_col)
    codes.write.mode("overwrite").parquet(f"{path}/codes")
    emb.sparkSession.createDataFrame(
        [(n_sub, n_codes, dim, n_iter)],
        "n_sub int, n_codes int, dim int, n_iter int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def append_to_pq_index(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Fold a new vector batch into the persisted index — the second
    half of the daily loop (search, keep, append), the PQ twin of
    ops/neardup_index.append_to_band_index. The batch is encoded against
    the EXISTING codebook (no retraining — the codebook is the index's
    contract; periodic rebuilds are a separate maintenance op) and its
    codes append to ``codes/``. O(batch) work; parameters come from the
    sidecar so a mismatched-geometry append cannot poison the index.
    Caller guarantees batch ids are not already indexed."""
    spark = new_emb.sparkSession
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
    pq_encode(dist, id_col).write.mode("append").parquet(f"{path}/codes")


def read_pq_params(spark: SparkSession, path: str) -> dict[str, int]:
    """The build-time parameter sidecar as a dict (n_sub, n_codes, dim,
    n_iter). Indexes built before the sidecar existed raise — rebuilding
    is cheaper than silently mis-searching."""
    row = spark.read.parquet(f"{path}/params").collect()[0]
    return {k: int(v) for k, v in row.asDict().items()}


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
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qx = F.element_at(q, F.col("pos") + 1).cast("double")
    qtab = (
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
    scan = codes
    if exclude_ids:
        scan = scan.filter(~F.col(id_col).isin(exclude_ids))
    adc = (
        scan.join(F.broadcast(qtab), ["m", "code"])
        .groupBy(id_col)
        .agg(F.sum("q_dist2_micro").alias("adc_micro"))
    )
    return adc.orderBy(F.asc("adc_micro"), F.asc(id_col)).limit(k)
