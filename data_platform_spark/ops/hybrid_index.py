"""Production hybrid retrieval over the PERSISTED indexes — the
capstone of the four-index family (VERDICT r8 "What's missing" #1).

The oracled queries (queries/text.py ``hybrid_rrf_topk`` /
``chunk_hybrid_rrf_topk``) re-derive both retrieval legs from raw
text/vectors per call so DuckDB can verify the full math. This module
is the serving shape: the lexical leg reads the persisted BM25 index
(ops/lexical_index.py — postings partition-pruned to the query terms'
hash buckets) and the dense leg reads the persisted IVF index
(ops/ann_index.py — vectors partition-pruned to the query's nprobe
cells); reciprocal-rank fusion combines them with the exact expressions
the oracled query uses (integer micro-unit BM25, 4-dp cosine, 6-dp
``1/(k+rank)`` sum), so with full probing the composition is
BIT-IDENTICAL to the oracled query over the same corpus (asserted in
tests/test_ops.py) — consistency by construction, the discipline
functions/retrieval.py established for the lexical leg alone.

Approximation contract: the lexical leg is always EXACT (every doc
containing a query term is scored — the pruned scan is lossless). The
dense leg ranks within the ``nprobe`` probed cells; ``nprobe = k``
probes every cell and reproduces the oracled query's exact global
cosine ranking, smaller ``nprobe`` is the standard IVF recall/latency
trade. Ranks are GLOBAL row numbers via the two-phase
ops/global_order layout — no single-partition window on either leg.

``dense="ivfpq"`` (VERDICT r10 item 3) serves the dense leg from the
COMPOSED compressed index (ops/ivfpq_index.py) instead of the
raw-vector IVF index: the probed cells' scan touches only (id, m,
code) rows — at 100 TB the dense leg no longer reads full-width floats
inside the probed cells — and the full-precision vectors are fetched
for ONLY the candidate ids via an id join against the caller's corpus
relation (the raw cold tier the streaming sink maintains; the FAISS
refine split). An optional ADC ``shortlist`` bounds that fetch to the
top-S compressed-distance candidates. With every cell probed and no
shortlist the candidates are the whole corpus and the leg's 4-dp
cosine ranking — and therefore the fused result — stays BIT-IDENTICAL
to the oracled query (asserted in tests, plans asserting BOTH term-
bucket and cell partition pruning in the one composed job).

The two indexes must share one id domain (the testdata's doc_id/vec_id
contract); the fused output carries the LEXICAL index's id column name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.functions import retrieval as R
from data_platform_spark.functions import similarity as S
from data_platform_spark.ops import ann_index as AI
from data_platform_spark.ops import lexical_index as LX
from data_platform_spark.ops.global_order import (
    global_row_number,
    grouped_running_sum,
)
from data_platform_spark.queries._util import pround

RRF_K = 60


def _rrf(rrf_k: int) -> Column:
    """The score-free fusion: sum of reciprocal ranks, 6 dp — identical
    to the oracled expression (a missing leg contributes 0)."""
    return pround(
        F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rn_lex")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rn_dense")), F.lit(0.0)),
        6,
    )


def _lex_scored_from_index(
    spark: SparkSession,
    lexical_path: str,
    terms: list[str],
    k1: float,
    b: float,
) -> tuple[DataFrame, str]:
    """(fully-scored lexical relation, id column name): every document
    holding ≥1 query term with its BM25 score — the pruned-scan version
    of the oracled query's lexical leg (same score_tf expressions, df
    from the matched tf relation)."""
    matched, stats, p = LX._matched_from_index(spark, lexical_path, terms)
    scored = R.score_tf(
        matched,
        R.df_table_from_tf(matched),
        stats,
        [p["id_col"]],
        k1=k1,
        b=b,
        with_match_count=False,
    )
    return scored, p["id_col"]


def _dense_candidates_from_index(
    spark: SparkSession, ivf_path: str, query_vec: list[float], nprobe: int
) -> DataFrame:
    """The probed cells' vectors (id, embedding) from the persisted IVF
    index — partition-pruned to ≤ nprobe cell directories, the
    ivf_search_index scan shape."""
    p = AI.read_ivf_params(spark, ivf_path)
    if len(query_vec) != p["dim"]:
        raise ValueError(
            f"query vector has {len(query_vec)} dims; index expects "
            f"{p['dim']}"
        )
    codebook = spark.read.parquet(f"{ivf_path}/centroids")
    probe = [
        r["label"]
        for r in AI._query_cell_dists(codebook, query_vec)
        .orderBy(F.asc("dist2"), F.asc("label"))
        .limit(nprobe)
        .collect()
    ]
    scan = spark.read.parquet(f"{ivf_path}/vectors")
    return (
        scan.filter(F.col("cell").isin(probe))
        if probe
        else scan.filter(F.lit(False))
    ).drop("cell")


def _dense_candidates_from_ivfpq(
    spark: SparkSession,
    ivfpq_path: str,
    query_vec: list[float],
    nprobe: int,
    corpus_emb: DataFrame,
    shortlist: int | None,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The dense leg's candidate (id, embedding) relation from the
    COMPRESSED composed index: probed cells' (id, m, code) rows give
    the candidate ids — optionally ADC-shortlisted to the top-S
    compressed distances (the shared ``_pq_query_dist_table``, so the
    cut uses exactly the oracled ADC math) — and the full-precision
    vectors come from the caller's corpus relation via an id join
    (the index itself stays codes-only; the FAISS refine split)."""
    from data_platform_spark.ops import ivfpq_index as PI

    p = PI.read_ivfpq_params(spark, ivfpq_path)
    if len(query_vec) != p["dim"]:
        raise ValueError(
            f"query vector has {len(query_vec)} dims; index expects "
            f"{p['dim']}"
        )
    centroids = spark.read.parquet(f"{ivfpq_path}/centroids")
    probe = [
        r["label"]
        for r in AI._query_cell_dists(centroids, query_vec)
        .orderBy(F.asc("dist2"), F.asc("label"))
        .limit(nprobe)
        .collect()
    ]
    codes = spark.read.parquet(f"{ivfpq_path}/codes")
    scan = (
        codes.filter(F.col("cell").isin(probe))
        if probe
        else codes.filter(F.lit(False))
    ).drop("cell")
    if shortlist is None:
        cand_ids = scan.select(id_col).distinct()
    else:
        codebook = spark.read.parquet(f"{ivfpq_path}/codebook")
        qtab = AI._pq_query_dist_table(
            codebook, query_vec, p["dim"] // p["n_sub"]
        )
        cand_ids = (
            scan.join(F.broadcast(qtab), ["m", "code"])
            .groupBy(id_col)
            .agg(F.sum("q_dist2_micro").alias("adc_micro"))
            .orderBy(F.asc("adc_micro"), F.asc(id_col))
            .limit(shortlist)
            .select(id_col)
        )
    return corpus_emb.select(id_col, vec_col).join(cand_ids, id_col)


def hybrid_search_index(
    spark: SparkSession,
    lexical_path: str,
    ivf_path: str,
    terms: list[str],
    query_vec: list[float],
    topk: int = 20,
    nprobe: int = 2,
    rrf_k: int = RRF_K,
    k1: float = R.BM25_K1,
    b: float = R.BM25_B,
    exclude_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dense: str = "ivf",
    corpus_emb: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """Top-k hybrid retrieval for one (term set, query vector) pair
    against the persisted lexical + dense indexes: (id…, rn_lex,
    rn_dense, rrf) — the oracled hybrid_rrf_topk's output shape. Both
    index scans prune (term buckets; nprobe cells — plan-asserted in
    tests); with ``nprobe`` = the index's cell count (and, for
    ``dense="ivfpq"``, ``shortlist=None``) the result is bit-identical
    to the oracled query on the same corpus.
    ``exclude_ids`` removes e.g. the query document itself from BOTH
    legs (the oracled query's ``!= 0`` filters).

    ``dense`` picks the dense leg's index family: ``"ivf"`` reads
    ``ivf_path`` as the raw-vector IVF index (ops/ann_index.py);
    ``"ivfpq"`` reads it as the composed compressed index
    (ops/ivfpq_index.py) — candidate ids come from the probed cells'
    code rows (optionally ADC-``shortlist``ed), and ``corpus_emb``
    (REQUIRED for ivfpq — the raw-vector cold tier) supplies the
    full-precision vectors for only those candidates via an id join."""
    lex_scored, lex_id = _lex_scored_from_index(
        spark, lexical_path, terms, k1, b
    )
    if dense == "ivfpq":
        if corpus_emb is None:
            raise ValueError(
                "dense='ivfpq' needs corpus_emb: the composed index "
                "stores codes, not vectors — pass the raw-vector corpus "
                "relation (the streaming sink's corpus_path table)"
            )
        dense_cand = _dense_candidates_from_ivfpq(
            spark, ivf_path, query_vec, nprobe, corpus_emb,
            shortlist, id_col, vec_col,
        )
    elif dense == "ivf":
        dense_cand = _dense_candidates_from_index(
            spark, ivf_path, query_vec, nprobe
        )
    else:
        raise ValueError(f"unknown dense leg {dense!r}: use 'ivf'/'ivfpq'")
    if exclude_ids:
        lex_scored = lex_scored.filter(~F.col(lex_id).isin(exclude_ids))
        dense_cand = dense_cand.filter(~F.col(id_col).isin(exclude_ids))
    lex = global_row_number(
        lex_scored, [F.desc("score_micro"), F.asc(lex_id)], "rn_lex"
    ).select(lex_id, "rn_lex")

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dense_scored = dense_cand.select(
        F.col(id_col).alias(lex_id),
        pround(S.cosine(S.as_double(F.col(vec_col)), q), 4).alias(
            "cosine"
        ),
    )
    dense = global_row_number(
        dense_scored, [F.desc("cosine"), F.asc(lex_id)], "rn_dense"
    ).select(lex_id, "rn_dense")

    fused = dense.join(lex, lex_id, "full_outer").select(
        lex_id, "rn_lex", "rn_dense", _rrf(rrf_k).alias("rrf")
    )
    return fused.orderBy(F.desc("rrf"), F.asc(lex_id)).limit(topk)


def hybrid_batch_search_index(
    spark: SparkSession,
    lexical_path: str,
    ivf_path: str,
    query_terms: DataFrame,
    query_vecs: DataFrame,
    topk: int = 10,
    nprobe: int = 2,
    rrf_k: int = RRF_K,
    k1: float = R.BM25_K1,
    b: float = R.BM25_B,
    id_col: str = "vec_id",
    dense: str = "ivf",
    corpus_emb: DataFrame | None = None,
    shortlist: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query top-k hybrid retrieval for a WORKLOAD in one pass over
    each index — the retrieval-eval shape (N queries × corpus), the
    hybrid twin of ops/lexical_index.bm25_batch_search_index.
    ``query_terms`` is a (query_id, term) relation and ``query_vecs`` a
    (query_id, qv array<double>) relation — both metadata scale (they
    are a workload, not data), so they broadcast into the scans.

    One lexical scan covers every query's term buckets; one dense scan
    covers the UNION of every query's nprobe probe cells, then each
    query joins back to only its own cells' vectors. Per-query ranks go
    through the grouped two-phase layout (a popular query would
    otherwise funnel corpus-scale rows through one window task).
    Returns (query_id, id…, rn_lex, rn_dense, rrf, rn) with rn ≤ topk —
    per query, bit-identical to hybrid_search_index with the same
    arguments (asserted in tests).

    ``dense``/``corpus_emb``/``shortlist`` mirror hybrid_search_index:
    with ``dense="ivfpq"`` the one dense scan touches only the probed
    cells' (id, m, code) rows of the composed index, each query keeps
    its own cells' candidate ids (per-query ADC shortlisting rides the
    grouped two-phase rank — no per-query window funnel), and the
    full vectors join in from ``corpus_emb`` for only those ids."""
    terms = [
        r[0] for r in query_terms.select("term").distinct().collect()
    ]
    matched, stats, p = LX._matched_from_index(spark, lexical_path, terms)
    lex_id = p["id_col"]
    df_tab = R.df_table_from_tf(matched)  # corpus property: pre-join
    per_query = matched.join(
        F.broadcast(query_terms.select("query_id", "term")), "term"
    )
    lex_scored = R.score_tf(
        per_query,
        df_tab,
        stats,
        ["query_id", lex_id],
        k1=k1,
        b=b,
        with_match_count=False,
    )
    lex = grouped_running_sum(
        lex_scored,
        ["query_id"],
        [F.desc("score_micro"), F.asc(lex_id)],
        F.lit(1).cast("long"),
        "rn_lex",
    ).select("query_id", lex_id, "rn_lex")

    # per-query probe cells: the query workload against the metadata-
    # scale centroid relation; nprobe-of-k per query is a bounded-domain
    # window (≤ k rows per query). Both index families persist the same
    # (label, pos, centroid_val) coarse-quantizer layout.
    from pyspark.sql.window import Window

    if dense == "ivfpq":
        from data_platform_spark.ops import ivfpq_index as PI

        if corpus_emb is None:
            raise ValueError(
                "dense='ivfpq' needs corpus_emb: the composed index "
                "stores codes, not vectors — pass the raw-vector corpus "
                "relation (the streaming sink's corpus_path table)"
            )
        ivp = PI.read_ivfpq_params(spark, ivf_path)
    elif dense == "ivf":
        ivp = AI.read_ivf_params(spark, ivf_path)
    else:
        raise ValueError(f"unknown dense leg {dense!r}: use 'ivf'/'ivfpq'")
    codebook = spark.read.parquet(f"{ivf_path}/centroids")
    qx = F.element_at(F.col("qv"), F.col("pos") + 1).cast("double")
    qcell = (
        query_vecs.crossJoin(F.broadcast(codebook))
        .groupBy("query_id", "label")
        .agg(
            pround(
                F.sum(
                    (qx - F.col("centroid_val"))
                    * (qx - F.col("centroid_val"))
                ),
                6,
            ).alias("dist2")
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.asc("dist2"), F.asc("label")
    )
    probes = (
        qcell.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", F.col("label").alias("cell"))
    )
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    if dense == "ivfpq":
        scan = spark.read.parquet(f"{ivf_path}/codes")
        scan = (
            scan.filter(F.col("cell").isin(cells))
            if cells
            else scan.filter(F.lit(False))
        )
        per_q = scan.join(F.broadcast(probes), "cell")
        if shortlist is None:
            cand = per_q.select("query_id", id_col).distinct()
        else:
            # per-query ADC lookup table — the batch twin of the shared
            # _pq_query_dist_table (same subspace mapping and micro-unit
            # rounding), one metadata-scale relation for the workload
            sub = ivp["dim"] // ivp["n_sub"]
            pq_cb = spark.read.parquet(f"{ivf_path}/codebook")
            qtab = (
                query_vecs.crossJoin(F.broadcast(pq_cb))
                .select(
                    "query_id",
                    (F.col("pos") / sub).cast("int").alias("m"),
                    "code",
                    ((qx - F.col("cb_val")) ** 2).alias("d"),
                )
                .groupBy("query_id", "m", "code")
                .agg(
                    F.floor(F.sum("d") * 1_000_000 + F.lit(0.5))
                    .cast("long")
                    .alias("q_dist2_micro")
                )
            )
            adc = (
                per_q.join(F.broadcast(qtab), ["query_id", "m", "code"])
                .groupBy("query_id", id_col)
                .agg(F.sum("q_dist2_micro").alias("adc_micro"))
            )
            cand = (
                grouped_running_sum(
                    adc,
                    ["query_id"],
                    [F.asc("adc_micro"), F.asc(id_col)],
                    F.lit(1).cast("long"),
                    "__adc_rk",
                )
                .filter(F.col("__adc_rk") <= shortlist)
                .select("query_id", id_col)
            )
        dense_scored = (
            cand.join(corpus_emb.select(id_col, vec_col), id_col)
            .join(F.broadcast(query_vecs), "query_id")
            .select(
                "query_id",
                F.col(id_col).alias(lex_id),
                pround(
                    S.cosine(S.as_double(F.col(vec_col)), F.col("qv")), 4
                ).alias("cosine"),
            )
        )
    else:
        scan = spark.read.parquet(f"{ivf_path}/vectors")
        scan = (
            scan.filter(F.col("cell").isin(cells))
            if cells
            else scan.filter(F.lit(False))
        )
        dense_scored = (
            scan.join(F.broadcast(probes), "cell")
            .join(F.broadcast(query_vecs), "query_id")
            .select(
                "query_id",
                F.col(id_col).alias(lex_id),
                pround(
                    S.cosine(S.as_double(F.col("embedding")), F.col("qv")), 4
                ).alias("cosine"),
            )
        )
    dense = grouped_running_sum(
        dense_scored,
        ["query_id"],
        [F.desc("cosine"), F.asc(lex_id)],
        F.lit(1).cast("long"),
        "rn_dense",
    ).select("query_id", lex_id, "rn_dense")

    fused = dense.join(lex, ["query_id", lex_id], "full_outer").select(
        "query_id", lex_id, "rn_lex", "rn_dense", _rrf(rrf_k).alias("rrf")
    )
    ranked = grouped_running_sum(
        fused,
        ["query_id"],
        [F.desc("rrf"), F.asc(lex_id)],
        F.lit(1).cast("long"),
        "rn",
    )
    return ranked.filter(F.col("rn") <= topk)


__all__ = ["hybrid_search_index", "hybrid_batch_search_index", "RRF_K"]
