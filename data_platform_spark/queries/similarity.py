"""Similarity-search queries over the embeddings table: exact cosine
top-k (baseline), per-label centroids (IVF building block), and
sign-random-projection LSH bucket histogram (the scale path's bucketing).

Oracle mirrors the same double-precision math; all similarity values
rounded to 4 dp so results are stable under summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.cache import scoped_persist
from data_platform_spark.functions import similarity as S
from data_platform_spark.queries._util import fan_out, pround, sql_round
from data_platform_spark.sources.tables import load_table

QUERY_VEC_ID = 0
TOP_K = 10
N_PLANES = 16
DIM = 64


def cosine_topk_vec0(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q")
    )
    return S.cosine_topk(emb, qv, k=TOP_K, exclude_ids=[QUERY_VEC_ID])


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.label_centroids(emb)


def srp_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket sizes: how the SRP signature partitions the vector space.

    This is the candidate-generation structure for ANN at scale — vectors
    sharing a signature land in one shuffle partition; top-k then runs
    per-bucket instead of globally.
    """
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    return (
        emb.select(
            S.srp_signature_np(F.col("embedding"), N_PLANES, DIM).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


QUERIES = {
    "cosine_topk_vec0": cosine_topk_vec0,
    "embedding_label_centroids": embedding_label_centroids,
    "srp_bucket_histogram": srp_bucket_histogram,
}


def _srp_proj_sql(p: int, col: str = "embedding") -> str:
    # mirror of S.srp_signature: weight(i,p) in [-0.5, 0.5), i is 1-based;
    # projection quantized to SRP_QUANTUM_DP before the sign test (same
    # quantum as both Spark implementations); p is the ABSOLUTE plane
    # index, so banded tables are just higher plane ranges
    raw = (
        f"(SELECT sum({col}[i]::DOUBLE * "
        f"((((i * 2654435761 + {(p + 1) * 40503}) % 1997)::DOUBLE / 1997.0) - 0.5)) "
        f"FROM generate_series(1, {DIM}) AS t(i))"
    )
    return sql_round(raw, S.SRP_QUANTUM_DP)


def _srp_bucket_sql(n_planes: int, plane_offset: int, col: str = "embedding") -> str:
    # bucket of one plane family: bit b (local) = sign of plane
    # (plane_offset + b); mirrors S.srp_signature_np(plane_offset=...)
    return " + ".join(
        f"(CASE WHEN {_srp_proj_sql(plane_offset + b, col)} > 0"
        f" THEN {1 << b} ELSE 0 END)"
        for b in range(n_planes)
    )


_COSINE_SQL = (
    "list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
)


def _build_oracle() -> dict[str, str]:
    srp_bits = " + ".join(
        f"(CASE WHEN {_srp_proj_sql(p)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return {
        "cosine_topk_vec0": f"""
            WITH q AS (
                SELECT embedding AS qv FROM embeddings
                WHERE vec_id = {QUERY_VEC_ID}
            ),
            scored AS (
                SELECT
                    e.vec_id,
                    {sql_round(_COSINE_SQL, 4)} AS cosine
                FROM embeddings e, q
                WHERE e.vec_id <> {QUERY_VEC_ID}
            )
            SELECT vec_id, cosine FROM scored
            ORDER BY cosine DESC, vec_id ASC
            LIMIT {TOP_K}
        """,
        "embedding_label_centroids": f"""
            SELECT
                label,
                i - 1 AS pos,
                {sql_round("avg(embedding[i]::DOUBLE)", 4)} AS centroid_val
            FROM embeddings, generate_series(1, {DIM}) AS t(i)
            GROUP BY label, i - 1
        """,
        "srp_bucket_histogram": f"""
            SELECT bucket, count(*) AS n_vectors
            FROM (
                SELECT {srp_bits} AS bucket
                FROM embeddings
            )
            GROUP BY bucket
        """,
    }


ORACLE = _build_oracle()


# ---------------------------------------------------------------------------
# second wave: IVF assignment + SRP-bucketed ANN
# ---------------------------------------------------------------------------


def ivf_assign_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest label
    centroid (L2). Centroids are a tiny long-layout relation (label, pos,
    value) — broadcast into the posexploded vector join; argmin per vector
    via window with deterministic tie-break. The building block for
    IVF-style ANN: probe only the assigned cell's vectors at query time.
    """
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    cents = S.label_centroids(emb)  # label, pos, centroid_val (rounded 4dp)
    return S.ivf_assign(emb, cents)


def srp_ann_topk_vec0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN search: restrict cosine top-k to the query vector's SRP bucket.

    The scale path for similarity search — candidate set is one LSH bucket
    (equi-filter on signature), exact cosine re-ranking only within it.
    """
    from data_platform_spark.queries._util import pround

    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    with_bucket = emb.select(
        "vec_id",
        "embedding",
        S.srp_signature_np(F.col("embedding"), N_PLANES, DIM).alias("bucket"),
    )
    q = with_bucket.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q"), F.col("bucket").alias("qbucket")
    )
    cand = with_bucket.crossJoin(F.broadcast(q)).filter(
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != QUERY_VEC_ID)
    )
    sim = cand.select(
        "vec_id",
        pround(
            S.cosine(S.as_double(F.col("embedding")), S.as_double(F.col("q"))), 4
        ).alias("cosine"),
    )
    return sim.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(TOP_K)


QUERIES.update(
    {
        "ivf_assign_nearest_centroid": ivf_assign_nearest_centroid,
        "srp_ann_topk_vec0": srp_ann_topk_vec0,
    }
)


def _extend_oracle() -> None:
    srp_bits = " + ".join(
        f"(CASE WHEN {_srp_proj_sql(p)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    ORACLE.update(
        {
            "ivf_assign_nearest_centroid": f"""
                WITH cents AS (
                    SELECT
                        label,
                        i - 1 AS pos,
                        {sql_round("avg(embedding[i]::DOUBLE)", 4)} AS centroid_val
                    FROM embeddings, generate_series(1, {DIM}) AS t(i)
                    GROUP BY label, i - 1
                ),
                vec_long AS (
                    SELECT vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS x
                    FROM embeddings, generate_series(1, {DIM}) AS t(i)
                ),
                dist AS (
                    SELECT
                        v.vec_id,
                        c.label,
                        {sql_round("sum((v.x - c.centroid_val) * (v.x - c.centroid_val))", 6)} AS dist2
                    FROM vec_long v JOIN cents c ON v.pos = c.pos
                    GROUP BY v.vec_id, c.label
                ),
                ranked AS (
                    SELECT
                        vec_id, label, dist2,
                        row_number() OVER (
                            PARTITION BY vec_id ORDER BY dist2 ASC, label ASC
                        ) AS rk
                    FROM dist
                )
                SELECT vec_id, label AS assigned_label, dist2
                FROM ranked WHERE rk = 1
            """,
            "srp_ann_topk_vec0": f"""
                WITH bucketed AS (
                    SELECT vec_id, embedding, {srp_bits} AS bucket
                    FROM embeddings
                ),
                q AS (
                    SELECT embedding AS qv, bucket AS qbucket FROM bucketed
                    WHERE vec_id = {QUERY_VEC_ID}
                ),
                scored AS (
                    SELECT
                        e.vec_id,
                        {sql_round(_COSINE_SQL, 4)} AS cosine
                    FROM bucketed e, q
                    WHERE e.bucket = q.qbucket AND e.vec_id <> {QUERY_VEC_ID}
                )
                SELECT vec_id, cosine FROM scored
                ORDER BY cosine DESC, vec_id ASC
                LIMIT {TOP_K}
            """,
        }
    )


_extend_oracle()


def embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over vectors: L2 norm, min/max element,
    argmax position — all JVM array built-ins, no Python."""
    from data_platform_spark.queries._util import pround

    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    dvec = S.as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        pround(S.l2_norm(dvec), 4).alias("l2_norm"),
        pround(F.array_min(dvec), 4).alias("min_val"),
        pround(F.array_max(dvec), 4).alias("max_val"),
        (F.array_position(F.col("embedding"), F.array_max(F.col("embedding"))) - 1)
        .cast("long")
        .alias("argmax_pos"),
    )


QUERIES["embedding_vector_stats"] = embedding_vector_stats

ORACLE["embedding_vector_stats"] = f"""
    SELECT
        vec_id,
        {sql_round("sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))", 4)} AS l2_norm,
        {sql_round("list_aggregate(embedding::DOUBLE[], 'min')", 4)} AS min_val,
        {sql_round("list_aggregate(embedding::DOUBLE[], 'max')", 4)} AS max_val,
        list_position(embedding, list_aggregate(embedding, 'max')) - 1 AS argmax_pos
    FROM embeddings
"""


def knn_within_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN join via LSH buckets: top-3 neighbors per vector, where
    candidates are restricted to the vector's SRP bucket — the all-pairs
    version of ANN search. Cost ∝ Σ bucket_size², never n².

    100 TB join layout: pair GENERATION self-joins only (vec_id, bucket) —
    a few bytes per row — so the bucket-keyed shuffle (the skew-prone one:
    bucket sizes are power-law) never carries embeddings. Vectors re-join
    the candidate pairs afterwards on vec_id (uniformly distributed) for
    re-ranking only.
    """
    from pyspark.sql.window import Window
    from data_platform_spark.queries._util import pround

    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    ids = emb.select(
        "vec_id",
        S.srp_signature_np(F.col("embedding"), N_PLANES, DIM).alias("bucket"),
    ).transform(scoped_persist)
    a = ids.select("bucket", F.col("vec_id").alias("src"))
    b = ids.select("bucket", F.col("vec_id").alias("dst"))
    pairs = a.join(b, "bucket").filter(F.col("src") != F.col("dst")).select(
        "src", "dst"
    )
    vecs = emb.select("vec_id", "embedding")
    scored = (
        pairs.join(
            vecs.select(
                F.col("vec_id").alias("src"), F.col("embedding").alias("e_src")
            ),
            "src",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("dst"), F.col("embedding").alias("e_dst")
            ),
            "dst",
        )
        .select(
            "src",
            "dst",
            pround(
                S.cosine(S.as_double(F.col("e_src")), S.as_double(F.col("e_dst"))),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("src", "dst", "cosine", "rk")
    )


QUERIES["knn_within_buckets"] = knn_within_buckets


def _knn_oracle() -> str:
    srp_bits = " + ".join(
        f"(CASE WHEN {_srp_proj_sql(p)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    cos = (
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    )
    return f"""
        WITH bucketed AS (
            SELECT vec_id, embedding, {srp_bits} AS bucket FROM embeddings
        ),
        scored AS (
            SELECT
                a.vec_id AS src,
                b.vec_id AS dst,
                {sql_round(cos, 4)} AS cosine
            FROM bucketed a
            JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        )
        SELECT src, dst, cosine, rk FROM (
            SELECT *, row_number() OVER (
                PARTITION BY src ORDER BY cosine DESC, dst ASC
            ) AS rk
            FROM scored
        )
        WHERE rk <= 3
    """


ORACLE["knn_within_buckets"] = _knn_oracle()


# ---------------------------------------------------------------------------
# third wave: multi-probe ANN + recall@k gate
# ---------------------------------------------------------------------------

N_FLIP = 2  # probe 2**N_FLIP buckets per query

# Plane count for the RECALL-GATED ANN path, distinct from the 16-plane
# signature used for bucketing demos: the synthetic embeddings are
# isotropic (measured: same-label mean cosine 0.006 ≈ global mean 0.012,
# max cosine to vec 0 only 0.37), so ANN recall on this data is bounded by
# the candidate fraction — with 16 planes buckets are singletons and even
# multi-probe recall is ~0. 4 planes → 16 buckets, 4 probes = 1/4 of the
# space: measured recall@10 = 0.4 vs single-probe 0.0 at sf0.01. On real
# clustered embeddings the same machinery runs with far more planes and a
# tiny candidate fraction; the constant is the tuning knob.
ANN_PLANES = 4


def srp_ann_multiprobe_vec0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe ANN: cosine top-k over the query's SRP bucket PLUS the
    buckets across its 2 lowest-margin hyperplanes (Lv et al., VLDB'07).

    Fixes single-probe's unbounded recall loss (a true neighbor one
    low-margin plane away is invisible) at 4× the candidate cost — still
    ∝ bucket size, never n². The probe set is computed as JVM expression
    logic on the 1-row query frame and broadcast; candidates stay an
    equi-join on the signature.
    """
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    return S.srp_multiprobe_topk(
        emb, QUERY_VEC_ID, n_planes=ANN_PLANES, dim=DIM, n_flip=N_FLIP, k=TOP_K
    )


def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k gate: |multi-probe ANN top-k ∩ exact top-k| / k — the
    quality metric that keeps the ANN path honest against the exact
    baseline, oracle-checked like any other query."""
    from data_platform_spark.queries._util import pround

    exact = cosine_topk_vec0(spark, sf_dir).select("vec_id")
    ann = srp_ann_multiprobe_vec0(spark, sf_dir).select(
        F.col("vec_id").alias("ann_id")
    )
    return (
        exact.join(ann, exact.vec_id == ann.ann_id)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            F.lit(TOP_K).cast("long").alias("k"),
            F.col("n_hits"),
            pround(F.col("n_hits") / F.lit(float(TOP_K)), 4).alias("recall"),
        )
    )


QUERIES.update(
    {
        "srp_ann_multiprobe_vec0": srp_ann_multiprobe_vec0,
        "ann_recall_at_k": ann_recall_at_k,
    }
)


def _multiprobe_oracle() -> str:
    srp_bits = " + ".join(
        f"(CASE WHEN {_srp_proj_sql(p)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(ANN_PLANES)
    )
    # per-plane quantized projection of the query vector, plane index as a
    # variable (pl.p) — same weight formula and quantum as _srp_proj_sql
    proj_var = (
        "(SELECT sum(q.qv[i]::DOUBLE * "
        "((((i * 2654435761 + (pl.p + 1) * 40503) % 1997)::DOUBLE / 1997.0) - 0.5)) "
        f"FROM generate_series(1, {DIM}) AS t(i))"
    )
    proj_rounded = sql_round(proj_var, S.SRP_QUANTUM_DP)
    return f"""
        WITH q AS (
            SELECT embedding AS qv FROM embeddings
            WHERE vec_id = {QUERY_VEC_ID}
        ),
        qproj AS (
            SELECT pl.p, {proj_rounded} AS proj
            FROM q, generate_series(0, {ANN_PLANES - 1}) AS pl(p)
        ),
        qb AS (
            SELECT CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
                        AS INTEGER) AS bucket
            FROM qproj
        ),
        fl AS (
            SELECT p,
                   row_number() OVER (ORDER BY abs(proj) ASC, p ASC) AS rk
            FROM qproj
        ),
        masks AS (
            SELECT
                (SELECT ((1::BIGINT << p))::INTEGER FROM fl WHERE rk = 1) AS m1,
                (SELECT ((1::BIGINT << p))::INTEGER FROM fl WHERE rk = 2) AS m2
        ),
        probes AS (
            SELECT DISTINCT probe FROM (
                SELECT xor(bucket, 0) AS probe FROM qb, masks
                UNION ALL SELECT xor(bucket, m1) FROM qb, masks
                UNION ALL SELECT xor(bucket, m2) FROM qb, masks
                UNION ALL SELECT xor(xor(bucket, m1), m2) FROM qb, masks
            )
        ),
        bucketed AS (
            SELECT vec_id, embedding, {srp_bits} AS bucket FROM embeddings
        ),
        scored AS (
            SELECT
                e.vec_id,
                {sql_round(_COSINE_SQL, 4)} AS cosine
            FROM bucketed e
            JOIN probes pr ON e.bucket = pr.probe, q
            WHERE e.vec_id <> {QUERY_VEC_ID}
        )
        SELECT vec_id, cosine FROM scored
        ORDER BY cosine DESC, vec_id ASC
        LIMIT {TOP_K}
    """


ORACLE["srp_ann_multiprobe_vec0"] = _multiprobe_oracle()

ORACLE["ann_recall_at_k"] = f"""
    WITH exact_topk AS ({ORACLE["cosine_topk_vec0"]}),
    ann_topk AS ({_multiprobe_oracle()})
    SELECT
        10::BIGINT AS k,
        CAST(count(*) AS BIGINT) AS n_hits,
        {sql_round(f"count(*) / {TOP_K}.0", 4)} AS recall
    FROM exact_topk e JOIN ann_topk a ON e.vec_id = a.vec_id
"""


# ---------------------------------------------------------------------------
# IVF ANN search end to end: probe nearest cells, exact rerank inside them
# ---------------------------------------------------------------------------

IVF_NPROBE = 2


def ivf_topk_vec0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete IVF-style ANN query: coarse-quantize the query vector to
    its ``IVF_NPROBE`` nearest centroid cells, then exact-cosine rerank
    ONLY the vectors assigned to those cells.

    The scale shape of inverted-file search: the index build (per-vector
    cell assignment) is the one big job and is reusable across queries; a
    search touches candidates ∝ nprobe/ncells of the corpus. Centroids
    and the probed cell list are broadcast (tiny); the candidate restrict
    is a left-semi join on the cell label; rerank is the same broadcast
    1-row TakeOrdered as cosine_topk_vec0.
    """
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    return S.ivf_topk(emb, QUERY_VEC_ID, nprobe=IVF_NPROBE, k=TOP_K)


QUERIES["ivf_topk_vec0"] = ivf_topk_vec0

ORACLE["ivf_topk_vec0"] = f"""
    WITH cents AS (
        SELECT
            label,
            i - 1 AS pos,
            {sql_round("avg(embedding[i]::DOUBLE)", 4)} AS centroid_val
        FROM embeddings, generate_series(1, {DIM}) AS t(i)
        GROUP BY label, i - 1
    ),
    vec_long AS (
        SELECT vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS x
        FROM embeddings, generate_series(1, {DIM}) AS t(i)
    ),
    dist AS (
        SELECT
            v.vec_id,
            c.label,
            {sql_round("sum((v.x - c.centroid_val) * (v.x - c.centroid_val))", 6)} AS dist2
        FROM vec_long v JOIN cents c ON v.pos = c.pos
        GROUP BY v.vec_id, c.label
    ),
    assign AS (
        SELECT vec_id, label FROM (
            SELECT vec_id, label,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist2 ASC, label ASC
                   ) AS rk
            FROM dist
        ) WHERE rk = 1
    ),
    qdist AS (
        SELECT label, dist2 FROM dist WHERE vec_id = {QUERY_VEC_ID}
    ),
    probe AS (
        SELECT label FROM qdist ORDER BY dist2 ASC, label ASC LIMIT {IVF_NPROBE}
    ),
    cand AS (
        SELECT vec_id FROM assign
        WHERE label IN (SELECT label FROM probe)
          AND vec_id <> {QUERY_VEC_ID}
    ),
    q AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    scored AS (
        SELECT
            e.vec_id,
            {sql_round(_COSINE_SQL, 4)} AS cosine
        FROM embeddings e, q
        WHERE e.vec_id IN (SELECT vec_id FROM cand)
    )
    SELECT vec_id, cosine FROM scored
    ORDER BY cosine DESC, vec_id ASC
    LIMIT {TOP_K}
"""


def ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF search path vs the exact baseline — same gate
    shape as ann_recall_at_k, keeping the second ANN strategy honest."""
    from data_platform_spark.queries._util import pround

    exact = cosine_topk_vec0(spark, sf_dir).select("vec_id")
    ivf = ivf_topk_vec0(spark, sf_dir).select(F.col("vec_id").alias("ivf_id"))
    return (
        exact.join(ivf, exact.vec_id == ivf.ivf_id)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            F.lit(TOP_K).cast("long").alias("k"),
            F.col("n_hits"),
            pround(F.col("n_hits") / F.lit(float(TOP_K)), 4).alias("recall"),
        )
    )


QUERIES["ivf_recall_at_k"] = ivf_recall_at_k

ORACLE["ivf_recall_at_k"] = f"""
    WITH exact_topk AS ({ORACLE["cosine_topk_vec0"]}),
    ivf_topk AS ({ORACLE["ivf_topk_vec0"]})
    SELECT
        10::BIGINT AS k,
        CAST(count(*) AS BIGINT) AS n_hits,
        {sql_round(f"count(*) / {TOP_K}.0", 4)} AS recall
    FROM exact_topk e JOIN ivf_topk a ON e.vec_id = a.vec_id
"""


# ---------------------------------------------------------------------------
# multi-table (banded) SRP ANN: the OR-construction recall path
# ---------------------------------------------------------------------------

SRP_TABLES = 4  # OR-construction width (L independent plane families)


def srp_banded_ann_vec0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table SRP ANN: candidate iff the vector shares the query's
    bucket in ANY of ``SRP_TABLES`` independent 4-plane families — the
    exponential-recall OR-construction a single table (however probed)
    cannot provide (PLANS.md round-5 operating-point table). One scan
    computes all table signatures; the query's buckets ride a broadcast
    1-row frame; rerank is exact cosine."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    return S.srp_banded_topk(
        emb,
        QUERY_VEC_ID,
        n_tables=SRP_TABLES,
        n_planes=ANN_PLANES,
        dim=DIM,
        k=TOP_K,
    )


QUERIES["srp_banded_ann_vec0"] = srp_banded_ann_vec0


def _banded_oracle() -> str:
    b_exprs = ",\n                ".join(
        f"{_srp_bucket_sql(ANN_PLANES, t * ANN_PLANES)} AS b{t}"
        for t in range(SRP_TABLES)
    )
    q_exprs = ",\n                ".join(
        f"{_srp_bucket_sql(ANN_PLANES, t * ANN_PLANES, 'qv')} AS q{t}"
        for t in range(SRP_TABLES)
    )
    match = " OR ".join(f"e.b{t} = qb.q{t}" for t in range(SRP_TABLES))
    return f"""
        WITH q AS (
            SELECT embedding AS qv FROM embeddings
            WHERE vec_id = {QUERY_VEC_ID}
        ),
        qb AS (
            SELECT {q_exprs} FROM q
        ),
        bucketed AS (
            SELECT vec_id, embedding, {b_exprs} FROM embeddings
        ),
        scored AS (
            SELECT e.vec_id, {sql_round(_COSINE_SQL, 4)} AS cosine
            FROM bucketed e, qb, q
            WHERE ({match}) AND e.vec_id <> {QUERY_VEC_ID}
        )
        SELECT vec_id, cosine FROM scored
        ORDER BY cosine DESC, vec_id ASC
        LIMIT {TOP_K}
    """


ORACLE["srp_banded_ann_vec0"] = _banded_oracle()


# ---------------------------------------------------------------------------
# unsupervised IVF build: k-means coarse quantizer
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITER = 2


def kmeans_cell_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised IVF index build under the gate: Lloyd's k-means
    (deterministic smallest-id seeds, 2 fixed update rounds) over the
    embeddings, profiled as final cell sizes + mean within-cell squared
    distance. The oracle unrolls the identical iterations in SQL — every
    seed choice, quantized distance, tie-break and mean must agree for
    the hash to match."""
    from data_platform_spark.queries._util import pround

    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    _cents, assign = S.kmeans_fit(
        emb, k=KMEANS_K, n_iter=KMEANS_ITER
    )
    return assign.groupBy(F.col("assigned_label").alias("cell")).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        pround(F.avg("dist2"), 4).alias("avg_dist2"),
    )


QUERIES["kmeans_cell_profile"] = kmeans_cell_profile


def _kmeans_ctes(
    k: int,
    n_iter: int,
    k_sql: str | None = None,
    src: str = "embeddings",
    prefix: str = "",
) -> tuple[str, str, str]:
    """CTE block deriving the k-means index in SQL; returns
    (cte_sql, final_assign_name, final_cents_name). ``k_sql`` (a scalar
    SELECT) makes the seed count DATA-DEPENDENT — the n_cells ∝ corpus
    posture semantic_dedup_cells registers (VERDICT r10 item 2), where
    a literal ``k`` cannot be baked into the oracle string. ``src`` is
    the (vec_id, embedding) relation to cluster — another CTE works,
    which is how the coarse-over-coarse build of
    kmeans_two_level_assign_profile re-clusters the CENTROID set; pass
    a distinct ``prefix`` then so both unrolls' CTE names coexist in
    one WITH block."""
    p = prefix
    dist_expr = sql_round(
        "sum((v.x - c.centroid_val) * (v.x - c.centroid_val))", 6
    )

    def round_ctes(i: int, cents: str) -> str:
        return f"""
        {p}dist{i} AS (
            SELECT v.vec_id, c.label, {dist_expr} AS dist2
            FROM {p}vec_long v JOIN {cents} c ON v.pos = c.pos
            GROUP BY v.vec_id, c.label
        ),
        {p}ranked{i} AS (
            SELECT vec_id, label, dist2,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist2 ASC, label ASC
                   ) AS rk
            FROM {p}dist{i}
        ),
        {p}assign{i} AS (
            SELECT vec_id, label, dist2 FROM {p}ranked{i} WHERE rk = 1
        )"""

    seed_bound = (
        f"QUALIFY row_number() OVER (ORDER BY vec_id) <= ({k_sql})"
        if k_sql is not None
        else f"ORDER BY vec_id LIMIT {k}"
    )
    ctes = [
        f"""{p}seeds AS (
            SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS label,
                   embedding
            FROM {src} {seed_bound}
        ),
        {p}vec_long AS (
            SELECT vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS x
            FROM {src}, generate_series(1, {DIM}) AS t(i)
        ),
        {p}cents0 AS (
            SELECT label, i - 1 AS pos,
                   {sql_round("embedding[i]::DOUBLE", 4)} AS centroid_val
            FROM {p}seeds, generate_series(1, {DIM}) AS t(i)
        )"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(round_ctes(i, f"{p}cents{i - 1}"))
        ctes.append(
            f"""{p}cents{i} AS (
            SELECT a.label, v.pos,
                   {sql_round("avg(v.x)", 4)} AS centroid_val
            FROM {p}assign{i} a JOIN {p}vec_long v USING (vec_id)
            GROUP BY a.label, v.pos
        )"""
        )
    final = n_iter + 1
    ctes.append(round_ctes(final, f"{p}cents{n_iter}"))
    return ",\n".join(ctes), f"{p}assign{final}", f"{p}cents{n_iter}"


def _kmeans_oracle(k: int, n_iter: int) -> str:
    ctes, final_assign, _cents = _kmeans_ctes(k, n_iter)
    return f"""
        WITH {ctes}
        SELECT label AS cell,
               count(*) AS n_vectors,
               {sql_round("avg(dist2)", 4)} AS avg_dist2
        FROM {final_assign}
        GROUP BY label
    """


ORACLE["kmeans_cell_profile"] = _kmeans_oracle(KMEANS_K, KMEANS_ITER)


def kmeans_ivf_topk_vec0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end UNSUPERVISED ANN: k-means index build (kmeans_fit) +
    IVF search over the learned cells (ivf_topk_with_index) — the
    complete build-once/search-many shape with no label dependence. The
    oracle re-derives the entire index (seeds, 2 Lloyd rounds, final
    assignment), probes the query's nearest learned cells and reranks by
    exact cosine."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    cents, assign = S.kmeans_fit(emb, k=KMEANS_K, n_iter=KMEANS_ITER)
    return S.ivf_topk_with_index(
        emb, cents, assign, QUERY_VEC_ID, nprobe=IVF_NPROBE, k=TOP_K
    )


QUERIES["kmeans_ivf_topk_vec0"] = kmeans_ivf_topk_vec0


def _kmeans_ivf_oracle() -> str:
    ctes, final_assign, final_cents = _kmeans_ctes(KMEANS_K, KMEANS_ITER)
    qdist_expr = sql_round(
        "sum((ql.x - c.centroid_val) * (ql.x - c.centroid_val))", 6
    )
    return f"""
        WITH {ctes},
        q AS (
            SELECT embedding AS qv FROM embeddings
            WHERE vec_id = {QUERY_VEC_ID}
        ),
        q_long AS (
            SELECT i - 1 AS pos, qv[i]::DOUBLE AS x
            FROM q, generate_series(1, {DIM}) AS t(i)
        ),
        qdist AS (
            SELECT c.label, {qdist_expr} AS dist2
            FROM q_long ql JOIN {final_cents} c ON ql.pos = c.pos
            GROUP BY c.label
        ),
        probe AS (
            SELECT label FROM qdist
            ORDER BY dist2 ASC, label ASC LIMIT {IVF_NPROBE}
        ),
        cand AS (
            SELECT a.vec_id FROM {final_assign} a
            JOIN probe p ON a.label = p.label
            WHERE a.vec_id <> {QUERY_VEC_ID}
        ),
        scored AS (
            SELECT e.vec_id, {sql_round(_COSINE_SQL, 4)} AS cosine
            FROM embeddings e JOIN cand USING (vec_id), q
        )
        SELECT vec_id, cosine FROM scored
        ORDER BY cosine DESC, vec_id ASC
        LIMIT {TOP_K}
    """


ORACLE["kmeans_ivf_topk_vec0"] = _kmeans_ivf_oracle()


TWO_LEVEL_COARSE_K = 3  # ceil(sqrt(KMEANS_K)) — the coarse-over-coarse split


def kmeans_two_level_assign_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-level (coarse-over-coarse) centroid assignment under the gate
    (VERDICT r11 item 1): kmeans_fit builds the k=KMEANS_K quantizer,
    then ivf_assign_two_level re-assigns every vector WITHOUT ever
    broadcasting the full centroid set — a ceil(sqrt(k))-cell coarse
    quantizer trained over the CENTROIDS routes each vector to its
    nearest live coarse cell, and the exact argmin runs only inside that
    cell via an equi-join. Per final two-level cell: vector count, mean
    4-dp assigned distance, and ``n_disagree`` — vectors whose two-level
    cell differs from the flat-assign cell (the nprobe=1 routing error,
    REPORTED not assumed; at full coarse probe the two are bit-identical,
    pinned in tests/test_ann_recall.py).

    The oracle re-derives the ENTIRE construction in SQL: the outer
    k-means unroll (seeds, both Lloyd rounds, flat final assignment),
    the centroid pivot, the coarse k-means unroll OVER THE CENTROID
    RELATION (the prefixed second _kmeans_ctes instance), live-cell
    routing, and the within-cell argmin with the same 6-dp quantization
    and (dist2, label) tie-break — so every distance, seed choice and
    tie-break of the scale path must agree bit-for-bit for the hash to
    match.

    Scale shape: coarse training is k-scale work (sqrt(k) cells over k
    centroids); the only broadcasts are the sqrt(k)·d coarse centroids
    and the live-cell id list; the n·(k/sqrt(k))·d inner distance join
    is an equi-join on the coarse cell — a shuffle join that survives
    k ∝ corpus, where flat assignment's k·d broadcast dies
    (plan-asserted in tests/test_plans.py)."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    cents, flat = S.kmeans_fit(emb, k=KMEANS_K, n_iter=KMEANS_ITER)
    two = S.ivf_assign_two_level(
        emb,
        cents,
        coarse_k=TWO_LEVEL_COARSE_K,
        n_iter=KMEANS_ITER,
        coarse_nprobe=1,
    )
    joined = two.alias("t").join(
        flat.alias("f").select(
            "vec_id", F.col("assigned_label").alias("flat_label")
        ),
        "vec_id",
    )
    return joined.groupBy(
        F.col("t.assigned_label").alias("cell")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        pround(F.avg("t.dist2"), 4).alias("avg_dist2"),
        F.sum(
            F.when(
                F.col("t.assigned_label") != F.col("flat_label"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_disagree"),
    )


QUERIES["kmeans_two_level_assign_profile"] = kmeans_two_level_assign_profile


def _two_level_oracle(nprobe: int = 1) -> str:
    ctes_o, flat_assign, final_cents = _kmeans_ctes(KMEANS_K, KMEANS_ITER)
    ctes_c, coarse_assign, coarse_cents = _kmeans_ctes(
        TWO_LEVEL_COARSE_K, KMEANS_ITER, src="cent_wide", prefix="c_"
    )
    d6 = sql_round(
        "sum((v.x - c.centroid_val) * (v.x - c.centroid_val))", 6
    )
    return f"""
        WITH {ctes_o},
        cent_wide AS (
            SELECT label::BIGINT AS vec_id,
                   list(centroid_val ORDER BY pos) AS embedding
            FROM {final_cents} GROUP BY label
        ),
        {ctes_c},
        live AS (SELECT DISTINCT label FROM {coarse_assign}),
        coarse_live AS (
            SELECT * FROM {coarse_cents}
            WHERE label IN (SELECT label FROM live)
        ),
        cdist AS (
            SELECT v.vec_id, c.label, {d6} AS cdist2
            FROM vec_long v JOIN coarse_live c ON v.pos = c.pos
            GROUP BY v.vec_id, c.label
        ),
        vc AS (
            SELECT vec_id, label AS coarse FROM (
                SELECT vec_id, label,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY cdist2 ASC, label ASC
                       ) AS crk
                FROM cdist
            ) WHERE crk <= {nprobe}
        ),
        cents_c AS (
            SELECT a.label AS coarse, f.label, f.pos, f.centroid_val
            FROM {final_cents} f
            JOIN {coarse_assign} a ON a.vec_id = f.label
        ),
        tl_dist AS (
            SELECT v.vec_id, c.label, {d6} AS dist2
            FROM vec_long v
            JOIN vc ON vc.vec_id = v.vec_id
            JOIN cents_c c ON c.coarse = vc.coarse AND c.pos = v.pos
            GROUP BY v.vec_id, c.label
        ),
        tl AS (
            SELECT vec_id, label, dist2 FROM (
                SELECT vec_id, label, dist2,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY dist2 ASC, label ASC
                       ) AS rk
                FROM tl_dist
            ) WHERE rk = 1
        )
        SELECT t.label AS cell,
               count(*)::BIGINT AS n_vectors,
               {sql_round("avg(t.dist2)", 4)} AS avg_dist2,
               sum(CASE WHEN t.label <> fa.label THEN 1 ELSE 0 END)::BIGINT
                   AS n_disagree
        FROM tl t JOIN {flat_assign} fa USING (vec_id)
        GROUP BY t.label
    """


ORACLE["kmeans_two_level_assign_profile"] = _two_level_oracle()


def kmeans_two_level_multiprobe_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The two-level assignment at the PRODUCTION operating point —
    coarse_nprobe=2, the r13 measured default (PLANS.md multiprobe
    sweep; VERDICT r12 item 7) — under the oracle gate: same
    construction as kmeans_two_level_assign_profile (outer k-means,
    coarse-over-coarse quantizer on the pivoted centroids, live-cell
    routing, within-candidate argmin) but each vector probes its TWO
    nearest live coarse cells before the exact argmin, so the
    ``n_disagree`` column reports the residual routing error AT the
    default the scale path actually runs (monotonically ≤ the nprobe=1
    profile's). The oracle is the same full unroll with the probe rank
    bound at 2 — every distance, seed, tie-break and the widened
    candidate union must agree bit-for-bit.

    Registered BELOW the frozen r13 window with local deep-compare
    evidence at both gate SFs (the semantic_dedup_survivors precedent)
    — first in line for an r14 slot."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    cents, flat = S.kmeans_fit(emb, k=KMEANS_K, n_iter=KMEANS_ITER)
    two = S.ivf_assign_two_level(
        emb,
        cents,
        coarse_k=TWO_LEVEL_COARSE_K,
        n_iter=KMEANS_ITER,
        coarse_nprobe=2,
    )
    joined = two.alias("t").join(
        flat.alias("f").select(
            "vec_id", F.col("assigned_label").alias("flat_label")
        ),
        "vec_id",
    )
    return joined.groupBy(
        F.col("t.assigned_label").alias("cell")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        pround(F.avg("t.dist2"), 4).alias("avg_dist2"),
        F.sum(
            F.when(
                F.col("t.assigned_label") != F.col("flat_label"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_disagree"),
    )


QUERIES["kmeans_two_level_multiprobe_profile"] = (
    kmeans_two_level_multiprobe_profile
)
ORACLE["kmeans_two_level_multiprobe_profile"] = _two_level_oracle(nprobe=2)


# ---------------------------------------------------------------------------
# round 6: product quantization — the embedding-COMPRESSION scale path
# ---------------------------------------------------------------------------

PQ_M = 4                 # subspaces
PQ_SUB = DIM // PQ_M     # dims per subspace
PQ_K = 8                 # codewords per subspace -> 3 bits/subspace


def _pq_dist_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance table over the embeddings table — thin wrapper over
    functions.similarity.pq_dist_table (deterministic smallest-id seed
    codebooks, micro-unit LONG distances; see its docstring)."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    return S.pq_dist_table(emb, PQ_M, PQ_K, DIM)


def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding diagnostics: vectors per (subspace, codeword) — the
    codebook-utilization histogram that tells you whether the index
    compresses uniformly. Encode = per-(vector, subspace) argmin over the
    distance table (window over PQ_K rows, deterministic tie-break)."""
    codes = S.pq_encode(_pq_dist_table(spark, sf_dir))
    return codes.groupBy("m", "code").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


def pq_adc_topk_vec0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN search with asymmetric distance computation (ADC): every
    vector is represented by PQ_M codeword ids (3 bits each here — a
    ~170x compression of the float64 vector), and the query's distance
    to ANY vector is a table lookup per subspace plus an integer sum.

    This is how 100 TB of embeddings fit an ANN index: the distance
    table (query x all codewords, PQ_M*PQ_K rows) is computed ONCE and
    broadcast; the scan side touches only the code columns. Exact
    integer micro-unit arithmetic end to end — the ADC sum is a LONG
    sum over PQ_M rows per vector."""
    dist = _pq_dist_table(spark, sf_dir)
    return S.pq_adc_shortlist(dist, QUERY_VEC_ID, TOP_K)


def pq_rerank_topk_vec0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ search (the IVFPQ refine step): ADC shortlist of 50
    candidates in the compressed domain, then EXACT L2 rerank of only
    the shortlist — full-precision vectors are fetched for a
    constant-size candidate set via a semi-join on the id. Recall gate
    on planted clusters lives in tests/test_ann_recall.py."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    return S.pq_rerank_topk(
        emb, QUERY_VEC_ID, k=TOP_K, shortlist=50,
        n_sub=PQ_M, n_codes=PQ_K, dim=DIM,
    )


QUERIES.update(
    {
        "pq_code_histogram": pq_code_histogram,
        "pq_adc_topk_vec0": pq_adc_topk_vec0,
        "pq_rerank_topk_vec0": pq_rerank_topk_vec0,
    }
)


PQ_ITER = 2


def _pq_ctes() -> str:
    """CTE block re-deriving the TRAINED PQ index in SQL: seeds, per-
    subspace Lloyd rounds (PQ_ITER, 4-dp centroid quantization, micro-
    unit LONG distances), final distance table + codes — every seed
    choice, assignment tie-break and mean must agree with the engine for
    the hash to match (same unroll style as the kmeans oracle)."""

    def dist_cte(name: str, cents: str) -> str:
        return f"""
        {name} AS (
            SELECT
                v.vec_id, v.m, c.code,
                CAST(floor(sum((v.x - c.cb_val) * (v.x - c.cb_val))
                           * 1000000 + 0.5) AS BIGINT) AS dist2_micro
            FROM vec_long v JOIN {cents} c ON v.pos = c.pos
            GROUP BY v.vec_id, v.m, c.code
        )"""

    def assign_cte(i: int) -> str:
        return f"""
        assign{i} AS (
            SELECT vec_id, m, code FROM (
                SELECT vec_id, m, code,
                       row_number() OVER (
                           PARTITION BY vec_id, m
                           ORDER BY dist2_micro ASC, code ASC
                       ) AS rk
                FROM dist{i}
            ) WHERE rk = 1
        )"""

    ctes = [
        f"""seeds AS (
            SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
            FROM embeddings ORDER BY vec_id LIMIT {PQ_K}
        ),
        vec_long AS (
            SELECT vec_id, i - 1 AS pos,
                   CAST((i - 1) // {PQ_SUB} AS INT) AS m,
                   embedding[i]::DOUBLE AS x
            FROM embeddings, generate_series(1, {DIM}) AS t(i)
        ),
        cents0 AS (
            SELECT s.code, v.pos, {sql_round("v.x", 4)} AS cb_val
            FROM vec_long v JOIN seeds s USING (vec_id)
        )"""
    ]
    for i in range(1, PQ_ITER + 1):
        ctes.append(dist_cte(f"dist{i}", f"cents{i - 1}"))
        ctes.append(assign_cte(i))
        ctes.append(
            f"""cents{i} AS (
            SELECT a.code, v.pos, {sql_round("avg(v.x)", 4)} AS cb_val
            FROM assign{i} a
            JOIN vec_long v ON a.vec_id = v.vec_id AND a.m = v.m
            GROUP BY a.code, v.pos
        )"""
        )
    ctes.append(dist_cte("dist", f"cents{PQ_ITER}"))
    ctes.append(
        """codes AS (
            SELECT vec_id, m, code FROM (
                SELECT vec_id, m, code,
                       row_number() OVER (
                           PARTITION BY vec_id, m
                           ORDER BY dist2_micro ASC, code ASC
                       ) AS rk
                FROM dist
            ) WHERE rk = 1
        )"""
    )
    return ",\n".join(ctes)


ORACLE["pq_code_histogram"] = f"""
    WITH {_pq_ctes()}
    SELECT m, code, count(*) AS n_vectors
    FROM codes
    GROUP BY m, code
"""

ORACLE["pq_adc_topk_vec0"] = f"""
    WITH {_pq_ctes()},
    qtab AS (
        SELECT m, code, dist2_micro AS q_dist2_micro
        FROM dist WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT c.vec_id, sum(q.q_dist2_micro)::BIGINT AS adc_micro
    FROM codes c
    JOIN qtab q USING (m, code)
    WHERE c.vec_id <> {QUERY_VEC_ID}
    GROUP BY c.vec_id
    ORDER BY adc_micro ASC, vec_id ASC
    LIMIT {TOP_K}
"""


ORACLE["pq_rerank_topk_vec0"] = f"""
    WITH {_pq_ctes()},
    qtab AS (
        SELECT m, code, dist2_micro AS q_dist2_micro
        FROM dist WHERE vec_id = {QUERY_VEC_ID}
    ),
    short AS (
        SELECT c.vec_id
        FROM codes c
        JOIN qtab q USING (m, code)
        WHERE c.vec_id <> {QUERY_VEC_ID}
        GROUP BY c.vec_id
        ORDER BY sum(q.q_dist2_micro) ASC, c.vec_id ASC
        LIMIT 50
    ),
    qvec AS (
        SELECT pos, x AS qx FROM vec_long WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT
        v.vec_id,
        CAST(floor(sum((v.x - q.qx) * (v.x - q.qx)) * 1000000 + 0.5)
             AS BIGINT) AS d2_micro
    FROM vec_long v
    JOIN short USING (vec_id)
    JOIN qvec q USING (pos)
    GROUP BY v.vec_id
    ORDER BY d2_micro ASC, vec_id ASC
    LIMIT {TOP_K}
"""


def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-side drift monitor: per label, the L2 distance between the
    class centroid computed from the even-vec_id half and from the odd
    half (the stand-in for yesterday's vs today's embedding batch) —
    the companion to corpus_vocab_drift for the vector modality. An
    embedding-model version bump or an upstream feature change moves
    these centroids; monitoring catches it before ANN recall quietly
    degrades.

    One posexplode + groupBy(label, pos, half) with map-side combine
    (centroids quantize to 4 dp, the label_centroids discipline), a
    self-join of two metadata-scale centroid relations, and a per-label
    sum of squared deltas in micro-units — order-independent LONGs."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    half = (F.col("vec_id") % 2 == 0).alias("is_a")
    cents = (
        emb.select("label", half, F.posexplode(
            S.as_double(F.col("embedding"))
        ).alias("pos", "x"))
        .groupBy("label", "is_a", "pos")
        .agg(pround(F.avg("x"), 4).alias("c"))
    )
    a = cents.filter(F.col("is_a")).select(
        "label", "pos", F.col("c").alias("c_a")
    )
    b = cents.filter(~F.col("is_a")).select(
        "label", "pos", F.col("c").alias("c_b")
    )
    terms = a.join(b, ["label", "pos"]).select(
        "label",
        F.floor(
            (F.col("c_a") - F.col("c_b")) * (F.col("c_a") - F.col("c_b"))
            * 1_000_000 + F.lit(0.5)
        ).cast("long").alias("d2_micro"),
    )
    counts = emb.groupBy("label").agg(
        F.sum(half.cast("int")).alias("n_a"),
        F.sum((~(F.col("vec_id") % 2 == 0)).cast("int")).alias("n_b"),
    )
    return (
        terms.groupBy("label")
        .agg(F.sum("d2_micro").alias("drift2_micro"))
        .join(counts, "label")
        .select(
            "label",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "drift2_micro",
        )
    )


QUERIES["embedding_centroid_drift"] = embedding_centroid_drift

ORACLE["embedding_centroid_drift"] = f"""
    WITH cents AS (
        SELECT label, vec_id % 2 = 0 AS is_a, i - 1 AS pos,
               {sql_round("avg(embedding[i]::DOUBLE)", 4)} AS c
        FROM embeddings, generate_series(1, {DIM}) AS t(i)
        GROUP BY label, is_a, pos
    ),
    terms AS (
        SELECT a.label,
               CAST(floor((a.c - b.c) * (a.c - b.c) * 1000000 + 0.5)
                    AS BIGINT) AS d2_micro
        FROM (SELECT * FROM cents WHERE is_a) a
        JOIN (SELECT * FROM cents WHERE NOT is_a) b
          ON a.label = b.label AND a.pos = b.pos
    ),
    counts AS (
        SELECT label,
               sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
               sum(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END)::BIGINT AS n_b
        FROM embeddings GROUP BY label
    )
    SELECT t.label, c.n_a, c.n_b, sum(t.d2_micro)::BIGINT AS drift2_micro
    FROM terms t JOIN counts c USING (label)
    GROUP BY t.label, c.n_a, c.n_b
"""


def pq_subspace_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace quantization distortion: mean and max of each
    vector's min-over-codewords squared distance (micro-units) — the
    ORACLED form of the drift signal ops/ann_index.rebuild_if_drifted
    gates on (its params-sidecar baseline is the all-subspace mean of
    exactly this quantity). A subspace whose mean distortion runs away
    from the others has a stale or undersized codebook; watching the
    per-m split localizes WHICH dimensions drifted. One narrow
    aggregate over the distance relation."""
    dist = _pq_dist_table(spark, sf_dir)
    per_cell = dist.groupBy("vec_id", "m").agg(
        F.min("dist2_micro").alias("d")
    )
    return per_cell.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.floor(F.avg("d") + F.lit(0.5)).cast("long").alias(
            "mean_distortion_micro"
        ),
        F.max("d").alias("max_distortion_micro"),
    )


QUERIES["pq_subspace_distortion"] = pq_subspace_distortion

ORACLE["pq_subspace_distortion"] = f"""
    WITH {_pq_ctes()},
    per_cell AS (
        SELECT vec_id, m, min(dist2_micro) AS d
        FROM dist GROUP BY vec_id, m
    )
    SELECT m,
           count(*)::BIGINT AS n_vectors,
           CAST(floor(avg(d) + 0.5) AS BIGINT) AS mean_distortion_micro,
           max(d)::BIGINT AS max_distortion_micro
    FROM per_cell
    GROUP BY m
"""


def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding L2-norm audit — the vector-quality screen an
    embedding pipeline runs before indexing: collapsed (near-zero-norm)
    vectors poison cosine similarity, and a label whose norm
    distribution shifts signals an encoder change. Reports, per label,
    the count, near-zero count, exact mean norm, and exact p50/p95 norm
    quantiles.

    Determinism + scale shape: each vector's norm fixes to integer
    MICRO-units (one sqrt + one floor per row), so the mean is an exact
    LONG sum over any partitioning; the per-label quantiles run through
    the grouped two-phase layout (ops.global_order.grouped_percentile —
    a label holding half the corpus never buffers in one aggregator,
    the r8 percentile discipline)."""
    from data_platform_spark.ops.global_order import grouped_percentile

    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    scored = scoped_persist(
        emb.select(
            "label",
            F.floor(
                S.l2_norm(S.as_double(F.col("embedding"))) * 1_000_000
                + F.lit(0.5)
            ).cast("long").alias("norm_micro"),
        )
    )
    base = scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(
            F.when(F.col("norm_micro") < 1_000, 1).otherwise(0)
        ).cast("long").alias("n_near_zero"),
        F.sum("norm_micro").cast("long").alias("sum_norm_micro"),
    )
    pct = grouped_percentile(
        scored, ["label"], "norm_micro", {"p50": 0.5, "p95": 0.95}
    )
    return base.join(pct, on="label", how="left").select(
        "label",
        "n_vectors",
        "n_near_zero",
        pround(F.col("sum_norm_micro") / F.col("n_vectors") / 1_000_000, 6)
        .alias("mean_norm"),
        pround(F.col("p50") / 1_000_000, 6).alias("p50_norm"),
        pround(F.col("p95") / 1_000_000, 6).alias("p95_norm"),
    )


QUERIES["embedding_norm_audit"] = embedding_norm_audit

ORACLE["embedding_norm_audit"] = f"""
    WITH scored AS (
        SELECT label,
               CAST(floor(
                   sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[]))
                   * 1000000 + 0.5) AS BIGINT) AS norm_micro
        FROM embeddings
    )
    SELECT label,
           count(*)::BIGINT AS n_vectors,
           sum(CASE WHEN norm_micro < 1000 THEN 1 ELSE 0 END)::BIGINT
               AS n_near_zero,
           {sql_round(
               "sum(norm_micro) * 1.0 / count(*) / 1000000", 6
           )} AS mean_norm,
           {sql_round("quantile_cont(norm_micro, 0.5) / 1000000", 6)}
               AS p50_norm,
           {sql_round("quantile_cont(norm_micro, 0.95) / 1000000", 6)}
               AS p95_norm
    FROM scored
    GROUP BY label
"""


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health table: exact mean, variance, min
    and max of every coordinate across the corpus plus a dead-dimension
    flag — the encoder-regression screen an indexing pipeline runs
    before (re)building ANN structures: a dimension whose variance
    collapses to ~0 carries no signal but still costs distance math,
    and a mean drifting off 0 breaks inner-product shortcuts.

    Determinism: every coordinate fixes to integer MICRO-units (one
    floor per value); sums and squared sums are exact LONG folds
    (order-independent; a squared micro-unit is ≤1e12, so ~1e6 vectors
    fit LONG headroom — at billions of rows drop to 1e3 units), with
    the mean/variance derived by one fixed double expression at the
    end (6 dp). Scale shape: one posexplode and one bounded-domain
    (dim) aggregate with map-side partials — a single shuffle keyed by
    the embedding width."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    vm = F.floor(
        F.col("v").cast("double") * 1_000_000 + F.lit(0.5)
    ).cast("long")
    coords = emb.select(
        F.posexplode(F.col("embedding")).alias("dim", "v")
    ).select("dim", vm.alias("v_micro"))
    agg = coords.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_micro").alias("sum_micro"),
        F.sum(F.col("v_micro") * F.col("v_micro")).alias("ssq_micro"),
        F.min("v_micro").alias("min_micro"),
        F.max("v_micro").alias("max_micro"),
    )
    mean = F.col("sum_micro") / F.lit(1_000_000.0) / F.col("n")
    var = (
        F.col("ssq_micro") / F.lit(1e12) / F.col("n") - mean * mean
    )
    return agg.select(
        "dim",
        "n",
        pround(mean, 6).alias("mean"),
        pround(var, 6).alias("variance"),
        (F.col("min_micro") / F.lit(1_000_000.0)).alias("min_v"),
        (F.col("max_micro") / F.lit(1_000_000.0)).alias("max_v"),
        (var < F.lit(1e-6)).alias("is_dead"),
    )


QUERIES["embedding_dim_stats"] = embedding_dim_stats

ORACLE["embedding_dim_stats"] = f"""
    WITH coords AS (
        SELECT t.i - 1 AS dim,
               CAST(floor(embedding[t.i]::DOUBLE * 1000000 + 0.5)
                    AS BIGINT) AS v_micro
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    agg AS (
        SELECT dim,
               count(*)::BIGINT AS n,
               sum(v_micro)::BIGINT AS sum_micro,
               sum(v_micro * v_micro)::BIGINT AS ssq_micro,
               min(v_micro)::BIGINT AS min_micro,
               max(v_micro)::BIGINT AS max_micro
        FROM coords GROUP BY dim
    )
    SELECT dim, n,
           {sql_round("sum_micro / 1000000.0 / n", 6)} AS mean,
           {sql_round(
               "ssq_micro / 1e12 / n"
               " - (sum_micro / 1000000.0 / n)"
               " * (sum_micro / 1000000.0 / n)", 6
           )} AS variance,
           min_micro / 1000000.0 AS min_v,
           max_micro / 1000000.0 AS max_v,
           (ssq_micro / 1e12 / n
            - (sum_micro / 1000000.0 / n)
            * (sum_micro / 1000000.0 / n)) < 1e-6 AS is_dead
    FROM agg
"""


def label_embedding_separation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster-separability audit per label: mean distance of a label's
    vectors to their own centroid (within-spread) vs the distance to
    the NEAREST other centroid, and their ratio — the silhouette-style
    health check an embedding pipeline runs before trusting labels as
    IVF cells or stratification keys (ratio ≤ 1 means the label bleeds
    into a neighbor and cell-pruned search will miss).

    Determinism: centroids reuse label_centroids' 4-dp long layout;
    every squared per-dimension difference fixes to integer NANO-units
    before any sum (order-independent LONG folds for both the
    per-vector distance and the bounded |labels|²·dims centroid-pair
    table); each sqrt/division happens once per reduced row. Scale
    shape: one posexplode keyed join vector→centroid on (label, pos),
    one per-vector aggregate, one per-label rollup; the centroid
    self-join lives in the bounded label-domain and broadcasts."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    cents = S.label_centroids(emb)
    coords = emb.select(
        "vec_id",
        "label",
        F.posexplode(S.as_double(F.col("embedding"))).alias("pos", "x"),
    )
    d2_nano = F.floor(
        (F.col("x") - F.col("centroid_val"))
        * (F.col("x") - F.col("centroid_val"))
        * 1_000_000_000
        + F.lit(0.5)
    ).cast("long")
    per_vec = (
        coords.join(cents, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(d2_nano).alias("d2_sum_nano"))
        .select(
            "label",
            F.floor(
                F.sqrt(F.col("d2_sum_nano") / F.lit(1e9)) * 1_000_000
                + F.lit(0.5)
            ).cast("long").alias("dist_micro"),
        )
    )
    within = per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("dist_micro").alias("sum_dist_micro"),
    )
    a = cents.select(
        F.col("label").alias("label"),
        "pos",
        F.col("centroid_val").alias("ca"),
    )
    b = cents.select(
        F.col("label").alias("label_b"),
        "pos",
        F.col("centroid_val").alias("cb"),
    )
    cd2_nano = F.floor(
        (F.col("ca") - F.col("cb"))
        * (F.col("ca") - F.col("cb"))
        * 1_000_000_000
        + F.lit(0.5)
    ).cast("long")
    cdist = (
        a.join(F.broadcast(b), "pos")
        .filter(F.col("label") != F.col("label_b"))
        .groupBy("label", "label_b")
        .agg(F.sum(cd2_nano).alias("cd2_sum_nano"))
        .select(
            "label",
            "label_b",
            F.floor(
                F.sqrt(F.col("cd2_sum_nano") / F.lit(1e9)) * 1_000_000
                + F.lit(0.5)
            ).cast("long").alias("cdist_micro"),
        )
    )
    nearest = cdist.groupBy("label").agg(
        F.min(F.struct("cdist_micro", "label_b")).alias("nn")
    ).select(
        "label",
        F.col("nn.label_b").alias("nearest_label"),
        F.col("nn.cdist_micro").alias("nearest_micro"),
    )
    mean_within = F.col("sum_dist_micro") / F.col("n_vectors") / 1_000_000.0
    return within.join(F.broadcast(nearest), "label").select(
        "label",
        "n_vectors",
        pround(mean_within, 6).alias("mean_within_dist"),
        "nearest_label",
        pround(F.col("nearest_micro") / 1_000_000.0, 6).alias(
            "nearest_centroid_dist"
        ),
        pround(
            (F.col("nearest_micro") / 1_000_000.0) / mean_within, 6
        ).alias("separation_ratio"),
    )


QUERIES["label_embedding_separation"] = label_embedding_separation

ORACLE["label_embedding_separation"] = f"""
    WITH cents AS (
        SELECT label, i - 1 AS pos,
               {sql_round("avg(embedding[i]::DOUBLE)", 4)} AS centroid_val
        FROM embeddings, generate_series(1, {DIM}) AS t(i)
        GROUP BY label, i - 1
    ),
    per_vec AS (
        SELECT e.vec_id, e.label,
               CAST(floor(
                   sqrt(sum(CAST(floor(
                       (e.embedding[c.pos + 1]::DOUBLE - c.centroid_val)
                       * (e.embedding[c.pos + 1]::DOUBLE - c.centroid_val)
                       * 1000000000 + 0.5) AS BIGINT)) / 1e9)
                   * 1000000 + 0.5) AS BIGINT) AS dist_micro
        FROM embeddings e
        JOIN cents c ON c.label = e.label
        GROUP BY e.vec_id, e.label
    ),
    within AS (
        SELECT label, count(*)::BIGINT AS n_vectors,
               sum(dist_micro)::BIGINT AS sum_dist_micro
        FROM per_vec GROUP BY label
    ),
    cdist AS (
        SELECT a.label, b.label AS label_b,
               CAST(floor(
                   sqrt(sum(CAST(floor(
                       (a.centroid_val - b.centroid_val)
                       * (a.centroid_val - b.centroid_val)
                       * 1000000000 + 0.5) AS BIGINT)) / 1e9)
                   * 1000000 + 0.5) AS BIGINT) AS cdist_micro
        FROM cents a
        JOIN cents b ON b.pos = a.pos AND b.label <> a.label
        GROUP BY a.label, b.label
    ),
    nearest AS (
        SELECT label, label_b AS nearest_label,
               cdist_micro AS nearest_micro
        FROM (
            SELECT label, label_b, cdist_micro,
                   row_number() OVER (PARTITION BY label
                                      ORDER BY cdist_micro, label_b)
                       AS rn
            FROM cdist
        ) WHERE rn = 1
    )
    SELECT w.label, w.n_vectors,
           {sql_round("w.sum_dist_micro / w.n_vectors / 1000000.0", 6)}
               AS mean_within_dist,
           n.nearest_label,
           {sql_round("n.nearest_micro / 1000000.0", 6)}
               AS nearest_centroid_dist,
           {sql_round(
               "(n.nearest_micro / 1000000.0)"
               " / (w.sum_dist_micro / w.n_vectors / 1000000.0)", 6
           )} AS separation_ratio
    FROM within w JOIN nearest n ON n.label = w.label
"""


def ivf_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of IVF coarse quantization against the true
    labels: for every (true label, assigned nearest centroid) cell, the
    vector count and the share of the true label's vectors — the
    companion to label_embedding_separation that shows WHERE the
    leakage goes (an off-diagonal hot cell is the neighbor an
    nprobe=1 search will wrongly prune toward).

    Scale shape: reuses ivf_assign's broadcast-centroid posexplode
    layout (argmin per vector in a vec_id-partitioned window); the
    rollup lands in the bounded |labels|² domain with per-label totals
    broadcast back."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    cents = S.label_centroids(emb)
    assign = S.ivf_assign(emb, cents).select(
        "vec_id", F.col("assigned_label")
    )
    truth = emb.select("vec_id", F.col("label").alias("true_label"))
    cells = (
        assign.join(truth, "vec_id")
        .groupBy("true_label", "assigned_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    )
    totals = cells.groupBy("true_label").agg(
        F.sum("n_vectors").alias("label_total")
    )
    return cells.join(F.broadcast(totals), "true_label").select(
        "true_label",
        "assigned_label",
        "n_vectors",
        pround(F.col("n_vectors") / F.col("label_total"), 6).alias(
            "share"
        ),
        (F.col("true_label") == F.col("assigned_label")).alias(
            "is_correct"
        ),
    )


QUERIES["ivf_label_confusion"] = ivf_label_confusion

ORACLE["ivf_label_confusion"] = f"""
    WITH cents AS (
        SELECT label, i - 1 AS pos,
               {sql_round("avg(embedding[i]::DOUBLE)", 4)} AS centroid_val
        FROM embeddings, generate_series(1, {DIM}) AS t(i)
        GROUP BY label, i - 1
    ),
    vec_long AS (
        SELECT vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS x
        FROM embeddings, generate_series(1, {DIM}) AS t(i)
    ),
    dist AS (
        SELECT v.vec_id, c.label,
               {sql_round(
                   "sum((v.x - c.centroid_val) * (v.x - c.centroid_val))",
                   6
               )} AS dist2
        FROM vec_long v JOIN cents c ON v.pos = c.pos
        GROUP BY v.vec_id, c.label
    ),
    assign AS (
        SELECT vec_id, label AS assigned_label
        FROM (
            SELECT vec_id, label,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist2 ASC, label ASC) AS rk
            FROM dist
        ) WHERE rk = 1
    ),
    cells AS (
        SELECT e.label AS true_label, a.assigned_label,
               count(*)::BIGINT AS n_vectors
        FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
        GROUP BY e.label, a.assigned_label
    ),
    totals AS (
        SELECT true_label, sum(n_vectors)::BIGINT AS label_total
        FROM cells GROUP BY true_label
    )
    SELECT c.true_label, c.assigned_label, c.n_vectors,
           {sql_round("c.n_vectors * 1.0 / t.label_total", 6)} AS share,
           c.true_label = c.assigned_label AS is_correct
    FROM cells c JOIN totals t ON t.true_label = c.true_label
"""


def embedding_quantization_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label int8 quantization error audit: symmetric per-vector
    max-abs scaling to [-127, 127] (the layout a serving stack ships
    embeddings in at 100 TB — 4× smaller than float32), reporting each
    label's component count, mean |error|, RMS error and worst-case
    |error| — the go/no-go table before switching ANN serving to int8
    (a label whose RMS error approaches its neighbor margin will flip
    rankings).

    Determinism: components fix to integer MICRO-units first; the int8
    code is floor(x·127/scale + 0.5) and the reconstruction error
    fixes to integer NANO-units before any aggregate — exact LONG
    folds, order-independent; an all-zero vector (scale 0) contributes
    zero error by definition. Scale shape: one narrow pass (array
    lambdas + explode, no joins), one bounded-domain label rollup with
    map-side partials."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    xm = emb.select(
        "label",
        F.expr(
            "transform(embedding, x -> "
            "cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))"
        ).alias("xm"),
    )
    comp = xm.select(
        "label",
        F.expr("array_max(transform(xm, x -> abs(x)))").alias(
            "scale_micro"
        ),
        F.explode("xm").alias("x_micro"),
    )
    err = comp.select(
        "label",
        F.when(F.col("scale_micro") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (
                    F.col("x_micro")
                    - F.floor(
                        F.col("x_micro") * 127.0 / F.col("scale_micro")
                        + F.lit(0.5)
                    )
                    * F.col("scale_micro")
                    / 127.0
                )
                * 1000
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("err_nano"),
    )
    agg = err.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum(F.abs(F.col("err_nano"))).cast("long").alias("sum_abs"),
        F.sum(F.col("err_nano") * F.col("err_nano")).cast("long").alias(
            "sum_sq"
        ),
        F.max(F.abs(F.col("err_nano"))).cast("long").alias("max_abs"),
    )
    return agg.select(
        "label",
        "n_components",
        pround(F.col("sum_abs") / F.col("n_components") / 1e9, 8).alias(
            "mean_abs_err"
        ),
        pround(
            F.sqrt(F.col("sum_sq") / F.col("n_components")) / 1e9, 8
        ).alias("rms_err"),
        pround(F.col("max_abs") / 1e9, 8).alias("max_abs_err"),
    )


QUERIES["embedding_quantization_error"] = embedding_quantization_error

ORACLE["embedding_quantization_error"] = f"""
    WITH xm AS (
        SELECT label,
               list_transform(embedding::DOUBLE[],
                   x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS xm
        FROM embeddings
    ),
    comp AS (
        SELECT label,
               list_max(list_transform(xm, x -> abs(x))) AS scale_micro,
               unnest(xm) AS x_micro
        FROM xm
    ),
    err AS (
        SELECT label,
               CASE WHEN scale_micro = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(floor(
                   (x_micro
                    - floor(x_micro * 127.0 / scale_micro + 0.5)
                      * scale_micro / 127.0) * 1000 + 0.5) AS BIGINT)
               END AS err_nano
        FROM comp
    ),
    agg AS (
        SELECT label,
               count(*)::BIGINT AS n_components,
               sum(abs(err_nano))::BIGINT AS sum_abs,
               sum(err_nano * err_nano)::BIGINT AS sum_sq,
               max(abs(err_nano))::BIGINT AS max_abs
        FROM err GROUP BY label
    )
    SELECT label, n_components,
           {sql_round("sum_abs * 1.0 / n_components / 1e9", 8)}
               AS mean_abs_err,
           {sql_round("sqrt(sum_sq * 1.0 / n_components) / 1e9", 8)}
               AS rms_err,
           {sql_round("max_abs / 1e9", 8)} AS max_abs_err
    FROM agg
"""


def embedding_dim_correlation_top(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 most-correlated embedding dimension pairs (|Pearson r|):
    the redundancy screen embedding_dim_stats can't see — two
    dimensions tracking each other carry one dimension of signal for
    two dimensions of cost, the capacity-waste indicator that argues
    for PCA/whitening before PQ subspace splits (correlated dims in
    different subspaces break PQ's independence assumption).

    Computed the 100 TB way: functions/similarity.gram_pair_partials
    reduces every partition to ONE dim×dim exact-integer Gram matrix
    via an Arrow-batched matmul (mapInPandas — this is the vectorized-
    kernel escape hatch, not a row-at-a-time UDF), so the shuffle
    carries 2016 pair rows per partition instead of rows×dim² cells;
    correlations derive from the exact LONG sums by one fixed double
    expression, and the top-20 is a TakeOrdered over the bounded
    dims²/2-row frame (never a data-bound sort). Zero-variance pairs
    are excluded (r undefined)."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    g = S.gram_pair_partials(emb, vec_col="embedding", dim=DIM)
    var1 = F.col("n") * 1.0 * F.col("s11") - F.col("s1") * 1.0 * F.col("s1")
    var2 = F.col("n") * 1.0 * F.col("s22") - F.col("s2") * 1.0 * F.col("s2")
    cov = F.col("n") * 1.0 * F.col("s12") - F.col("s1") * 1.0 * F.col("s2")
    corr = cov / F.sqrt(var1 * var2)
    return (
        g.filter((var1 > 0) & (var2 > 0))
        .select("d1", "d2", "n", corr.alias("corr_raw"))
        .orderBy(F.abs(F.col("corr_raw")).desc(), "d1", "d2")
        .limit(20)
        .select(
            "d1",
            "d2",
            "n",
            pround(F.col("corr_raw"), 4).alias("corr"),
            pround(F.abs(F.col("corr_raw")), 4).alias("abs_corr"),
        )
    )


QUERIES["embedding_dim_correlation_top"] = embedding_dim_correlation_top

ORACLE["embedding_dim_correlation_top"] = f"""
    WITH coords AS (
        SELECT vec_id,
               t.i - 1 AS d,
               CAST(floor(embedding[t.i]::DOUBLE * 10000 + 0.5)
                    AS BIGINT) AS v
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    pairs AS (
        SELECT a.d AS d1, b.d AS d2,
               count(*)::BIGINT AS n,
               sum(a.v)::BIGINT AS s1,
               sum(b.v)::BIGINT AS s2,
               sum(a.v * a.v)::BIGINT AS s11,
               sum(b.v * b.v)::BIGINT AS s22,
               sum(a.v * b.v)::BIGINT AS s12
        FROM coords a JOIN coords b
          ON b.vec_id = a.vec_id AND a.d < b.d
        GROUP BY a.d, b.d
    ),
    scored AS (
        SELECT d1, d2, n,
               (n * 1.0 * s12 - s1 * 1.0 * s2)
               / sqrt((n * 1.0 * s11 - s1 * 1.0 * s1)
                      * (n * 1.0 * s22 - s2 * 1.0 * s2)) AS corr_raw
        FROM pairs
        WHERE (n * 1.0 * s11 - s1 * 1.0 * s1) > 0
          AND (n * 1.0 * s22 - s2 * 1.0 * s2) > 0
    )
    SELECT d1, d2, n,
           {sql_round("corr_raw", 4)} AS corr,
           {sql_round("abs(corr_raw)", 4)} AS abs_corr
    FROM scored
    ORDER BY abs(corr_raw) DESC, d1, d2
    LIMIT 20
"""


def ivf_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED IVF index under the CORRECTNESS GATE: build the
    on-disk index (ops.ann_index.build_ivf_index — k-means train,
    cell-partitioned vectors, params sidecar) into a temp dir, then
    serve document 0's query through ivf_search_index, whose nprobe
    cell labels push into the vectors/ scan as a PARTITION FILTER.
    Identical (k, n_iter, nprobe, top-k) settings to the oracled
    kmeans_ivf_topk_vec0 make the served result bit-identical to the
    in-memory derivation, so that oracle is REUSED verbatim — the
    driver verifies train + persist + pruned serve end-to-end (the
    hybrid_index_roundtrip discipline for the dense index alone).

    The .collects are the 1-row query vector and the ≤nprobe probe
    labels (metadata-scale scalars). kmeans_ivf_topk_vec0 keeps the
    in-memory derivation under the gate; this keeps the PRODUCTION
    serve path honest against the same math."""
    from data_platform_spark.queries._util import scratch_dir

    from data_platform_spark.ops.ann_index import (
        build_ivf_index,
        ivf_search_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = scratch_dir("dps_ivf_rt_")
    build_ivf_index(emb, f"{base}/ivf", k=KMEANS_K, n_iter=KMEANS_ITER)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0][
            "embedding"
        ]
    ]
    return ivf_search_index(
        spark,
        f"{base}/ivf",
        qvec,
        nprobe=IVF_NPROBE,
        k=TOP_K,
        exclude_ids=[QUERY_VEC_ID],
    )


QUERIES["ivf_index_roundtrip"] = ivf_index_roundtrip

# bit-identical to the in-memory derivation by construction — reuse the
# oracle verbatim so the gate proves the persisted serve path
ORACLE["ivf_index_roundtrip"] = ORACLE["kmeans_ivf_topk_vec0"]


def pq_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED PQ index under the CORRECTNESS GATE: train and
    persist the (codebook, codes, params) index into a temp dir
    (ops.ann_index.build_pq_index — one Lloyd training threaded into
    the encoding), then serve document 0's query through
    pq_search_index, whose asymmetric distance table derives from the
    persisted codebook alone and joins the codes scan — no
    full-precision vector reads at serve time. Identical (n_sub,
    n_codes, top-k) settings to the oracled pq_adc_topk_vec0 make the
    served ADC ranking bit-identical to the in-memory derivation, so
    that oracle is REUSED verbatim — the driver verifies train +
    persist + compressed-domain serve end-to-end, completing the
    index-roundtrip family (lexical, band, IVF, hybrid, PQ: all five
    persisted serving paths now sit under the oracle gate)."""
    from data_platform_spark.queries._util import scratch_dir

    from data_platform_spark.ops.ann_index import (
        build_pq_index,
        pq_search_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = scratch_dir("dps_pq_rt_")
    build_pq_index(emb, f"{base}/pq", n_sub=PQ_M, n_codes=PQ_K)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0][
            "embedding"
        ]
    ]
    return pq_search_index(
        spark, f"{base}/pq", qvec, k=TOP_K, exclude_ids=[QUERY_VEC_ID]
    )


QUERIES["pq_index_roundtrip"] = pq_index_roundtrip

# bit-identical to the in-memory derivation by construction — reuse the
# oracle verbatim so the gate proves the persisted serve path
ORACLE["pq_index_roundtrip"] = ORACLE["pq_adc_topk_vec0"]


def ivfpq_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED composed IVF-PQ index under the CORRECTNESS GATE
    (the sixth and final roundtrip — the production FAISS-style layout
    added in round 10): build the on-disk index
    (ops.ivfpq_index.build_ivfpq_index — k-means cell training + one PQ
    Lloyd training, codes PARTITIONED BY cell) into a temp dir, then
    serve document 0's query through ivfpq_search_index with nprobe =
    n_cells. At full probe every cell's codes participate, so the ADC
    ranking is bit-identical to the flat PQ derivation (same geometry,
    deterministic trainings, the SHARED _pq_query_dist_table lookup
    expression) and the oracled pq_adc_topk_vec0 SQL is REUSED
    verbatim — the driver verifies coarse-train + fine-train + persist
    + compressed-domain serve end-to-end. The pruned posture (nprobe <
    n_cells, partition-filter plan assertion) is pytest-gated in
    tests/test_ivfpq_index.py, the same split every index family uses:
    the oracle proves the math, the plan test proves the pruning.

    The .collects are the 1-row query vector and the ≤nprobe probe
    labels (metadata-scale scalars)."""
    from data_platform_spark.queries._util import scratch_dir

    from data_platform_spark.ops.ivfpq_index import (
        build_ivfpq_index,
        ivfpq_search_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = scratch_dir("dps_ivfpq_rt_")
    build_ivfpq_index(
        emb, f"{base}/ivfpq", n_cells=KMEANS_K, n_sub=PQ_M, n_codes=PQ_K
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0][
            "embedding"
        ]
    ]
    return ivfpq_search_index(
        spark,
        f"{base}/ivfpq",
        qvec,
        nprobe=KMEANS_K,
        k=TOP_K,
        exclude_ids=[QUERY_VEC_ID],
    )


QUERIES["ivfpq_index_roundtrip"] = ivfpq_index_roundtrip

# at nprobe = n_cells the composed serve path is bit-identical to the
# flat ADC derivation — reuse the oracle verbatim so the gate proves it
ORACLE["ivfpq_index_roundtrip"] = ORACLE["pq_adc_topk_vec0"]


def doc_quality_vs_embedding_norm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal encoder sanity: does embedding norm track text
    quality? Pearson correlation between the document quality score and
    its embedding's L2 norm (doc_id and vec_id share the id domain),
    plus mean norms for the low/high quality halves — encoders trained
    with length/quality-correlated signal leak it into norms, which
    then biases any dot-product retrieval toward (or away from) quality
    in ways a cosine evaluation never shows. Near-zero correlation
    green-lights norm-free assumptions; a strong one argues for
    normalize-before-index (and explains 'high-quality docs never
    surface' bug reports).

    Determinism: quality is the shared 4-dp heuristic in integer units;
    the norm quantizes per row to 4-dp integer units; the five Pearson
    sums are exact LONG folds and the closing r is one fixed double
    expression (6 dp). Scale shape: one id-keyed equi-join
    (uniformly distributed), one scalar fold. No windows."""
    from data_platform_spark.functions import text as X
    from data_platform_spark.sources.tables import load_table as _lt

    docs = fan_out(_lt(spark, sf_dir, "documents"), spark)
    emb = _lt(spark, sf_dir, "embeddings")
    q = docs.select(
        F.col("doc_id").alias("id"),
        F.floor(X.quality_score(F.col("text")) * 10_000 + F.lit(0.5))
        .cast("long")
        .alias("q"),
    )
    nrm = emb.select(
        F.col("vec_id").alias("id"),
        F.floor(
            S.l2_norm(S.as_double(F.col("embedding"))) * 10_000 + F.lit(0.5)
        )
        .cast("long")
        .alias("m"),
    )
    j = q.join(nrm, "id")
    sums = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").alias("sq"),
        F.sum("m").alias("sm"),
        F.sum(F.col("q") * F.col("m")).alias("sqm"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.when(F.col("q") < 5000, F.col("m"))).alias("sm_low"),
        F.sum(F.when(F.col("q") < 5000, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_low"),
    )
    num = F.col("n") * F.col("sqm") - F.col("sq") * F.col("sm")
    den_q = F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")
    den_m = F.col("n") * F.col("smm") - F.col("sm") * F.col("sm")
    r = num.cast("double") / F.sqrt(
        den_q.cast("double") * den_m.cast("double")
    )
    return sums.select(
        F.col("n").alias("n_docs"),
        pround(F.when((den_q > 0) & (den_m > 0), r), 6).alias(
            "quality_norm_corr"
        ),
        pround(
            F.when(
                F.col("n_low") > 0,
                F.col("sm_low") / 10_000.0 / F.col("n_low"),
            ),
            6,
        ).alias("mean_norm_lowq"),
        pround(
            F.when(
                F.col("n") > F.col("n_low"),
                (F.col("sm") - F.coalesce(F.col("sm_low"), F.lit(0)))
                / 10_000.0
                / (F.col("n") - F.col("n_low")),
            ),
            6,
        ).alias("mean_norm_highq"),
    )


QUERIES["doc_quality_vs_embedding_norm"] = doc_quality_vs_embedding_norm


def _quality_norm_oracle() -> str:
    from data_platform_spark.queries.text import quality_sql

    norm = (
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
    )
    return f"""
        WITH q AS (
            SELECT doc_id AS id,
                   CAST(floor(({quality_sql()}) * 10000 + 0.5) AS BIGINT)
                       AS q
            FROM documents
        ),
        nrm AS (
            SELECT vec_id AS id,
                   CAST(floor({norm} * 10000 + 0.5) AS BIGINT) AS m
            FROM embeddings
        ),
        sums AS (
            SELECT count(*)::BIGINT AS n,
                   sum(q)::BIGINT AS sq,
                   sum(m)::BIGINT AS sm,
                   sum(q * m)::BIGINT AS sqm,
                   sum(q * q)::BIGINT AS sqq,
                   sum(m * m)::BIGINT AS smm,
                   sum(CASE WHEN q < 5000 THEN m END)::BIGINT AS sm_low,
                   sum(CASE WHEN q < 5000 THEN 1 ELSE 0 END)::BIGINT
                       AS n_low
            FROM q JOIN nrm USING (id)
        )
        SELECT n AS n_docs,
               {sql_round(
                   "CASE WHEN n * sqq - sq * sq > 0"
                   " AND n * smm - sm * sm > 0"
                   " THEN (n * sqm - sq * sm)::DOUBLE"
                   " / sqrt((n * sqq - sq * sq)::DOUBLE"
                   "        * (n * smm - sm * sm)::DOUBLE) END", 6
               )} AS quality_norm_corr,
               {sql_round(
                   "CASE WHEN n_low > 0"
                   " THEN sm_low / 10000.0 / n_low END", 6
               )} AS mean_norm_lowq,
               {sql_round(
                   "CASE WHEN n > n_low THEN"
                   " (sm - coalesce(sm_low, 0)) / 10000.0 / (n - n_low)"
                   " END", 6
               )} AS mean_norm_highq
        FROM sums
    """


ORACLE["doc_quality_vs_embedding_norm"] = _quality_norm_oracle()
