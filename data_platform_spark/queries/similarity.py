"""Similarity-search queries over the embeddings table: exact cosine
top-k (baseline), per-label centroids (IVF building block), and
sign-random-projection LSH bucket histogram (the scale path's bucketing).

Oracle mirrors the same double-precision math; all similarity values
rounded to 4 dp so results are stable under summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.functions import similarity as S
from data_platform_spark.queries._util import fan_out, sql_round
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


def _srp_proj_sql(p: int) -> str:
    # mirror of S.srp_signature: weight(i,p) in [-0.5, 0.5), i is 1-based;
    # projection quantized to SRP_QUANTUM_DP before the sign test (same
    # quantum as both Spark implementations)
    raw = (
        "(SELECT sum(embedding[i]::DOUBLE * "
        f"((((i * 2654435761 + {(p + 1) * 40503}) % 1997)::DOUBLE / 1997.0) - 0.5)) "
        f"FROM generate_series(1, {DIM}) AS t(i))"
    )
    return sql_round(raw, S.SRP_QUANTUM_DP)


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
    from pyspark.sql.window import Window
    from data_platform_spark.queries._util import pround

    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    cents = S.label_centroids(emb)  # label, pos, centroid_val (rounded 4dp)
    vec_long = emb.select(
        "vec_id", F.posexplode(S.as_double(F.col("embedding"))).alias("pos", "x")
    )
    dist = (
        vec_long.join(F.broadcast(cents), "pos")
        .groupBy("vec_id", "label")
        .agg(
            pround(
                F.sum(
                    (F.col("x") - F.col("centroid_val"))
                    * (F.col("x") - F.col("centroid_val"))
                ),
                6,
            ).alias("dist2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("label"))
    return (
        dist.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", F.col("label").alias("assigned_label"), "dist2")
    )


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
    version of ANN search. Cost ∝ Σ bucket_size², never n²; the bucket
    self-join shuffles (bucket, vec_id, embedding) keyed by bucket.
    """
    from pyspark.sql.window import Window
    from data_platform_spark.queries._util import pround

    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    bucketed = emb.select(
        "vec_id",
        "embedding",
        S.srp_signature_np(F.col("embedding"), N_PLANES, DIM).alias("bucket"),
    ).persist()
    a = bucketed.select(
        F.col("bucket"),
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("e_src"),
    )
    b = bucketed.select(
        F.col("bucket"),
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("e_dst"),
    )
    pairs = a.join(b, "bucket").filter(F.col("src") != F.col("dst"))
    scored = pairs.select(
        "src",
        "dst",
        pround(
            S.cosine(S.as_double(F.col("e_src")), S.as_double(F.col("e_dst"))), 4
        ).alias("cosine"),
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
