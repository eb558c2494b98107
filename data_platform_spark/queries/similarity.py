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
            S.srp_signature(F.col("embedding"), N_PLANES, DIM).alias("bucket")
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
    # mirror of S.srp_signature: weight(i,p) in [-0.5, 0.5), i is 1-based
    return (
        "(SELECT sum(embedding[i]::DOUBLE * "
        f"((((i * 2654435761 + {(p + 1) * 40503}) % 1997)::DOUBLE / 1997.0) - 0.5)) "
        f"FROM generate_series(1, {DIM}) AS t(i))"
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
