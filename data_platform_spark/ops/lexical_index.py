"""Persisted BM25 lexical index: build-once / search-many keyword
retrieval — the lexical sibling of the PQ/IVF ANN indexes
(ops/ann_index.py) and the MinHash band index (ops/neardup_index.py),
completing the persisted-index family for the hybrid RAG stack: every
retrieval leg (dense ANN, near-dup, lexical) now has a production
build/search/append path.

The oracled queries (queries/text.py ``bm25_topk``, ``bm25_batch_topk``
and the hybrid legs) re-derive postings from the corpus text per call so
DuckDB can verify the full math; at 100 TB that re-tokenization dwarfs
the scoring. Here the corpus is tokenized ONCE at build time into:

- ``postings/`` — one (term, id…, dl, tf) row per distinct (document,
  term), PARTITIONED BY ``tbk = pmod(xxhash64(term), n_term_buckets)``:
  a search collects its query terms' bucket values (≤ |terms|, computed
  on a |terms|-row local relation) and partition-prunes the scan —
  postings-read IO is bounded by the query's term buckets, not the
  corpus vocabulary. Document frequency needs no separate table: rows
  are unique per (doc, term), so ``df`` is a plain per-term count over
  the (already pruned) matched postings.
- ``stats/``    — an append-friendly ledger of (n_docs, sum_dl) rows,
  one per build/append batch; a search SUMS the ledger (metadata scale)
  to recover exact ``n_docs``/``avgdl``. Document lengths are integers,
  so the long-sum → double division reproduces the in-memory
  ``avg(dl)`` bit-for-bit.
- ``params/``   — (n_term_buckets, id column name/type) sidecar,
  validated on every search/append: probing with a different bucket
  count would silently prune to wrong directories, so geometry rides
  with the index, never with the caller.

A search against the persisted index returns BIT-IDENTICAL rows to the
in-memory ``bm25_topk`` pipeline (asserted in tests/test_ops.py)
because both compose the same functions/retrieval.py expressions over
the same (tf, dl, df, n_docs, avgdl) values — consistency by
construction, the PQ-index discipline.

Appends are crash-safe and idempotent under a caller-supplied
``batch_id`` (staged writes + deterministic file names via
ops/_index_io.move_staged_files, the shared discipline of all four
index families). There is no drift/rebuild leg: postings are exact —
nothing is trained, so nothing decays. Caller guarantees appended doc
ids are new (re-appending a doc would double its postings — same
contract as the band index).
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_platform_spark.functions import retrieval as R
from data_platform_spark.ops import _index_io as IO

TERM_BUCKETS = 64


def _tbk(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def _postings_schema(id_name: str, id_type: str) -> T.StructType:
    """Explicit read schema (partition column included): an empty seed
    index has no data files to infer from, and the sidecar pins the id
    column's shape anyway."""
    return T.StructType(
        [
            T.StructField(id_name, T._parse_datatype_string(id_type)),
            T.StructField("dl", T.DoubleType()),
            T.StructField("term", T.StringType()),
            T.StructField("tf", T.DoubleType()),
            T.StructField("tbk", T.IntegerType()),
        ]
    )


def _stats_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("n_docs", T.LongType()),
            T.StructField("sum_dl", T.LongType()),
        ]
    )


def _stats_row(base: DataFrame) -> DataFrame:
    """One (n_docs, sum_dl) ledger row for a corpus/batch. sum_dl is a
    LONG (dl values are integers), so ledger sums are exact and
    avgdl = sum_dl / n_docs reproduces avg(dl) bit-for-bit."""
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(F.col("dl").cast("long")), F.lit(0).cast("long")
        ).alias("sum_dl"),
    )


def build_lexical_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_term_buckets: int = TERM_BUCKETS,
) -> None:
    """Tokenize the standing corpus once and persist the (postings,
    stats, params) index under ``path``. Supports an EMPTY seed corpus
    (the stream-sink bootstrap): the partitioned write then produces no
    data files, which the explicit-schema reads handle."""
    spark = docs.sparkSession
    base = R.token_base(docs, [id_col], text_col)
    post = R.full_corpus_tf(base, [id_col]).withColumn(
        "tbk", _tbk(F.col("term"), n_term_buckets)
    )
    post.select(id_col, "dl", "term", "tf", "tbk").write.partitionBy(
        "tbk"
    ).mode("overwrite").parquet(f"{path}/postings")
    _stats_row(base).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/stats"
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    spark.createDataFrame(
        [(n_term_buckets, id_col, id_type)],
        "n_term_buckets int, id_col string, id_type string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def read_lexical_params(spark: SparkSession, path: str) -> dict:
    row = spark.read.parquet(f"{path}/params").collect()[0]
    return row.asDict()


def append_to_lexical_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    batch_id: str | None = None,
) -> None:
    """Fold a new document batch into the persisted index — O(batch)
    work: only the batch is tokenized; stats ride as one more ledger
    row (summed at search, so no read-modify-write of global state).

    Crash safety: postings (one file per touched term bucket — bucket
    content is a pure function of the batch) and the stats row stage
    first, then move under deterministic ``<batch_id>-N`` names; a
    retried partial append completes exactly the missing files and can
    never double-count. With a batch_id the two-phase
    intent/done markers additionally make replays no-ops across
    maintenance passes that rename files (compaction) — the shared
    ops/_index_io protocol. Callers SHOULD pass a stable batch_id;
    without one a random id is used and a crash retry is NOT safe."""
    spark = new_docs.sparkSession
    if batch_id is not None and IO.batch_done(path, batch_id):
        return  # replayed batch: already folded in
    p = read_lexical_params(spark, path)
    id_col, nb = p["id_col"], int(p["n_term_buckets"])
    bid = batch_id if batch_id is not None else uuid.uuid4().hex[:12]
    stage = f"{path}/.append-stage-{bid}"
    if batch_id is not None:
        IO.begin_batch(path, batch_id)
    base = R.token_base(new_docs, [id_col], text_col)
    post = R.full_corpus_tf(base, [id_col]).withColumn(
        "tbk", _tbk(F.col("term"), nb)
    )
    post.select(id_col, "dl", "term", "tf", "tbk").coalesce(
        1
    ).write.partitionBy("tbk").mode("overwrite").parquet(
        f"{stage}/postings"
    )
    _stats_row(base).coalesce(1).write.mode("overwrite").parquet(
        f"{stage}/stats"
    )
    for half in ("postings", "stats"):
        IO.move_staged_files(f"{stage}/{half}", f"{path}/{half}", bid)
    shutil.rmtree(stage, ignore_errors=True)
    if batch_id is not None:
        IO.finish_batch(path, batch_id)


def _matched_from_index(
    spark: SparkSession, path: str, terms: list[str]
) -> tuple[DataFrame, DataFrame, dict]:
    """(matched tf relation, 1-row stats, params) for a term set —
    the shared scan side of single- and batch-query searches. The scan
    prunes to the terms' hash buckets: bucket values come from a
    |terms|-row local relation (the same engine-side xxhash64 the build
    used, so Python never re-implements the hash)."""
    p = read_lexical_params(spark, path)
    nb = int(p["n_term_buckets"])
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("term set is empty — nothing to search")
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = [
        r[0]
        for r in tdf.select(_tbk(F.col("term"), nb).alias("b"))
        .distinct()
        .collect()
    ]
    scan = spark.read.schema(
        _postings_schema(p["id_col"], p["id_type"])
    ).parquet(f"{path}/postings")
    matched = (
        scan.filter(F.col("tbk").isin(buckets))
        .filter(F.col("term").isin(terms))
        .drop("tbk")
    )
    ledger = spark.read.schema(_stats_schema()).parquet(f"{path}/stats")
    # try_divide: an empty seed index legitimately sums to n_docs = 0
    # (the documented bootstrap path) and 0/0 raises under ANSI mode.
    # A NULL avgdl is harmless — an empty index matches zero postings,
    # so the scoring join it feeds is empty.
    stats = ledger.agg(
        F.sum("n_docs").cast("double").alias("n_docs"),
        F.try_divide(
            F.sum("sum_dl").cast("double"),
            F.sum("n_docs").cast("double"),
        ).alias("avgdl"),
    )
    return matched, stats, p


def bm25_search_index(
    spark: SparkSession,
    path: str,
    terms: list[str],
    topk: int = 20,
    k1: float = R.BM25_K1,
    b: float = R.BM25_B,
) -> DataFrame:
    """Top-k documents for a term query against the PERSISTED index —
    (id, score_micro, n_matched_terms), bit-identical to the in-memory
    ``bm25_topk`` math over the same corpus. The scan touches only the
    query terms' postings buckets; df derives from the pruned matched
    relation (one row per (doc, term)); top-k via sort+limit =
    TakeOrdered."""
    matched, stats, p = _matched_from_index(spark, path, terms)
    scored = R.score_tf(
        matched,
        R.df_table_from_tf(matched),
        stats,
        [p["id_col"]],
        k1=k1,
        b=b,
    )
    return scored.orderBy(
        F.desc("score_micro"), F.asc(p["id_col"])
    ).limit(topk)


def bm25_batch_search_index(
    spark: SparkSession,
    path: str,
    query_terms: DataFrame,
    topk: int = 10,
    k1: float = R.BM25_K1,
    b: float = R.BM25_B,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Top-k per query for a WORKLOAD of term queries in one pass — the
    retrieval-eval shape (N queries × corpus). ``query_terms`` is a
    (query_id, term) relation, metadata scale (it is a query workload,
    not data), so it broadcasts into the postings join; terms shared by
    several queries fan the posting row out once per subscribing query.

    df per term is computed BEFORE the query join (document frequency
    is a corpus property, independent of which queries ask). Per-query
    top-k goes through the grouped two-phase rank
    (ops/global_order.grouped_running_sum) — a popular query whose term
    matches half the corpus would otherwise funnel corpus-scale rows
    through one window task. Returns (query_id, id…, score_micro,
    n_matched_terms, rn) with rn ≤ topk."""
    from data_platform_spark.ops.global_order import grouped_running_sum

    terms = [
        r[0] for r in query_terms.select("term").distinct().collect()
    ]
    matched, stats, p = _matched_from_index(spark, path, terms)
    id_col = p["id_col"]
    df_tab = R.df_table_from_tf(matched)
    per_query = matched.join(
        F.broadcast(query_terms.select("query_id", "term")), "term"
    )
    scored = R.score_tf(
        per_query, df_tab, stats, ["query_id", id_col], k1=k1, b=b
    )
    ranked = grouped_running_sum(
        scored,
        ["query_id"],
        [F.desc("score_micro"), F.asc(id_col)],
        F.lit(1).cast("long"),
        "rn",
        broadcast_offsets=broadcast_offsets,
    )
    return ranked.filter(F.col("rn") <= topk)
