"""Persisted exact-substring gram-posting index: build-once / serve-many.

The gate query (queries/dedup.py ``incremental_substring_spans``)
recomputes character grams and the union df-cap for the WHOLE corpus per
call so its DuckDB oracle can verify the full derivation; at 100 TB that
re-gramming dwarfs the actual span work. This module is the production
path — the exact-substring member of the persisted-index family
(MinHash: ops/neardup_index.py; semantic: ops/semantic_dedup.py): the
standing corpus is grammed ONCE at build time, and each batch search
computes grams only for the batch (O(batch), not O(corpus)).

Persisted halves under ``path``:

- ``postings/`` — one (doc_id, pos, gram) row per standing-doc gram
  position, PARTITIONED by ``gbk = pmod(xxhash64(gram), n_gram_buckets)``:
  a search collects the batch grams' bucket values (bounded by the bucket
  count, metadata scale) and the candidate scan partition-prunes to those
  directories — posting-read IO is bounded by the batch's buckets, not
  the corpus. At cluster scale the buckets are the co-location key (the
  band index's ``bk`` discipline).
- ``df/`` — (gram, df) PARTIAL document-frequency rows, one per distinct
  gram per build/append batch, same partitioning. Appends never rewrite
  standing counts (counts are additive facts, so the merge is a SUM at
  read time, pruned + semi-joined to the batch's grams first); batch ids
  must be NEW to the index (the family's caller contract), which makes
  the partial-sum exactly ``count(DISTINCT doc_id)`` over the union.
- ``params/`` — (k, df_cap, min_len, n_gram_buckets) sidecar, validated
  by every search/append reading it back: probing with a different gram
  width would silently find nothing, so geometry is pinned at build.

A search against the persisted index returns BIT-IDENTICAL span rows to
the oracled ``incremental_substring_spans`` recompute (asserted in
tests/test_ops.py and gate-checked by ``substring_index_roundtrip``):
the df-cap eligibility over the union (standing df partial-sum + batch
df), the bipartite-plus-batch-self candidate legs with the orientation
normalization, and the diagonal gaps-and-islands span algebra are the
same expressions over the same gram relation. The standing corpus is
NEVER self-joined and its text is never re-read at search time (the
poisoned-recompute test pins this: corrupting the standing docs' text
after build does not change search results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.functions.dedup import char_gram_df
from data_platform_spark.ops import _index_io as IO

GRAM_BUCKETS = 64


def _gbk(col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


def build_substring_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    df_cap: int = 8,
    min_len: int = 24,
    n_gram_buckets: int = GRAM_BUCKETS,
) -> None:
    """Gram the standing corpus once and persist the (postings, df,
    params) index under ``path``. The df half derives from the persisted
    postings relation, so the two halves are consistent by construction
    (the band index's build discipline)."""
    spark = docs.sparkSession
    grams = char_gram_df(docs, id_col, text_col, k).withColumn(
        "gbk", _gbk("gram", n_gram_buckets)
    )
    grams.write.partitionBy("gbk").mode("overwrite").parquet(
        f"{path}/postings"
    )
    # explicit schema: a partitioned write of an EMPTY corpus (the
    # stream-sink seed) produces no data files, so inference would fail
    persisted = spark.read.schema(grams.schema).parquet(f"{path}/postings")
    (
        persisted.groupBy("gbk", "gram")
        .agg(F.count_distinct(id_col).cast("long").alias("df"))
        .write.partitionBy("gbk")
        .mode("overwrite")
        .parquet(f"{path}/df")
    )
    spark.createDataFrame(
        [(k, df_cap, min_len, n_gram_buckets)],
        "k int, df_cap int, min_len int, n_gram_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def read_substring_params(spark: SparkSession, path: str) -> dict[str, int]:
    """The build-time parameter sidecar as a dict."""
    row = spark.read.parquet(f"{path}/params").collect()[0]
    return {k: int(v) for k, v in row.asDict().items()}


def append_to_substring_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: str | None = None,
) -> None:
    """Fold a processed batch into the standing index (the second half of
    the daily loop: search, keep the survivors, append them). O(batch)
    work: only the new docs are grammed; standing df counts are NEVER
    rewritten — the batch contributes its own (gram, df) partials and
    reads sum them. Geometry comes from the sidecar (an append with a
    different gram width would silently poison the index, so it isn't
    overridable here).

    Crash safety is the shared ops/_index_io protocol: both halves stage
    to a temp dir, files move into the live index under deterministic
    ``<batch_id>-N`` names (a retry completes exactly the missing files,
    never duplicating rows), and with a ``batch_id`` the two-phase
    intent/done markers make replays no-ops across maintenance passes.
    Callers SHOULD pass a stable batch_id; batch doc ids must be NEW to
    the index (otherwise their grams double-count in the df sums)."""
    import shutil
    import uuid

    spark = new_docs.sparkSession
    if batch_id is not None and IO.batch_done(path, batch_id):
        return  # replayed batch: already folded in
    p = read_substring_params(spark, path)
    bid = batch_id if batch_id is not None else uuid.uuid4().hex[:12]
    stage = f"{path}/.append-stage-{bid}"
    if batch_id is not None:
        IO.begin_batch(path, batch_id)
    # one file per destination (per gram bucket): staged content is a
    # pure function of the batch, so bucket-granular completion across a
    # retry composes the exact same index. Batch-sized data — coalesce
    # is cheap.
    grams = char_gram_df(new_docs, id_col, text_col, p["k"]).withColumn(
        "gbk", _gbk("gram", p["n_gram_buckets"])
    )
    grams.coalesce(1).write.partitionBy("gbk").mode("overwrite").parquet(
        f"{stage}/postings"
    )
    persisted = spark.read.schema(grams.schema).parquet(f"{stage}/postings")
    (
        persisted.groupBy("gbk", "gram")
        .agg(F.count_distinct(id_col).cast("long").alias("df"))
        .coalesce(1)
        .write.partitionBy("gbk")
        .mode("overwrite")
        .parquet(f"{stage}/df")
    )
    for half in ("postings", "df"):
        IO.move_staged_files(f"{stage}/{half}", f"{path}/{half}", bid)
    shutil.rmtree(stage, ignore_errors=True)
    if batch_id is not None:
        IO.finish_batch(path, batch_id)


def substring_search_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal verbatim shared spans (doc_a, doc_b, a_start, b_start,
    match_len) of a fresh batch against the PERSISTED index, plus the
    batch's own internal spans — bit-identical to the oracled
    ``incremental_substring_spans`` recompute over standing ∪ batch.

    O(batch) fresh gram work; the standing side contributes only its
    persisted postings and df partials, both PARTITION-PRUNED to the
    batch grams' hash buckets (bounded by n_gram_buckets — a metadata
    collect) and semi-joined to the batch's gram set before anything
    shuffles. Candidate legs are the bipartite batch×standing join and
    the batch self-join — the standing corpus NEVER self-joins, so
    candidate cost is O(batch grams ⋈ df-capped postings), independent
    of standing size.

    Eligibility mirrors the one-shot operator's df cap over the UNION
    corpus: union df = batch df + summed standing partials, kept for
    2 <= df <= df_cap. Grams only in the standing corpus can't form a
    batch-touching pair, so restricting eligibility to batch grams
    loses nothing (the equivalence the roundtrip oracle pins).

    Caller guarantees batch ids are not already in the index (otherwise
    a doc trivially matches itself)."""
    from pyspark.sql import Window

    from data_platform_spark.cache import scoped_persist

    p = read_substring_params(spark, path)
    nb = p["n_gram_buckets"]
    batch_grams = scoped_persist(
        char_gram_df(new_docs, id_col, text_col, p["k"])
    )
    batch_df = batch_grams.groupBy("gram").agg(
        F.count_distinct(id_col).cast("long").alias("df_b")
    )
    # bucket prune: bounded by the bucket count, metadata scale
    buckets = [
        r[0]
        for r in batch_grams.select(_gbk("gram", nb).alias("b"))
        .distinct()
        .collect()
    ]
    from pyspark.sql import types as T

    df_schema = T.StructType(
        [
            T.StructField("gram", T.StringType()),
            T.StructField("df", T.LongType()),
            T.StructField("gbk", T.IntegerType()),
        ]
    )
    df_scan = spark.read.schema(df_schema).parquet(f"{path}/df")
    post_schema = T.StructType(
        batch_grams.schema.fields + [T.StructField("gbk", T.IntegerType())]
    )
    post_scan = spark.read.schema(post_schema).parquet(f"{path}/postings")
    if buckets:
        df_scan = df_scan.filter(F.col("gbk").isin(buckets))
        post_scan = post_scan.filter(F.col("gbk").isin(buckets))
    else:
        df_scan = df_scan.filter(F.lit(False))
        post_scan = post_scan.filter(F.lit(False))

    # The batch's gram set (and the df-capped eligible subset of it) is
    # batch-bounded — the dimension-sized side of every standing-side
    # join, so it BROADCASTS: the persisted df partials and postings are
    # scanned (bucket-pruned) and probe the broadcast in place, never
    # shuffling a corpus-proportional relation on the gram key. Without
    # the hint Spark's stats for these aggregate-derived sets can
    # overestimate past the auto-broadcast threshold and fall back to a
    # sort-merge join that shuffles the standing postings — the O(corpus)
    # movement this index exists to avoid. For a batch too large to
    # broadcast, split the batch (the incremental family's convention).
    standing_df = (
        df_scan.join(
            F.broadcast(batch_df.select("gram")), "gram", "left_semi"
        )
        .groupBy("gram")
        .agg(F.sum("df").alias("df_s"))
    )
    eligible = (
        batch_df.join(standing_df, "gram", "left")
        .withColumn(
            "df_union", F.col("df_b") + F.coalesce(F.col("df_s"), F.lit(0))
        )
        .filter(
            (F.col("df_union") >= 2) & (F.col("df_union") <= p["df_cap"])
        )
        .select("gram")
    )
    g_batch = scoped_persist(
        batch_grams.join(F.broadcast(eligible), "gram", "left_semi")
    )
    g_standing = post_scan.drop("gbk").join(
        F.broadcast(eligible), "gram", "left_semi"
    )

    def _sides(df, side):
        return df.select(
            F.col(id_col).alias(f"doc_{side}"),
            F.col("pos").alias(f"pos_{side}"),
            "gram",
        )

    # bipartite leg, BOTH orientations normalized to doc_a < doc_b, plus
    # the batch self-join leg — the gate query's exact composition
    bi = _sides(g_batch, "a").join(_sides(g_standing, "b"), "gram")
    m = (
        bi.filter(F.col("doc_a") < F.col("doc_b"))
        .unionByName(
            bi.filter(F.col("doc_a") > F.col("doc_b")).select(
                F.col("doc_b").alias("doc_a"),
                F.col("pos_b").alias("pos_a"),
                F.col("doc_a").alias("doc_b"),
                F.col("pos_a").alias("pos_b"),
                "gram",
            )
        )
        .unionByName(
            _sides(g_batch, "a")
            .join(_sides(g_batch, "b"), "gram")
            .filter(F.col("doc_a") < F.col("doc_b"))
        )
    )
    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = m.select("doc_a", "doc_b", "pos_a", "pos_b", diag).withColumn(
        "island", F.col("pos_a") - F.row_number().over(w)
    )
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("pos_a").cast("long").alias("a_start"),
            F.min("pos_b").cast("long").alias("b_start"),
            (F.max("pos_a") - F.min("pos_a") + p["k"])
            .cast("long")
            .alias("match_len"),
        )
        .filter(F.col("match_len") >= p["min_len"])
        .select("doc_a", "doc_b", "a_start", "b_start", "match_len")
    )


def incremental_substring_report(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    strip_ratio: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-batch-doc keep/strip report against the persisted index — the
    ``substring_strip_decisions`` composition produced from O(batch)
    fresh work: every span found by ``substring_search_index``
    contributes an interval to its batch-side doc(s), overlapping
    intervals merge (running-max interval union, one windowed pass per
    doc), and a batch doc whose merged verbatim coverage exceeds
    ``strip_ratio`` of its length is marked ``strip``. Batch docs with
    no span at all get a zero-coverage ``keep`` row, so the report has
    exactly one row per batch doc (the neardup_report contract)."""
    from pyspark.sql import Window

    from data_platform_spark.queries._util import pround

    spans = substring_search_index(
        spark, path, new_docs, id_col, text_col
    )
    batch_ids = new_docs.select(F.col(id_col).alias("_bid"))
    ivals = (
        spans.join(
            batch_ids, spans["doc_a"] == F.col("_bid"), "left_semi"
        )
        .select(
            F.col("doc_a").alias(id_col),
            F.col("a_start").alias("s"),
            (F.col("a_start") + F.col("match_len")).alias("e"),
        )
        .unionByName(
            spans.join(
                batch_ids, spans["doc_b"] == F.col("_bid"), "left_semi"
            ).select(
                F.col("doc_b").alias(id_col),
                F.col("b_start").alias("s"),
                (F.col("b_start") + F.col("match_len")).alias("e"),
            )
        )
        .distinct()  # unique (s, e) per doc: order-deterministic windows
    )
    w = Window.partitionBy(id_col).orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grouped = ivals.withColumn(
        "new_group",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "grp",
        F.sum("new_group").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    covered = (
        grouped.groupBy(id_col, "grp")
        .agg((F.max("e") - F.min("s")).alias("chars"))
        .groupBy(id_col)
        .agg(F.sum("chars").cast("long").alias("dup_chars"))
    )
    lengths = new_docs.select(
        F.col(id_col), F.length(text_col).cast("long").alias("_len")
    )
    return (
        lengths.join(covered, id_col, "left")
        .withColumn("dup_chars", F.coalesce("dup_chars", F.lit(0)))
        .select(
            id_col,
            "dup_chars",
            pround(F.col("dup_chars") / F.col("_len"), 4).alias("dup_ratio"),
            F.when(
                F.col("dup_chars") / F.col("_len") > strip_ratio,
                F.lit("strip"),
            )
            .otherwise(F.lit("keep"))
            .alias("decision"),
        )
    )
