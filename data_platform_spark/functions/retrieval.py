"""Shared Okapi BM25 scoring expressions — the single source of truth
for every lexical-retrieval surface in the repo.

Four call sites compose these pieces: the oracled corpus queries
(queries/text.py ``bm25_topk`` and the lexical legs of
``hybrid_rrf_topk``), the chunk-granularity variants
(``chunk_bm25_topk`` / ``chunk_hybrid_rrf_topk`` via
``_chunk_bm25_scored``), the batch multi-query form
(``bm25_batch_topk``), and the PERSISTED lexical index
(ops/lexical_index.py). Sharing the expressions — not duplicating
them — is what makes the persisted-index search bit-identical to the
gated in-memory math by construction, the same discipline the PQ index
uses (ops/ann_index.py trains once and threads ``cents=`` through).

Determinism contract (why every piece looks the way it does):

- tokenization is a plain whitespace split — cross-engine trivially
  reproducible (the DuckDB oracles run ``string_split(text, ' ')``);
- per-term contributions are fixed to integer MICRO-UNITS before the
  per-document sum, so the document score is an order-independent LONG
  sum: FP addition order can never leak into the driver's hash gate;
- ``avgdl`` is an exact double (document lengths are small integers;
  their double sum is exact), so it is reproducible regardless of
  aggregation order.

Reference semantics: Okapi BM25 (Robertson/Sparck Jones), the lexical
half of the standard RAG retrieval stack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75
SCORE_MICRO = 1_000_000


def token_base(
    docs: DataFrame, id_cols: list[str], text_col: str = "text"
) -> DataFrame:
    """(id_cols…, ws array<string>, dl double): the tokenized relation
    every other piece derives from. ``dl`` (document length) rides as a
    double because the scoring arithmetic is double-domain, but its
    values are integers, so sums/averages over it are exact."""
    ws = F.split(F.col(text_col), " ")
    return docs.select(
        *id_cols, ws.alias("ws"), F.size(ws).cast("double").alias("dl")
    )


def corpus_stats(base: DataFrame) -> DataFrame:
    """1-row (n_docs double, avgdl double) — broadcast into the scoring
    join. The double sum inside avg is exact (integer-valued dl), hence
    order-independent."""
    return base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )


def matched_postings(
    base: DataFrame, terms: list[str], id_cols: list[str]
) -> DataFrame:
    """One (id_cols…, dl, term) row per OCCURRENCE of a query term.
    The filter runs INSIDE the token array before the generator, so
    explode emits only matching postings instead of the corpus-sized
    token stream (the generate was the lexical leg's dominant cost)."""
    return base.select(
        *id_cols,
        "dl",
        F.explode(
            F.filter(F.col("ws"), lambda t: t.isin(*terms))
        ).alias("term"),
    )


def stats_tf_df(
    base: DataFrame, terms: list[str], id_cols: list[str]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The (stats, tf, df) triple for a BM25 scoring composition with
    the df leg DERIVED FROM the tf leg (r16, guide §2.3/§2.4).

    The query-side compositions used to build ``df_table(matched)`` and
    ``tf_table(matched)`` as two independent derivations of the matched
    postings — two full tokenize passes over the corpus, because Spark
    shares no common subexpressions across a plan. ``df_table_from_tf``
    counts the tf relation's rows per term instead (tf rows are unique
    per (doc, term), so the count IS the document frequency — the same
    identity the persisted lexical index relies on). The structural win
    this keeps vs the independent ``df_table(matched)`` derivation: the
    df leg drops its ``distinct()`` (an extra exchange + aggregate).
    The r16 hope that the two legs' now-identical tf subtrees would
    additionally share ONE execution through ReuseExchange is REFUTED
    by the executed plan (r17, plans/r17/bm25_topk_final_executed.txt,
    VERDICT r16 item 5): column pruning gives the df leg's partial
    aggregate a narrower output than the tf leg's, the canonicalized
    exchanges differ, and no ReusedExchange node appears — the corpus
    is still tokenized once per leg. Forcing the subtrees equal would
    need a persist, and a persisted-narrow-projection variant measured
    ~0.5 s SLOWER at sf0.1 than this form (the cache round-trip cost
    more than the saved scan). ``stats`` keeps its own corpus pass —
    it aggregates every document, not just term matches."""
    stats = corpus_stats(base)
    matched = matched_postings(base, terms, id_cols)
    tf = tf_table(matched, id_cols)
    return stats, tf, df_table_from_tf(tf)


def tf_table(matched: DataFrame, id_cols: list[str]) -> DataFrame:
    """(id_cols…, dl, term, tf double): one row per distinct (doc,
    term) with its term frequency — the relation a persisted postings
    index stores, and the scoring join's left side."""
    return matched.groupBy(*id_cols, "dl", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )


def full_corpus_tf(base: DataFrame, id_cols: list[str]) -> DataFrame:
    """(id_cols…, dl, term, tf double) over EVERY term — the relation a
    persisted postings index stores (one row per distinct (doc, term)).
    Only the index BUILD pays the corpus-sized explode; searches read
    back bucket-pruned slices of its output."""
    return (
        base.select(*id_cols, "dl", F.explode("ws").alias("term"))
        .groupBy(*id_cols, "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )


def df_table_from_tf(tf: DataFrame) -> DataFrame:
    """(term, df double) from a tf relation — rows there are unique per
    (doc, term), so document frequency is a plain per-term count."""
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )


def df_table(matched: DataFrame, id_cols: list[str]) -> DataFrame:
    """(term, df double) from raw matched postings (per-occurrence
    rows): distinct (doc, term) first, then count per term."""
    return (
        matched.select(*id_cols, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )


def contrib_micro(
    k1: float = BM25_K1, b: float = BM25_B
) -> Column:
    """The per-(doc, term) BM25 contribution in integer micro-units:
    idf(df, n_docs) × saturating-tf(tf, dl, avgdl), floored at 6 dp.
    Evaluated over a relation carrying columns ``tf``, ``dl``, ``df``,
    ``n_docs``, ``avgdl`` (the tf ⋈ df ⋈ stats join)."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return F.floor(idf * norm * SCORE_MICRO + F.lit(0.5)).cast("long")


def score_tf(
    tf: DataFrame,
    df_tab: DataFrame,
    stats: DataFrame,
    id_cols: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    with_match_count: bool = True,
) -> DataFrame:
    """(id_cols…, score_micro long[, n_matched_terms long]): the scored
    relation. ``df_tab`` (≤ |query terms| rows) and ``stats`` (1 row)
    ride as broadcasts — the only shuffle is the per-doc sum, and the
    summand is already an integer so the aggregate is order-safe."""
    aggs = [F.sum(contrib_micro(k1, b)).alias("score_micro")]
    if with_match_count:
        aggs.append(F.count(F.lit(1)).alias("n_matched_terms"))
    return (
        tf.join(F.broadcast(df_tab), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(*id_cols)
        .agg(*aggs)
    )
