"""Text-analysis queries over the documents table (charter extension
surface): token statistics, language-ID heuristic, quality scoring,
fingerprinting.

Oracle SQL is generated from the SAME marker lists / constants as the
Spark expressions (single source of truth — a drifted stopword list can't
silently pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.functions import retrieval as R
from data_platform_spark.functions import text as X
from data_platform_spark.queries._util import fan_out, pround, sql_round
from data_platform_spark.sources.tables import load_table


def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    t = F.col("text")
    return docs.select(
        "doc_id",
        X.word_count(t).alias("n_words"),
        X.token_count(t).alias("n_tokens"),
        X.avg_word_len(t).alias("avg_word_len"),
    )


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    t = F.col("text")
    return docs.select(
        "doc_id",
        *[
            X.marker_score(t, X.LANG_MARKERS[lang]).alias(f"s_{lang}")
            for lang in X.LANG_PRIORITY
        ],
        X.predicted_lang(t).alias("predicted_lang"),
    )


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return docs.select(
        "doc_id", X.quality_score(F.col("text")).alias("quality")
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return docs.select(
        "doc_id", X.fingerprint(F.col("text")).alias("fp")
    )


def token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(X.token_count(t).cast("long")).alias("total_tokens"),
            pround(F.avg(X.word_count(t))).alias("avg_words"),
        )
    )


QUERIES = {
    "doc_text_stats": doc_text_stats,
    "doc_lang_id": doc_lang_id,
    "doc_quality": doc_quality,
    "doc_fingerprint": doc_fingerprint,
    "token_stats_by_lang": token_stats_by_lang,
}


def _sql_marker_score(markers: list[str]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({lst})))"


def _build_oracle() -> dict[str, str]:
    score_cols = ",\n            ".join(
        f"{_sql_marker_score(X.LANG_MARKERS[lang])} AS s_{lang}"
        for lang in X.LANG_PRIORITY
    )
    max_expr = "greatest(" + ", ".join(f"s_{lang}" for lang in X.LANG_PRIORITY) + ")"
    case_branches = "\n                ".join(
        f"WHEN s_{lang} = {max_expr} THEN '{lang}'"
        for lang in X.LANG_PRIORITY[:-1]
    )
    all_markers = sorted({m for ms in X.LANG_MARKERS.values() for m in ms})
    return {
        "doc_text_stats": f"""
            SELECT
                doc_id,
                len(string_split(text, ' ')) AS n_words,
                len(regexp_extract_all(text, '{X.TOKEN_REGEX}')) AS n_tokens,
                {sql_round("length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' '))")} AS avg_word_len
            FROM documents
        """,
        "doc_lang_id": f"""
            SELECT doc_id, {", ".join(f"s_{l}" for l in X.LANG_PRIORITY)},
                CASE
                {case_branches}
                ELSE '{X.LANG_PRIORITY[-1]}'
                END AS predicted_lang
            FROM (
                SELECT doc_id,
                    {score_cols}
                FROM documents
            )
        """,
        "doc_quality": f"""
            SELECT
                doc_id,
                {sql_round(f"0.5 * least(len(string_split(text, ' ')) / 50.0, 1.0) + 0.5 * least({_sql_marker_score(all_markers)} / 5.0, 1.0)", 4)} AS quality
            FROM documents
        """,
        "doc_fingerprint": """
            SELECT
                doc_id,
                md5(substr(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, 64)) AS fp
            FROM documents
        """,
        "token_stats_by_lang": f"""
            SELECT
                lang,
                count(*) AS n_docs,
                CAST(sum(len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::BIGINT) AS BIGINT) AS total_tokens,
                {sql_round("avg(len(string_split(text, ' ')))")} AS avg_words
            FROM documents
            GROUP BY lang
        """,
    }


ORACLE = _build_oracle()


# ---------------------------------------------------------------------------
# second wave: n-gram frequencies + language-ID confusion matrix
# ---------------------------------------------------------------------------


def bigram_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams (n-gram frequency analysis):
    narrow array expression per doc → explode → count → total-order top-k.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    w = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-based language-ID heuristic against
    the labeled lang column."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return (
        docs.select("lang", X.predicted_lang(F.col("text")).alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


QUERIES.update(
    {
        "bigram_top20": bigram_top20,
        "lang_id_confusion": lang_id_confusion,
    }
)


def _extend_oracle() -> None:
    score_cols = ",\n                        ".join(
        f"{_sql_marker_score(X.LANG_MARKERS[lang])} AS s_{lang}"
        for lang in X.LANG_PRIORITY
    )
    max_expr = "greatest(" + ", ".join(f"s_{l}" for l in X.LANG_PRIORITY) + ")"
    case_branches = "\n                        ".join(
        f"WHEN s_{lang} = {max_expr} THEN '{lang}'"
        for lang in X.LANG_PRIORITY[:-1]
    )
    ORACLE.update(
        {
            "bigram_top20": """
                WITH words AS (
                    SELECT doc_id, string_split(text, ' ') AS w FROM documents
                ),
                idx AS (
                    SELECT doc_id, w,
                           unnest(generate_series(1, greatest(len(w) - 1, 1))) AS i
                    FROM words
                ),
                bg AS (
                    SELECT array_to_string(w[i:i+1], ' ') AS bigram FROM idx
                )
                SELECT bigram, count(*) AS n
                FROM bg
                GROUP BY bigram
                ORDER BY n DESC, bigram ASC
                LIMIT 20
            """,
            "lang_id_confusion": f"""
                SELECT lang, predicted_lang, count(*) AS n_docs
                FROM (
                    SELECT lang,
                        CASE
                        {case_branches}
                        ELSE '{X.LANG_PRIORITY[-1]}'
                        END AS predicted_lang
                    FROM (
                        SELECT lang,
                        {score_cols}
                        FROM documents
                    )
                )
                GROUP BY lang, predicted_lang
            """,
        }
    )


_extend_oracle()


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length distribution: 50-word-wide buckets (floor binning —
    the quality-filter diagnostic every corpus pipeline starts with)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    bucket = (X.word_count(F.col("text")).cast("long") / 50).cast("long") * 50
    return (
        docs.select(bucket.alias("word_bucket"))
        .groupBy("word_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


QUERIES["doc_length_histogram"] = doc_length_histogram

ORACLE["doc_length_histogram"] = """
    SELECT
        (len(string_split(text, ' ')) // 50) * 50 AS word_bucket,
        count(*) AS n_docs
    FROM documents
    GROUP BY 1
"""


def term_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus IDF table: document frequency + ln(N/df) per term.

    Two shuffles total: distinct (doc, term) then term counts — the
    reduce-side shape of every distributed TF-IDF build. N is a scalar
    broadcast (count over a tiny aggregate), not a driver-side literal,
    so the plan is one job."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    doc_terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).distinct()
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_tab = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return df_tab.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "df",
        pround(F.log(F.col("n_docs").cast("double") / F.col("df")), 6).alias("idf"),
    )


def doc_top_terms_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (tf × ln(N/df), window top-k with
    deterministic tie-break)."""
    from pyspark.sql.window import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_tab = (
        terms.select("doc_id", "term").distinct()
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(df_tab, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            pround(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


QUERIES.update(
    {
        "term_idf": term_idf,
        "doc_top_terms_tfidf": doc_top_terms_tfidf,
    }
)

ORACLE.update(
    {
        "term_idf": f"""
            WITH doc_terms AS (
                SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ),
            n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT
                term,
                count(*) AS df,
                {sql_round("ln(n.n_docs::DOUBLE / count(*))", 6)} AS idf
            FROM doc_terms, n
            GROUP BY term, n.n_docs
        """,
        "doc_top_terms_tfidf": f"""
            WITH terms AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM terms GROUP BY doc_id, term
            ),
            dfreq AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term
            ),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
                SELECT
                    tf.doc_id,
                    tf.term,
                    {sql_round("tf.tf * ln(n.n_docs::DOUBLE / dfreq.df)", 6)} AS tfidf
                FROM tf JOIN dfreq ON tf.term = dfreq.term, n
            )
            SELECT doc_id, term, tfidf, rk FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
                ) AS rk
                FROM scored
            )
            WHERE rk <= 3
        """,
    }
)


def term_zipf_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-frequency (Zipf) table of the corpus vocabulary: term counts
    with a deterministic frequency rank — the diagnostic behind
    stopword-list and vocabulary-truncation decisions.

    The rank is a TOTAL order over the vocabulary (10^8-10^9 terms at
    100 TB), so it uses the two-phase range-partition + broadcast-offset
    layout from ops.global_order — no single-partition window."""
    from data_platform_spark.ops.global_order import global_row_number

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = global_row_number(
        counts, [F.desc("n"), F.asc("term")], "freq_rank"
    )
    return ranked.select("term", "n", "freq_rank")


QUERIES["term_zipf_ranks"] = term_zipf_ranks

ORACLE["term_zipf_ranks"] = """
    SELECT
        term,
        n,
        row_number() OVER (ORDER BY n DESC, term ASC) AS freq_rank
    FROM (
        SELECT term, count(*) AS n
        FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        )
        GROUP BY term
    )
"""


# ---------------------------------------------------------------------------
# third wave: token-budget corpus curation
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 10_000


def corpus_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus curation: greedily keep the highest-quality
    documents until a token budget is exhausted.

    Rank by (quality DESC, doc_id ASC), running token sum, keep rows whose
    cumulative count fits the budget — the deterministic core of 'give me
    the best N-token training mix'. The running sum runs in the two-phase
    range-partition + broadcast-offset layout (ops.global_order): per-
    partition token subtotals, broadcast prefix offsets — no single-
    partition window, semantics identical.
    """
    from data_platform_spark.ops.global_order import global_running_sum

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    t = F.col("text")
    scored = docs.select(
        "doc_id",
        X.quality_score(t).alias("quality"),
        X.token_count(t).cast("long").alias("n_tokens"),
    )
    cum = global_running_sum(
        scored,
        [F.desc("quality"), F.asc("doc_id")],
        F.col("n_tokens"),
        "cum_tokens",
    )
    return cum.filter(F.col("cum_tokens") <= TOKEN_BUDGET).select(
        "doc_id", "quality", "n_tokens", "cum_tokens"
    )


QUERIES["corpus_token_budget_sample"] = corpus_token_budget_sample


def quality_sql() -> str:
    """SQL mirror of functions.text.quality_score (shared by the curation
    and dedup oracles)."""
    all_markers = sorted({m for ms in X.LANG_MARKERS.values() for m in ms})
    return sql_round(
        "0.5 * least(len(string_split(text, ' ')) / 50.0, 1.0) "
        f"+ 0.5 * least({_sql_marker_score(all_markers)} / 5.0, 1.0)",
        4,
    )


def _budget_oracle() -> str:
    quality = quality_sql()
    return f"""
        WITH scored AS (
            SELECT
                doc_id,
                {quality} AS quality,
                len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::BIGINT
                    AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT *,
                   CAST(sum(n_tokens) OVER (
                       ORDER BY quality DESC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM scored
        )
        SELECT doc_id, quality, n_tokens, cum_tokens
        FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    """


ORACLE["corpus_token_budget_sample"] = _budget_oracle()


# ---------------------------------------------------------------------------
# fourth wave: deterministic stratified sampling
# ---------------------------------------------------------------------------

# per-language keep fractions (training-mix rebalancing: downsample the
# over-represented language, keep the rest denser)
SAMPLE_FRACS = {"en": 0.3, "fr": 0.8, "es": 0.8, "de": 0.8, "zh": 0.5}
SAMPLE_FRAC_DEFAULT = 0.5
_HASH_MAX = float(0xFFFFFFFF)


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep fractions via
    a content-hash uniform — the training-mix rebalancing primitive.

    u = first 8 md5 hex chars as an integer / 2^32-1 gives a reproducible
    uniform in [0,1] per document (NO rand(): same sample on every run,
    every engine, every partitioning). Keep the doc when u < frac(lang).
    Pure per-row expressions — no shuffle at all until a downstream agg.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    u = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(_HASH_MAX)
    frac = F.lit(SAMPLE_FRAC_DEFAULT)
    for lang, f in SAMPLE_FRACS.items():
        frac = F.when(F.col("lang") == lang, F.lit(f)).otherwise(frac)
    return (
        docs.select(
            "doc_id",
            "lang",
            pround(u, 6).alias("u"),
            (u < frac).alias("_keep"),
        )
        .filter(F.col("_keep"))
        .drop("_keep")
    )


QUERIES["stratified_sample_docs"] = stratified_sample_docs


def _sample_oracle() -> str:
    branches = " ".join(
        f"WHEN '{lang}' THEN {f}" for lang, f in SAMPLE_FRACS.items()
    )
    u = f"(('0x' || substr(md5(text), 1, 8))::BIGINT / {_HASH_MAX})"
    return f"""
        SELECT
            doc_id,
            lang,
            {sql_round(u, 6)} AS u
        FROM documents
        WHERE {u} < (CASE lang {branches} ELSE {SAMPLE_FRAC_DEFAULT} END)
    """


ORACLE["stratified_sample_docs"] = _sample_oracle()


# ---------------------------------------------------------------------------
# blocklist / PII-shape redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# blocklisted terms + the two canonical PII shapes (emails, long digit
# runs); the corpus is synthetic word-soup so the PII alternatives match
# nothing here, but the operator is the real scrubbing shape
REDACT_PATTERN = (
    r"\b(error|dup|slow)\b"
    r"|[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    r"|[0-9]{6,}"
)


def doc_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist + PII-pattern scrubbing: per-doc redaction count and the
    post-redaction length — pure JVM regexp (regexp_count /
    regexp_replace), embarrassingly parallel, no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(REDACT_PATTERN))
        .cast("long")
        .alias("n_redacted"),
        F.length(
            F.regexp_replace(F.col("text"), REDACT_PATTERN, "[X]")
        )
        .cast("long")
        .alias("clean_len"),
    )


QUERIES["doc_redaction"] = doc_redaction

ORACLE["doc_redaction"] = f"""
    SELECT
        doc_id,
        len(regexp_extract_all(text, '{REDACT_PATTERN}')) AS n_redacted,
        length(regexp_replace(text, '{REDACT_PATTERN}', '[X]', 'g'))
            AS clean_len
    FROM documents
"""


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher-style quality signal): the
    fraction of duplicate word trigrams and duplicate words per doc.

    Heavily repetitious documents (boilerplate, keyword stuffing, list
    spam) are standard removals before LLM training; the dup-trigram
    fraction is the classic detector. All array expressions inside
    whole-stage codegen — ``split`` → ``transform(sequence)`` trigram
    build → ``array_distinct`` — zero shuffle, embarrassingly parallel,
    so the cost at 100 TB is one scan."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    ws = F.split(F.col("text"), " ")
    tg = F.expr(
        "CASE WHEN size(split(text, ' ')) < 3 THEN array() "
        "ELSE transform(sequence(0, size(split(text, ' ')) - 3), "
        "i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], "
        "split(text, ' ')[i+2])) END"
    )
    n_tg = F.size(tg).cast("long")
    n_tg_d = F.size(F.array_distinct(tg)).cast("long")
    n_w = F.size(ws).cast("long")
    n_w_d = F.size(F.array_distinct(ws)).cast("long")
    return docs.select(
        "doc_id",
        n_tg.alias("n_trigrams"),
        n_tg_d.alias("n_distinct_trigrams"),
        pround(F.lit(1.0) - n_tg_d / n_tg, 6).alias("dup_trigram_frac"),
        n_w.alias("n_words"),
        pround(F.lit(1.0) - n_w_d / n_w, 6).alias("dup_word_frac"),
    )


QUERIES["doc_repetition_stats"] = doc_repetition_stats

ORACLE["doc_repetition_stats"] = f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), t AS (
        SELECT
            doc_id,
            ws,
            CASE WHEN len(ws) < 3 THEN []::VARCHAR[]
                 ELSE list_transform(range(1, len(ws) - 1),
                      i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
            END AS tg
        FROM w
    )
    SELECT
        doc_id,
        len(tg)::BIGINT AS n_trigrams,
        len(list_distinct(tg))::BIGINT AS n_distinct_trigrams,
        {sql_round("1.0 - len(list_distinct(tg)) * 1.0 / len(tg)", 6)}
            AS dup_trigram_frac,
        len(ws)::BIGINT AS n_words,
        {sql_round("1.0 - len(list_distinct(ws)) * 1.0 / len(ws)", 6)}
            AS dup_word_frac
    FROM t
"""


DECON_N = 5          # word n-gram order for contamination matching
DECON_BENCH_MOD = 20  # doc_id % MOD == 0 -> benchmark ("eval") split


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its
    distinct word 5-grams appear in the benchmark (eval) split.

    The standard pre-training hygiene op: training documents sharing long
    n-grams with an evaluation set inflate benchmark scores and must be
    flagged/dropped. Here the eval split is the deterministic
    ``doc_id % 20 == 0`` slice of the corpus.

    100 TB shape: the benchmark n-gram set is DISTINCT'd and
    **broadcast** — eval suites are millions of n-grams at most, dwarfed
    by the corpus, so the training side never shuffles: scan → explode
    distinct 5-grams → broadcast-hash probe → partial-agg count per doc.
    One shuffle total (the per-doc count), keyed by high-cardinality
    doc_id."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(split(text, ' ')) < 5 THEN array() "
                    "ELSE transform(sequence(0, size(split(text, ' ')) - 5), "
                    "i -> concat_ws(' ', split(text, ' ')[i], "
                    "split(text, ' ')[i+1], split(text, ' ')[i+2], "
                    "split(text, ' ')[i+3], split(text, ' ')[i+4])) END"
                )
            )
        ).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") % DECON_BENCH_MOD == 0)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
    joined = train.join(F.broadcast(bench), "g", "left")
    n_grams = F.count(F.lit(1)).cast("long")
    n_hit = F.count("hit").cast("long")
    return joined.groupBy("doc_id").agg(
        n_grams.alias("n_ngrams"),
        n_hit.alias("n_contaminated"),
        pround(n_hit / n_grams, 6).alias("contaminated_frac"),
        (F.count("hit") > 0).alias("is_contaminated"),
    )


QUERIES["benchmark_decontamination"] = benchmark_decontamination

ORACLE["benchmark_decontamination"] = f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), g AS (
        SELECT
            doc_id,
            unnest(list_distinct(
                CASE WHEN len(ws) < {DECON_N} THEN []::VARCHAR[]
                     ELSE list_transform(range(1, len(ws) - {DECON_N - 2}),
                          i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
                               || ' ' || ws[i + 3] || ' ' || ws[i + 4])
                END)) AS g
        FROM w
    ), bench AS (
        SELECT DISTINCT g FROM g WHERE doc_id % {DECON_BENCH_MOD} = 0
    )
    SELECT
        t.doc_id,
        count(*)::BIGINT AS n_ngrams,
        count(b.g)::BIGINT AS n_contaminated,
        {sql_round("count(b.g) * 1.0 / count(*)", 6)} AS contaminated_frac,
        count(b.g) > 0 AS is_contaminated
    FROM g t LEFT JOIN bench b USING (g)
    WHERE t.doc_id % {DECON_BENCH_MOD} != 0
    GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# fifth wave: per-source training-mix quotas
# ---------------------------------------------------------------------------

PER_SOURCE_TOKEN_BUDGET = 3_000


def corpus_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix curation with per-SOURCE token quotas: within each
    source, keep the highest-quality documents until that source's budget
    is spent — the 'mix weights' primitive of corpus assembly (each
    source contributes a bounded token share, best docs first).

    Unlike ``corpus_token_budget_sample``'s single global order, the
    running sum here is PARTITIONED by source. A native
    ``Window.partitionBy("source")`` funnels each source through one
    task — and the realistic corpus shape is one source holding most of
    the data (cf. the reference's single-API-source world,
    /root/reference/dags/operators/extract_api_operator.py:8-11, taken to
    100 TB). So this runs the skew-safe grouped two-phase layout
    (``ops.global_order.grouped_running_sum``): range-partition on
    (source, quality desc, doc_id), within-partition window, per-(source,
    partition) subtotal offsets — a dominant source's ordered rows span
    many partitions instead of one."""
    from data_platform_spark.ops.global_order import grouped_running_sum

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    t = F.col("text")
    scored = docs.select(
        "doc_id",
        "source",
        X.quality_score(t).alias("quality"),
        X.token_count(t).cast("long").alias("n_tokens"),
    )
    cum = grouped_running_sum(
        scored,
        ["source"],
        [F.desc("quality"), F.asc("doc_id")],
        F.col("n_tokens"),
        "cum_tokens",
    )
    return cum.filter(F.col("cum_tokens") <= PER_SOURCE_TOKEN_BUDGET).select(
        "doc_id", "source", "quality", "n_tokens", "cum_tokens"
    )


QUERIES["corpus_mix_by_source"] = corpus_mix_by_source

ORACLE["corpus_mix_by_source"] = f"""
    WITH scored AS (
        SELECT
            doc_id,
            source,
            {{q}} AS quality,
            len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::BIGINT
                AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT *,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM scored
    )
    SELECT doc_id, source, quality, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {PER_SOURCE_TOKEN_BUDGET}
""".replace("{q}", quality_sql())


# ---------------------------------------------------------------------------
# sixth wave: chunking + sequence packing (training-batch assembly)
# ---------------------------------------------------------------------------

CHUNK_WORDS = 32
CHUNK_STRIDE = 24  # 8-word overlap between consecutive chunks


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: fixed-size word windows with
    overlap — the chunk layer under RAG indexes and long-doc training.
    All JVM array expressions (split → sequence of starts → explode →
    slice → hash); one narrow pass, rows ∝ total chunks."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    words = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(words), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunked = docs.select(
        "doc_id", words.alias("w"), F.explode(starts).alias("start")
    ).select(
        "doc_id",
        (((F.col("start") - 1) / CHUNK_STRIDE).cast("long")).alias("chunk_idx"),
        F.slice(F.col("w"), F.col("start"), CHUNK_WORDS).alias("chunk"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").alias("n_words"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_md5"),
    )


QUERIES["doc_chunking"] = doc_chunking

ORACLE["doc_chunking"] = f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    starts AS (
        SELECT doc_id, words,
               unnest(generate_series(1, greatest(len(words), 1),
                                      {CHUNK_STRIDE})) AS start
        FROM w
    )
    SELECT
        doc_id,
        CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
        len(words[start : start + {CHUNK_WORDS} - 1]) AS n_words,
        md5(array_to_string(words[start : start + {CHUNK_WORDS} - 1], ' '))
            AS chunk_md5
    FROM starts
"""


PACK_CTX_TOKENS = 512


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-cut sequence packing: documents laid end to end in
    a stable order (doc_id), cut into fixed context-length bins — the
    batch-assembly step of LLM training-data pipelines. The token offset
    comes from the two-phase global running sum (ops.global_order), so
    packing scales without a single-partition window; bin id = start
    offset div context length."""
    from data_platform_spark.ops.global_order import global_running_sum

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    scored = docs.select(
        "doc_id",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    cum = global_running_sum(
        scored, [F.asc("doc_id")], F.col("n_tokens"), "cum_tokens"
    )
    start_offset = F.col("cum_tokens") - F.col("n_tokens")
    return cum.select(
        "doc_id",
        "n_tokens",
        F.floor(start_offset / PACK_CTX_TOKENS).cast("long").alias("bin_id"),
    )


QUERIES["corpus_pack_sequences"] = corpus_pack_sequences

ORACLE["corpus_pack_sequences"] = f"""
    WITH scored AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::BIGINT
                   AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT *,
               CAST(sum(n_tokens) OVER (
                   ORDER BY doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM scored
    )
    SELECT doc_id, n_tokens,
           CAST(floor((cum_tokens - n_tokens) / {PACK_CTX_TOKENS}.0)
                AS BIGINT) AS bin_id
    FROM c
"""


# ---------------------------------------------------------------------------
# seventh wave (round 6): retrieval scoring, LM-quality filtering,
# tokenizer induction
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ["spark", "join", "window"]
BM25_K1 = R.BM25_K1
BM25_B = R.BM25_B
BM25_TOPK = 20


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval: top-k documents for a fixed term query —
    the lexical-retrieval half of a RAG stack (Okapi BM25: per-term IDF
    x saturating TF with document-length normalization). The scoring
    math lives in functions/retrieval.py, shared verbatim with the
    hybrid/chunk legs, the batch form, and the persisted lexical index
    (ops/lexical_index.py).

    Distributed shape: explode → filter to query terms (so the shuffled
    relation is only the matching postings, not the corpus) → tf counts;
    document frequency per term is a 3-row broadcast; (n_docs, avgdl) a
    1-row broadcast. Per-term contributions are fixed to integer
    micro-units BEFORE the per-document sum, so the aggregate is an
    order-independent LONG sum — bit-identical across partitionings and
    engines (FP addition order would otherwise leak into the hash gate).
    Top-k via sort+limit = TakeOrdered, no global sort materialized.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    base = R.token_base(docs, ["doc_id"])
    # df derives from tf (r16, guide §2.3/§2.4) — drops the df leg's
    # distinct() vs the independent derivation; bit-identical df counts.
    # (The r16 ReuseExchange hope is refuted by the executed plan —
    # column pruning keeps the legs canonically unequal; see
    # stats_tf_df's docstring and plans/r17/bm25_topk_final_executed.txt)
    stats, tf, df_tab = R.stats_tf_df(base, BM25_QUERY_TERMS, ["doc_id"])
    scored = R.score_tf(tf, df_tab, stats, ["doc_id"])
    return scored.orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    ).limit(BM25_TOPK)


QUERIES["bm25_topk"] = bm25_topk


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len(string_split(text, ' '))::DOUBLE AS dl,
                   string_split(text, ' ') AS ws
            FROM documents
        ),
        stats AS (
            SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM base
        ),
        postings AS (
            SELECT doc_id, dl, unnest(ws) AS term FROM base
        ),
        matched AS (
            SELECT doc_id, dl, term FROM postings WHERE term IN ({terms})
        ),
        tf AS (
            SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
            FROM matched GROUP BY doc_id, dl, term
        ),
        df_tab AS (
            SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
            FROM matched GROUP BY term
        ),
        contrib AS (
            SELECT
                tf.doc_id,
                CAST(floor(
                    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * (tf.tf * ({BM25_K1} + 1)) / (tf.tf + {BM25_K1}
                       * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
                    * 1000000 + 0.5) AS BIGINT) AS c
            FROM tf JOIN df_tab d USING (term) CROSS JOIN stats s
        )
        SELECT doc_id,
               sum(c)::BIGINT AS score_micro,
               count(*)::BIGINT AS n_matched_terms
        FROM contrib
        GROUP BY doc_id
        ORDER BY score_micro DESC, doc_id ASC
        LIMIT {BM25_TOPK}
    """


ORACLE["bm25_topk"] = _bm25_oracle()


def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score (the CCNet/perplexity-filter
    shape): train a corpus unigram LM (term counts / total tokens) and
    score every document by its average token log-probability — low
    scores flag gibberish and off-distribution text, high scores flag
    boilerplate; the middle band is what training pipelines keep.

    Two shuffles (term counts; per-doc sum) + a 1-row broadcast for the
    total. Per-token log-probs are fixed to integer micro-units before
    the per-doc sum — order-independent LONG arithmetic, same rationale
    as bm25_topk. The term-probability join is a plain shuffle join on
    term: at 100 TB the vocabulary side can be arbitrarily large (no
    broadcast assumption) and hot terms ride AQE skew handling.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    term_counts = tokens.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    total = tokens.agg(
        F.count(F.lit(1)).cast("double").alias("total_tokens")
    )
    logp_micro = F.floor(
        F.log(F.col("cnt") / F.col("total_tokens")) * 1_000_000 + F.lit(0.5)
    ).cast("long")
    scored = (
        tokens.join(term_counts, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(logp_micro).alias("sum_logp_micro"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "sum_logp_micro",
        pround(
            F.col("sum_logp_micro") / 1_000_000 / F.col("n_tokens"), 4
        ).alias("avg_logp"),
    )


QUERIES["doc_unigram_logprob"] = doc_unigram_logprob

ORACLE["doc_unigram_logprob"] = f"""
    WITH tokens AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    term_counts AS (
        SELECT term, count(*)::DOUBLE AS cnt FROM tokens GROUP BY term
    ),
    total AS (
        SELECT count(*)::DOUBLE AS total_tokens FROM tokens
    ),
    scored AS (
        SELECT
            t.doc_id,
            count(*)::BIGINT AS n_tokens,
            sum(CAST(floor(ln(c.cnt / tt.total_tokens) * 1000000 + 0.5)
                     AS BIGINT))::BIGINT AS sum_logp_micro
        FROM tokens t
        JOIN term_counts c USING (term)
        CROSS JOIN total tt
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, sum_logp_micro,
           {sql_round("sum_logp_micro / 1000000.0 / n_tokens", 4)} AS avg_logp
    FROM scored
"""


BPE_TOPK = 20


def bpe_pair_merge_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE-style pair induction: the most frequent adjacent
    character pairs across the corpus, weighted by word frequency — the
    inner loop of tokenizer vocabulary training, run at corpus scale.

    Shape: word counts first (one shuffle collapses the token stream to
    the VOCABULARY — at 100 TB that's the compression step that makes
    tokenizer training tractable), then each unique word explodes into
    its adjacent pairs (array expression, no Python) weighted by its
    corpus count; one more shuffle sums pair counts. Top-k via
    sort+limit. Exact integer counts end to end.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    word_counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = F.expr(
        "CASE WHEN length(word) < 2 THEN array() "
        "ELSE transform(sequence(1, length(word) - 1), "
        "i -> substring(word, i, 2)) END"
    )
    pair_counts = (
        word_counts.select(F.explode(pairs).alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").alias("n_occurrences"))
    )
    return pair_counts.orderBy(
        F.desc("n_occurrences"), F.asc("pair")
    ).limit(BPE_TOPK)


QUERIES["bpe_pair_merge_round"] = bpe_pair_merge_round

ORACLE["bpe_pair_merge_round"] = f"""
    WITH word_counts AS (
        SELECT word, count(*)::BIGINT AS wc
        FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        )
        GROUP BY word
    ),
    pairs AS (
        SELECT unnest(
                   CASE WHEN length(word) < 2 THEN []::VARCHAR[]
                        ELSE list_transform(range(1, length(word)),
                                            i -> substr(word, i, 2))
                   END) AS pair,
               wc
        FROM word_counts
    )
    SELECT pair, sum(wc)::BIGINT AS n_occurrences
    FROM pairs
    GROUP BY pair
    ORDER BY n_occurrences DESC, pair ASC
    LIMIT {BPE_TOPK}
"""


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of the lexical and dense legs
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_TOPK = 20


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: the lexical leg
    (BM25 over the fixed term query) and the dense leg (cosine against
    document 0's embedding — doc_id and vec_id share one id domain in
    the testdata) each produce a full ranking; RRF fuses them as
    sum(1 / (60 + rank)) — the standard score-free fusion that needs no
    calibration between BM25 scores and cosines.

    Scale shape: each leg's rank is a GLOBAL row number, so both go
    through the two-phase ops.global_order layout (range partition +
    broadcast offsets — no single-partition window; same machinery as
    corpus curation). The fusion itself is a full-outer join on the id
    plus a fixed two-term reciprocal sum, rounded to 6 dp identically in
    the oracle. Top-k via sort+limit = TakeOrdered."""
    from data_platform_spark.functions import similarity as S
    from data_platform_spark.ops.global_order import global_row_number

    # lexical leg: BM25 contributions, micro-units (the shared
    # functions/retrieval.py math — same expressions as bm25_topk)
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    base = R.token_base(docs, ["doc_id"])
    # df derives from tf (r16, guide §2.3/§2.4; no exchange reuse —
    # see stats_tf_df's docstring)
    stats, tf, df_tab = R.stats_tf_df(base, BM25_QUERY_TERMS, ["doc_id"])
    lex_scored = R.score_tf(
        tf,
        df_tab,
        stats,
        ["doc_id"],
        with_match_count=False,
    ).filter(F.col("doc_id") != 0)  # doc 0 is the dense query
    lex = global_row_number(
        lex_scored, [F.desc("score_micro"), F.asc("doc_id")], "rn_lex"
    ).select("doc_id", "rn_lex")

    # dense leg: cosine vs document 0's embedding (4-dp, cosine_topk math)
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    qv = emb.filter(F.col("vec_id") == 0).select(
        S.as_double(F.col("embedding")).alias("q")
    )
    dense_scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            pround(
                S.cosine(S.as_double(F.col("embedding")), F.col("q")), 4
            ).alias("cosine"),
        )
    )
    dense = global_row_number(
        dense_scored, [F.desc("cosine"), F.asc("doc_id")], "rn_dense"
    ).select("doc_id", "rn_dense")

    fused = dense.join(lex, "doc_id", "full_outer").select(
        "doc_id",
        "rn_lex",
        "rn_dense",
        pround(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rn_lex")), F.lit(0.0))
            + F.coalesce(
                1.0 / (F.lit(RRF_K) + F.col("rn_dense")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOPK)


QUERIES["hybrid_rrf_topk"] = hybrid_rrf_topk


def _hybrid_rrf_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    cos = (
        "list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) / "
        "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
    )
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len(string_split(text, ' '))::DOUBLE AS dl,
                   string_split(text, ' ') AS ws
            FROM documents
        ),
        stats AS (
            SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM base
        ),
        matched AS (
            SELECT doc_id, dl, term
            FROM (SELECT doc_id, dl, unnest(ws) AS term FROM base)
            WHERE term IN ({terms})
        ),
        tf AS (
            SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
            FROM matched GROUP BY doc_id, dl, term
        ),
        df_tab AS (
            SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
            FROM matched GROUP BY term
        ),
        lex_scored AS (
            SELECT
                tf.doc_id,
                sum(CAST(floor(
                    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * (tf.tf * ({BM25_K1} + 1)) / (tf.tf + {BM25_K1}
                       * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
                    * 1000000 + 0.5) AS BIGINT))::BIGINT AS score_micro
            FROM tf JOIN df_tab d USING (term) CROSS JOIN stats s
            WHERE tf.doc_id != 0
            GROUP BY tf.doc_id
        ),
        lex AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY score_micro DESC, doc_id ASC
                   )::BIGINT AS rn_lex
            FROM lex_scored
        ),
        q AS (
            SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
        ),
        dense_scored AS (
            SELECT e.vec_id AS doc_id, {sql_round(cos, 4)} AS cosine
            FROM embeddings e, q
            WHERE e.vec_id != 0
        ),
        dense AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY cosine DESC, doc_id ASC
                   )::BIGINT AS rn_dense
            FROM dense_scored
        )
        SELECT
            coalesce(d.doc_id, l.doc_id) AS doc_id,
            l.rn_lex,
            d.rn_dense,
            {sql_round(
                f"coalesce(1.0 / ({RRF_K} + l.rn_lex), 0.0)"
                f" + coalesce(1.0 / ({RRF_K} + d.rn_dense), 0.0)", 6
            )} AS rrf
        FROM dense d FULL OUTER JOIN lex l USING (doc_id)
        ORDER BY rrf DESC, doc_id ASC
        LIMIT {RRF_TOPK}
    """


ORACLE["hybrid_rrf_topk"] = _hybrid_rrf_oracle()


# ---------------------------------------------------------------------------
# temperature-based source mixing (multilingual-style (share)^alpha recipe)
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.7
MIX_BUDGET_TOKENS = 10_000


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing: target share of source s ∝
    (token_share_s)^α — the standard multilingual/multi-source recipe
    (α < 1 upweights small sources) — realized as a per-doc keep
    probability p_s = min(1, B·q_s / T_s) against a deterministic
    content-hash uniform. Unlike stratified_sample_docs (fixed
    fractions) the probabilities are DERIVED from the corpus itself.

    Scale shape: one narrow pass scores token counts, one groupBy(source)
    builds the share table (rows = #sources, broadcast back), the keep
    decision is a per-row comparison — no other shuffle. p and u round
    to 6 dp before the comparison, mirrored in the oracle, so the keep
    set is engine-exact."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        X.token_count(F.col("text")).cast("double").alias("n_tokens"),
    )
    per_source = scored.groupBy("source").agg(
        F.sum("n_tokens").alias("t_s")
    )
    total = per_source.agg(F.sum("t_s").alias("t_all"))
    powed = per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "t_s",
        F.pow(F.col("t_s") / F.col("t_all"), MIX_ALPHA).alias("w_s"),
    )
    z = powed.agg(F.sum("w_s").alias("z"))
    probs = powed.crossJoin(F.broadcast(z)).select(
        "source",
        pround(
            F.least(
                F.lit(1.0),
                F.lit(MIX_BUDGET_TOKENS)
                * (F.col("w_s") / F.col("z"))
                / F.col("t_s"),
            ),
            6,
        ).alias("p_keep"),
    )
    u = pround(
        F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long")
        / F.lit(_HASH_MAX),
        6,
    )
    return (
        scored.join(F.broadcast(probs), "source")
        .select(
            "doc_id",
            "source",
            u.alias("u"),
            "p_keep",
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .filter(F.col("u") < F.col("p_keep"))
    )


QUERIES["corpus_temperature_mix"] = corpus_temperature_mix

ORACLE["corpus_temperature_mix"] = f"""
    WITH scored AS (
        SELECT doc_id, source, text,
               len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::DOUBLE
                   AS n_tokens
        FROM documents
    ),
    per_source AS (
        SELECT source, sum(n_tokens) AS t_s FROM scored GROUP BY source
    ),
    total AS (SELECT sum(t_s) AS t_all FROM per_source),
    powed AS (
        SELECT source, t_s, pow(t_s / t.t_all, {MIX_ALPHA}) AS w_s
        FROM per_source, total t
    ),
    zt AS (SELECT sum(w_s) AS z FROM powed),
    probs AS (
        SELECT source,
               {sql_round(
                   f"least(1.0, {MIX_BUDGET_TOKENS} * (w_s / zt.z) / t_s)", 6
               )} AS p_keep
        FROM powed, zt
    )
    SELECT
        s.doc_id,
        s.source,
        {sql_round(f"(('0x' || substr(md5(s.text), 1, 8))::BIGINT / {_HASH_MAX})", 6)} AS u,
        p.p_keep,
        s.n_tokens::BIGINT AS n_tokens
    FROM scored s JOIN probs p USING (source)
    WHERE {sql_round(f"(('0x' || substr(md5(s.text), 1, 8))::BIGINT / {_HASH_MAX})", 6)}
          < p.p_keep
"""


# ---------------------------------------------------------------------------
# chunk-granularity retrieval: BM25 over the chunk layer (the RAG shape)
# ---------------------------------------------------------------------------


def _chunk_bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared lexical core of chunk_bm25_topk and chunk_hybrid_rrf_topk:
    (doc_id, chunk_idx, score_micro) for every chunk containing a query
    term."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    words = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(words), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunks = docs.select(
        "doc_id", words.alias("w"), F.explode(starts).alias("start")
    ).select(
        "doc_id",
        (((F.col("start") - 1) / CHUNK_STRIDE).cast("long")).alias(
            "chunk_idx"
        ),
        F.slice(F.col("w"), F.col("start"), CHUNK_WORDS).alias("chunk"),
    )
    # the chunk id is the (doc_id, chunk_idx) pair — the shared
    # functions/retrieval.py math is id-shape-agnostic
    base = chunks.select(
        "doc_id",
        "chunk_idx",
        F.col("chunk").alias("ws"),
        F.size("chunk").cast("double").alias("dl"),
    )
    ids = ["doc_id", "chunk_idx"]
    # df derives from tf — the chunk generator otherwise re-ran for the
    # tf and df legs separately (r16, guide §2.3/§2.4)
    stats, tf, df_tab = R.stats_tf_df(base, BM25_QUERY_TERMS, ids)
    return R.score_tf(
        tf,
        df_tab,
        stats,
        ids,
        with_match_count=False,
    )


def chunk_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 at CHUNK granularity — the actual RAG retrieval unit: the
    corpus is first cut into overlapping windows (the doc_chunking
    layer), then ranked by BM25 against the fixed term query, returning
    (doc, chunk) hits. Composition of two proven layers: the chunk
    explode feeds the postings build directly — chunks never
    materialize outside the pipeline, so the scale cost stays one
    narrow chunk pass + the postings-only shuffle. Same micro-unit
    integer discipline as bm25_topk."""
    return _chunk_bm25_scored(spark, sf_dir).orderBy(
        F.desc("score_micro"), F.asc("doc_id"), F.asc("chunk_idx")
    ).limit(BM25_TOPK)


QUERIES["chunk_bm25_topk"] = chunk_bm25_topk


def _chunk_bm25_ctes() -> str:
    """The shared chunk-BM25 CTE chain (through ``contrib``), used by
    both the chunk-BM25 oracle and the chunk-hybrid oracle — no textual
    splicing between the two."""
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ),
        starts AS (
            SELECT doc_id, words,
                   unnest(generate_series(1, greatest(len(words), 1),
                                          {CHUNK_STRIDE})) AS start
            FROM w
        ),
        base AS (
            SELECT
                doc_id,
                CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
                words[start : start + {CHUNK_WORDS} - 1] AS ws,
                len(words[start : start + {CHUNK_WORDS} - 1])::DOUBLE AS dl
            FROM starts
        ),
        stats AS (
            SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM base
        ),
        matched AS (
            SELECT doc_id, chunk_idx, dl, term
            FROM (
                SELECT doc_id, chunk_idx, dl, unnest(ws) AS term FROM base
            )
            WHERE term IN ({terms})
        ),
        tf AS (
            SELECT doc_id, chunk_idx, dl, term, count(*)::DOUBLE AS tf
            FROM matched GROUP BY doc_id, chunk_idx, dl, term
        ),
        df_tab AS (
            SELECT term, count(*)::DOUBLE AS df
            FROM (SELECT DISTINCT doc_id, chunk_idx, term FROM matched)
            GROUP BY term
        ),
        contrib AS (
            SELECT
                tf.doc_id,
                tf.chunk_idx,
                CAST(floor(
                    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * (tf.tf * ({BM25_K1} + 1)) / (tf.tf + {BM25_K1}
                       * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
                    * 1000000 + 0.5) AS BIGINT) AS c
            FROM tf JOIN df_tab d USING (term) CROSS JOIN stats s
        )"""


def _chunk_bm25_oracle() -> str:
    return f"""
        {_chunk_bm25_ctes()}
        SELECT doc_id, chunk_idx, sum(c)::BIGINT AS score_micro
        FROM contrib
        GROUP BY doc_id, chunk_idx
        ORDER BY score_micro DESC, doc_id ASC, chunk_idx ASC
        LIMIT {BM25_TOPK}
    """


ORACLE["chunk_bm25_topk"] = _chunk_bm25_oracle()


def chunk_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval at CHUNK granularity — what a RAG system
    actually serves: the lexical leg ranks chunks by BM25 against the
    fixed term query (shared core with chunk_bm25_topk), the dense leg
    ranks DOCUMENTS by cosine against document 0's embedding (the
    testdata embeds docs, not chunks — every chunk inherits its parent
    doc's dense rank, the standard granularity bridge), and RRF fuses
    them per chunk: 1/(60+rn_lex) + 1/(60+rn_dense(doc)). Candidates
    are the lexically-matched chunks (a chunk with zero query terms has
    no retrieval unit to serve); a doc outside the dense ranking
    contributes only its lex term.

    Scale shape: both ranks are global row numbers through the
    two-phase ops.global_order layout; the dense leg is a broadcast
    1-row query; attaching the doc-level rank to chunks is a broadcast
    join of the metadata-scale rank relation. Same 6-dp fusion rounding
    as hybrid_rrf_topk."""
    from data_platform_spark.functions import similarity as S
    from data_platform_spark.ops.global_order import global_row_number

    lex_scored = _chunk_bm25_scored(spark, sf_dir).filter(
        F.col("doc_id") != 0
    )
    lex = global_row_number(
        lex_scored,
        [F.desc("score_micro"), F.asc("doc_id"), F.asc("chunk_idx")],
        "rn_lex",
    ).select("doc_id", "chunk_idx", "rn_lex")

    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    qv = emb.filter(F.col("vec_id") == 0).select(
        S.as_double(F.col("embedding")).alias("q")
    )
    dense_scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            pround(
                S.cosine(S.as_double(F.col("embedding")), F.col("q")), 4
            ).alias("cosine"),
        )
    )
    dense = global_row_number(
        dense_scored, [F.desc("cosine"), F.asc("doc_id")], "rn_dense"
    ).select("doc_id", "rn_dense")

    fused = lex.join(F.broadcast(dense), "doc_id", "left").select(
        "doc_id",
        "chunk_idx",
        "rn_lex",
        "rn_dense",
        pround(
            1.0 / (F.lit(RRF_K) + F.col("rn_lex"))
            + F.coalesce(
                1.0 / (F.lit(RRF_K) + F.col("rn_dense")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(
        F.desc("rrf"), F.asc("doc_id"), F.asc("chunk_idx")
    ).limit(RRF_TOPK)


QUERIES["chunk_hybrid_rrf_topk"] = chunk_hybrid_rrf_topk


def _chunk_hybrid_oracle() -> str:
    cos = (
        "list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) / "
        "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
    )
    # lexical chunk CTEs come from the shared chunk-BM25 derivation
    return f"""
        {_chunk_bm25_ctes()},
        lex_scored AS (
            SELECT doc_id, chunk_idx, sum(c)::BIGINT AS score_micro
            FROM contrib
            WHERE doc_id != 0
            GROUP BY doc_id, chunk_idx
        ),
        lex AS (
            SELECT doc_id, chunk_idx,
                   row_number() OVER (
                       ORDER BY score_micro DESC, doc_id ASC, chunk_idx ASC
                   )::BIGINT AS rn_lex
            FROM lex_scored
        ),
        q AS (
            SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
        ),
        dense_scored AS (
            SELECT e.vec_id AS doc_id, {sql_round(cos, 4)} AS cosine
            FROM embeddings e, q
            WHERE e.vec_id != 0
        ),
        dense AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY cosine DESC, doc_id ASC
                   )::BIGINT AS rn_dense
            FROM dense_scored
        )
        SELECT
            l.doc_id,
            l.chunk_idx,
            l.rn_lex,
            d.rn_dense,
            {sql_round(
                f"1.0 / ({RRF_K} + l.rn_lex)"
                f" + coalesce(1.0 / ({RRF_K} + d.rn_dense), 0.0)", 6
            )} AS rrf
        FROM lex l LEFT JOIN dense d USING (doc_id)
        ORDER BY rrf DESC, doc_id ASC, chunk_idx ASC
        LIMIT {RRF_TOPK}
    """


ORACLE["chunk_hybrid_rrf_topk"] = _chunk_hybrid_oracle()


# ---------------------------------------------------------------------------
# classifier evaluation metrics: precision/recall/F1 of the lang-ID heuristic
# ---------------------------------------------------------------------------


def lang_id_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the marker-based language-ID
    heuristic against the labeled lang column — the evaluation layer on
    top of lang_id_confusion (every data-quality classifier in a corpus
    pipeline needs this scorecard). Three metadata-scale aggregates
    (truth counts, prediction counts, diagonal counts) joined on the
    class key; divisions guarded for classes never predicted. One scan,
    three tiny shuffles."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    scored = docs.select(
        "lang", X.predicted_lang(F.col("text")).alias("pred")
    )
    truth = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    pred = scored.groupBy(F.col("pred").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    correct = (
        scored.filter(F.col("lang") == F.col("pred"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_correct"))
    )
    j = (
        truth.join(pred, "lang", "left")
        .join(correct, "lang", "left")
        .select(
            "lang",
            "n_true",
            F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
            F.coalesce(F.col("n_correct"), F.lit(0)).alias("n_correct"),
        )
    )
    precision = F.when(
        F.col("n_pred") > 0, F.col("n_correct") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    recall = F.col("n_correct") / F.col("n_true")
    f1 = F.when(
        (precision + recall) > 0,
        2 * precision * recall / (precision + recall),
    ).otherwise(F.lit(0.0))
    return j.select(
        "lang",
        "n_true",
        "n_pred",
        "n_correct",
        pround(precision, 4).alias("precision"),
        pround(recall, 4).alias("recall"),
        pround(f1, 4).alias("f1"),
    )


QUERIES["lang_id_metrics"] = lang_id_metrics


def _lang_metrics_oracle() -> str:
    score_cols = ",\n                ".join(
        f"{_sql_marker_score(X.LANG_MARKERS[lang])} AS s_{lang}"
        for lang in X.LANG_PRIORITY
    )
    max_expr = (
        "greatest(" + ", ".join(f"s_{l}" for l in X.LANG_PRIORITY) + ")"
    )
    case_branches = "\n                ".join(
        f"WHEN s_{lang} = {max_expr} THEN '{lang}'"
        for lang in X.LANG_PRIORITY[:-1]
    )
    prec = "CASE WHEN n_pred > 0 THEN n_correct * 1.0 / n_pred ELSE 0.0 END"
    rec = "n_correct * 1.0 / n_true"
    f1 = (
        f"CASE WHEN ({prec}) + ({rec}) > 0 "
        f"THEN 2 * ({prec}) * ({rec}) / (({prec}) + ({rec})) ELSE 0.0 END"
    )
    return f"""
        WITH scored AS (
            SELECT lang,
                CASE
                {case_branches}
                ELSE '{X.LANG_PRIORITY[-1]}'
                END AS pred
            FROM (
                SELECT lang,
                {score_cols}
                FROM documents
            )
        ),
        truth AS (
            SELECT lang, count(*)::BIGINT AS n_true FROM scored GROUP BY lang
        ),
        pred AS (
            SELECT pred AS lang, count(*)::BIGINT AS n_pred
            FROM scored GROUP BY pred
        ),
        correct AS (
            SELECT lang, count(*)::BIGINT AS n_correct
            FROM scored WHERE lang = pred GROUP BY lang
        ),
        j AS (
            SELECT t.lang, t.n_true,
                   coalesce(p.n_pred, 0)::BIGINT AS n_pred,
                   coalesce(c.n_correct, 0)::BIGINT AS n_correct
            FROM truth t
            LEFT JOIN pred p USING (lang)
            LEFT JOIN correct c USING (lang)
        )
        SELECT lang, n_true, n_pred, n_correct,
               {sql_round(prec, 4)} AS precision,
               {sql_round(rec, 4)} AS recall,
               {sql_round(f1, 4)} AS f1
        FROM j
    """


ORACLE["lang_id_metrics"] = _lang_metrics_oracle()


# ---------------------------------------------------------------------------
# shard export: cut the corpus into token-balanced output shards
# ---------------------------------------------------------------------------

N_SHARDS = 8


def corpus_shard_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment — the EXPORT stage of a training
    pipeline: documents in stable doc_id order are cut at every
    ceil(total/N) token mark into N contiguous shards, so each output
    shard (file group) carries a near-equal token load regardless of
    document-length skew. The cumulative offset comes from the two-phase
    global running sum; the total is a 1-row broadcast. Output is the
    per-shard summary (docs, tokens) — the balance evidence. The full
    assignment is the same frame before the final groupBy."""
    from data_platform_spark.ops.global_order import global_running_sum

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    scored = docs.select(
        "doc_id",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    cum = global_running_sum(
        scored, [F.asc("doc_id")], F.col("n_tokens"), "cum_tokens"
    )
    total = cum.agg(F.max("cum_tokens").alias("total_tokens"))
    shard_size = F.ceil(F.col("total_tokens") / N_SHARDS)
    # least-clamp: a trailing zero-token doc landing exactly on the total
    # boundary (total divisible by N) would otherwise compute shard == N —
    # a spurious (N+1)-th shard out of the intended 0..N-1 range.
    assigned = cum.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        F.least(
            F.floor(
                (F.col("cum_tokens") - F.col("n_tokens")) / shard_size
            ).cast("long"),
            F.lit(N_SHARDS - 1).cast("long"),
        ).alias("shard"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )


QUERIES["corpus_shard_summary"] = corpus_shard_summary

ORACLE["corpus_shard_summary"] = f"""
    WITH scored AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::BIGINT
                   AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT *,
               CAST(sum(n_tokens) OVER (
                   ORDER BY doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM scored
    ),
    total AS (SELECT max(cum_tokens) AS total_tokens FROM c),
    assigned AS (
        SELECT doc_id, n_tokens,
               least(CAST(floor((cum_tokens - n_tokens) * 1.0 /
                    ceil(t.total_tokens * 1.0 / {N_SHARDS})) AS BIGINT),
                    CAST({N_SHARDS - 1} AS BIGINT))
                   AS shard
        FROM c, total t
    )
    SELECT shard, count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS shard_tokens
    FROM assigned
    GROUP BY shard
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis keys)
# ---------------------------------------------------------------------------

WSAMPLE_K = 100
WSAMPLE_EPS = 0.01  # weight floor: zero-quality docs stay sampleable


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, probability ∝ quality —
    the Efraimidis–Spirakis one-pass construction: each doc draws the
    deterministic content-hash uniform u and keeps key = u^(1/w); the
    top-k keys ARE a weighted sample without replacement. The curation
    primitive between take-the-best (budget sampling) and uniform
    sampling: high-quality docs are favored but not guaranteed.

    Fully distributed: one narrow pass computes keys, top-k is a
    TakeOrdered — no shuffle beyond the final k-row gather. Keys round
    to 6 dp (ties broken by doc_id) identically in the oracle."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    u = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(_HASH_MAX)
    w = X.quality_score(F.col("text")) + F.lit(WSAMPLE_EPS)
    key = pround(F.pow(u, 1.0 / w), 6)
    scored = docs.select(
        "doc_id",
        X.quality_score(F.col("text")).alias("quality"),
        key.alias("es_key"),
    )
    return scored.orderBy(F.desc("es_key"), F.asc("doc_id")).limit(WSAMPLE_K)


QUERIES["quality_weighted_sample"] = quality_weighted_sample


def _wsample_oracle() -> str:
    u = f"(('0x' || substr(md5(text), 1, 8))::BIGINT / {_HASH_MAX})"
    q = quality_sql()
    return f"""
        SELECT doc_id,
               {q} AS quality,
               {sql_round(f"pow({u}, 1.0 / (({q}) + {WSAMPLE_EPS}))", 6)}
                   AS es_key
        FROM documents
        ORDER BY es_key DESC, doc_id ASC
        LIMIT {WSAMPLE_K}
    """


ORACLE["quality_weighted_sample"] = _wsample_oracle()


# ---------------------------------------------------------------------------
# per-source rank normalization (quantile-normalized quality)
# ---------------------------------------------------------------------------


def quality_percentile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-normalized quality WITHIN each source: a doc's percentile
    among its own source's quality distribution — the normalization that
    makes quality thresholds comparable across sources whose raw score
    distributions differ (forum text vs books score on different
    scales). Percentile = (row_number - 1) / (n_source - 1) under the
    total order (quality, doc_id); singleton sources pin to 0.

    Skew-safe by construction: the within-source rank rides
    ops.global_order.grouped_running_sum (range partition over
    (source, order) — a dominant source spans many partitions, never one
    task), and per-source counts are a metadata-scale broadcast."""
    from data_platform_spark.ops.global_order import grouped_running_sum

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    scored = docs.select(
        "doc_id",
        "source",
        X.quality_score(F.col("text")).alias("quality"),
    )
    ranked = grouped_running_sum(
        scored,
        ["source"],
        [F.asc("quality"), F.asc("doc_id")],
        F.lit(1).cast("long"),
        "rn",
    )
    counts = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_source")
    )
    j = ranked.join(F.broadcast(counts), "source")
    pct = F.when(
        F.col("n_source") > 1,
        (F.col("rn") - 1) / (F.col("n_source") - 1),
    ).otherwise(F.lit(0.0))
    return j.select(
        "doc_id",
        "source",
        "quality",
        pround(pct, 6).alias("quality_pct"),
    )


QUERIES["quality_percentile_by_source"] = quality_percentile_by_source

ORACLE["quality_percentile_by_source"] = f"""
    WITH scored AS (
        SELECT doc_id, source, {{q}} AS quality
        FROM documents
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY source ORDER BY quality ASC, doc_id ASC
               )::BIGINT AS rn,
               count(*) OVER (PARTITION BY source)::BIGINT AS n_source
        FROM scored
    )
    SELECT doc_id, source, quality,
           {sql_round(
               "CASE WHEN n_source > 1 "
               "THEN (rn - 1) * 1.0 / (n_source - 1) ELSE 0.0 END", 6
           )} AS quality_pct
    FROM ranked
""".replace("{q}", quality_sql())


# ---------------------------------------------------------------------------
# Gopher-style quality-rule funnel: sequential rule rejection accounting
# ---------------------------------------------------------------------------

FUNNEL_MIN_WORDS = 20
FUNNEL_MAX_WORDS = 90
FUNNEL_MIN_AWL = 4.2     # mean word length bounds (symbol soup / spam)
FUNNEL_MAX_AWL = 10.0
FUNNEL_MAX_DUP_TG = 0.02  # duplicate-trigram fraction ceiling
FUNNEL_MAX_STOP = 0.12    # stopword-ratio ceiling
FUNNEL_STOPS = ("a", "the")


def quality_rule_flag_cols():
    """The four funnel rule flags as boolean expressions over a ``text``
    column — the single source of truth shared by quality_rule_funnel
    and curation_pipeline_summary (``_funnel_flag_sql`` is the oracle
    twin). Every compared quantity rounds to 6 dp before the threshold
    test, so a flag cannot flip across engines."""
    ws = F.split(F.col("text"), " ")
    n_w = F.size(ws)
    awl = pround(
        F.length(F.regexp_replace(F.col("text"), " ", "")) / n_w, 6
    )
    tg = F.expr(
        "CASE WHEN size(split(text, ' ')) < 3 THEN array() "
        "ELSE transform(sequence(0, size(split(text, ' ')) - 3), "
        "i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], "
        "split(text, ' ')[i+2])) END"
    )
    dup_tg = pround(
        F.lit(1.0) - F.size(F.array_distinct(tg)) / F.size(tg), 6
    )
    stop_ratio = pround(
        F.size(F.filter(ws, lambda x: x.isin(*FUNNEL_STOPS))) / n_w, 6
    )
    return (
        (n_w >= FUNNEL_MIN_WORDS) & (n_w <= FUNNEL_MAX_WORDS),
        (awl >= FUNNEL_MIN_AWL) & (awl <= FUNNEL_MAX_AWL),
        dup_tg <= FUNNEL_MAX_DUP_TG,
        stop_ratio <= FUNNEL_MAX_STOP,
    )


def _funnel_flag_sql() -> tuple[str, str, str, str]:
    """Oracle twins of quality_rule_flag_cols, phrased over CTE columns
    ``ws`` (word array), ``tg`` (trigram array) and ``text``."""
    stops = ", ".join(f"'{s}'" for s in FUNNEL_STOPS)
    awl = sql_round("length(replace(text, ' ', '')) * 1.0 / len(ws)", 6)
    dup_tg = sql_round("1.0 - len(list_distinct(tg)) * 1.0 / len(tg)", 6)
    stop_r = sql_round(
        f"len(list_filter(ws, x -> x IN ({stops}))) * 1.0 / len(ws)", 6
    )
    return (
        f"len(ws) BETWEEN {FUNNEL_MIN_WORDS} AND {FUNNEL_MAX_WORDS}",
        f"{awl} BETWEEN {FUNNEL_MIN_AWL} AND {FUNNEL_MAX_AWL}",
        f"{dup_tg} <= {FUNNEL_MAX_DUP_TG}",
        f"{stop_r} <= {FUNNEL_MAX_STOP}",
    )


def quality_rule_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality filter FUNNEL (the Gopher-rules shape): each
    doc is tested against an ordered rule list — word-count bounds, mean
    word length bounds, duplicate-trigram ceiling, stopword-ratio
    ceiling — and the output accounts, per rule, how many docs the rule
    rejected AMONG THE SURVIVORS of the earlier rules and how many
    survive cumulatively. The report every curation pipeline publishes
    with a corpus release ("N removed by rule R").

    One narrow scan computes all flags (codegen'd array expressions, no
    shuffle); the funnel is a single aggregate row unpivoted with
    stack()."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    r1, r2, r3, r4 = quality_rule_flag_cols()
    flags = docs.select(
        r1.alias("r1"), r2.alias("r2"), r3.alias("r3"), r4.alias("r4")
    )
    b = lambda c: c.cast("int")  # noqa: E731
    agg = flags.agg(
        F.sum(b(~F.col("r1"))).alias("f1"),
        F.sum(b(F.col("r1"))).alias("s1"),
        F.sum(b(F.col("r1") & ~F.col("r2"))).alias("f2"),
        F.sum(b(F.col("r1") & F.col("r2"))).alias("s2"),
        F.sum(b(F.col("r1") & F.col("r2") & ~F.col("r3"))).alias("f3"),
        F.sum(b(F.col("r1") & F.col("r2") & F.col("r3"))).alias("s3"),
        F.sum(
            b(F.col("r1") & F.col("r2") & F.col("r3") & ~F.col("r4"))
        ).alias("f4"),
        F.sum(
            b(F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4"))
        ).alias("s4"),
    )
    return agg.select(
        F.expr(
            "stack(4, "
            "'word_count', f1, s1, "
            "'avg_word_len', f2, s2, "
            "'dup_trigrams', f3, s3, "
            "'stopword_ratio', f4, s4) AS (rule, n_rejected, n_surviving)"
        )
    ).select(
        "rule",
        F.col("n_rejected").cast("long").alias("n_rejected"),
        F.col("n_surviving").cast("long").alias("n_surviving"),
    )


QUERIES["quality_rule_funnel"] = quality_rule_funnel


def _funnel_oracle() -> str:
    r1, r2, r3, r4 = _funnel_flag_sql()
    return f"""
        WITH w AS (
            SELECT doc_id, text, string_split(text, ' ') AS ws
            FROM documents
        ),
        t AS (
            SELECT *,
                   CASE WHEN len(ws) < 3 THEN []::VARCHAR[]
                        ELSE list_transform(range(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                   END AS tg
            FROM w
        ),
        flags AS (
            SELECT
                {r1} AS r1,
                {r2} AS r2,
                {r3} AS r3,
                {r4} AS r4
            FROM t
        )
        SELECT 'word_count' AS rule,
               sum(CASE WHEN NOT r1 THEN 1 ELSE 0 END)::BIGINT AS n_rejected,
               sum(CASE WHEN r1 THEN 1 ELSE 0 END)::BIGINT AS n_surviving
        FROM flags
        UNION ALL
        SELECT 'avg_word_len',
               sum(CASE WHEN r1 AND NOT r2 THEN 1 ELSE 0 END)::BIGINT,
               sum(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END)::BIGINT
        FROM flags
        UNION ALL
        SELECT 'dup_trigrams',
               sum(CASE WHEN r1 AND r2 AND NOT r3 THEN 1 ELSE 0 END)::BIGINT,
               sum(CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END)::BIGINT
        FROM flags
        UNION ALL
        SELECT 'stopword_ratio',
               sum(CASE WHEN r1 AND r2 AND r3 AND NOT r4 THEN 1 ELSE 0 END)::BIGINT,
               sum(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END)::BIGINT
        FROM flags
    """


ORACLE["quality_rule_funnel"] = _funnel_oracle()


# ---------------------------------------------------------------------------
# vocabulary drift between corpus halves (ingest-batch monitoring)
# ---------------------------------------------------------------------------

DRIFT_TOPK = 20


def corpus_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between two corpus slices (even vs odd doc_id —
    the stand-in for yesterday's vs today's ingest): add-1-smoothed
    unigram probabilities on each side over the shared vocabulary, top-k
    terms by absolute probability shift. The monitor that catches a
    scraper suddenly pulling a different site mix before the tokenizer
    or the loss curve does.

    One token explode → one groupBy(term) with conditional partial sums
    (both sides in a single shuffle); totals and vocabulary size are a
    1-row broadcast. Probabilities round to 6 dp before differencing,
    delta re-rounds — bit-identical cross-engine."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        (F.col("doc_id") % 2 == 0).alias("is_a"),
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("n_b"),
    )
    totals = counts.agg(
        F.sum("n_a").alias("tot_a"),
        F.sum("n_b").alias("tot_b"),
        F.count(F.lit(1)).alias("v"),
    )
    p_a = pround(
        (F.col("n_a") + 1) / (F.col("tot_a") + F.col("v")), 6
    )
    p_b = pround(
        (F.col("n_b") + 1) / (F.col("tot_b") + F.col("v")), 6
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        p_a.alias("p_a"),
        p_b.alias("p_b"),
    )
    delta = pround(F.abs(F.col("p_a") - F.col("p_b")), 6)
    return (
        scored.withColumn("delta", delta)
        .orderBy(F.desc("delta"), F.asc("term"))
        .limit(DRIFT_TOPK)
    )


QUERIES["corpus_vocab_drift"] = corpus_vocab_drift

ORACLE["corpus_vocab_drift"] = f"""
    WITH toks AS (
        SELECT doc_id % 2 = 0 AS is_a, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    counts AS (
        SELECT term,
               sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n_b
        FROM toks GROUP BY term
    ),
    totals AS (
        SELECT sum(n_a) AS tot_a, sum(n_b) AS tot_b, count(*) AS v
        FROM counts
    ),
    scored AS (
        SELECT term,
               n_a::BIGINT AS n_a,
               n_b::BIGINT AS n_b,
               {sql_round("(n_a + 1) * 1.0 / (t.tot_a + t.v)", 6)} AS p_a,
               {sql_round("(n_b + 1) * 1.0 / (t.tot_b + t.v)", 6)} AS p_b
        FROM counts, totals t
    )
    SELECT term, n_a, n_b, p_a, p_b,
           {sql_round("abs(p_a - p_b)", 6)} AS delta
    FROM scored
    ORDER BY delta DESC, term ASC
    LIMIT {DRIFT_TOPK}
"""


# ---------------------------------------------------------------------------
# term co-occurrence PMI: collocation mining over the document corpus
# ---------------------------------------------------------------------------

PMI_MIN_PAIR_DOCS = 20  # support floor: pairs seen in fewer docs are noise
PMI_TOPK = 20


def term_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top document-level term pairs by pointwise
    mutual information — PMI = ln(p(a,b) / (p(a)·p(b))) with document
    frequencies as the probability estimates and a support floor
    (pairs co-occurring in < PMI_MIN_PAIR_DOCS docs are excluded; raw
    PMI famously explodes on rare pairs). The phrase-discovery /
    tokenizer-hinting primitive.

    Scale shape: the pair space is generated per document from its
    DISTINCT term set (array self-pairing inside codegen, a<b dedup),
    so the explode is bounded by (distinct terms/doc)² — never corpus²;
    the groupBy(a, b) aggregate map-side combines; df and totals
    broadcast. At web scale the standard refinement caps the per-doc
    term set by document frequency first (drop ubiquitous terms), which
    shrinks the quadratic factor — the support floor here plays that
    role at test scale."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    terms = F.array_distinct(F.split(F.col("text"), " "))
    base = docs.select("doc_id", terms.alias("ts"))
    n_docs = base.agg(F.count(F.lit(1)).cast("double").alias("n"))
    df_tab = base.select(
        "doc_id", F.explode("ts").alias("term")
    ).groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    pairs = base.select(
        "doc_id",
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("ts"),
                        lambda a: F.transform(
                            F.col("ts"), lambda b: F.struct(
                                a.alias("a"), b.alias("b")
                            )
                        ),
                    )
                ),
                lambda p: p["a"] < p["b"],
            )
        ).alias("p"),
    ).select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
    pair_df = pairs.groupBy("term_a", "term_b").agg(
        F.count(F.lit(1)).alias("n_ab")
    ).filter(F.col("n_ab") >= PMI_MIN_PAIR_DOCS)
    joined = (
        pair_df.join(
            F.broadcast(df_tab.withColumnRenamed("term", "term_a")
                        .withColumnRenamed("df", "df_a")),
            "term_a",
        )
        .join(
            F.broadcast(df_tab.withColumnRenamed("term", "term_b")
                        .withColumnRenamed("df", "df_b")),
            "term_b",
        )
        .crossJoin(F.broadcast(n_docs))
    )
    pmi = pround(
        F.log(
            (F.col("n_ab") / F.col("n"))
            / ((F.col("df_a") / F.col("n")) * (F.col("df_b") / F.col("n")))
        ),
        6,
    )
    return joined.select(
        "term_a",
        "term_b",
        F.col("n_ab").cast("long").alias("n_ab"),
        F.col("df_a").cast("long").alias("df_a"),
        F.col("df_b").cast("long").alias("df_b"),
        pmi.alias("pmi"),
    ).orderBy(
        F.desc("pmi"), F.asc("term_a"), F.asc("term_b")
    ).limit(PMI_TOPK)


QUERIES["term_cooccurrence_pmi"] = term_cooccurrence_pmi

ORACLE["term_cooccurrence_pmi"] = f"""
    WITH base AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
        FROM documents
    ),
    n_docs AS (SELECT count(*)::DOUBLE AS n FROM base),
    df_tab AS (
        SELECT term, count(*) AS df
        FROM (SELECT doc_id, unnest(ts) AS term FROM base)
        GROUP BY term
    ),
    pairs AS (
        SELECT a.term_a, b.term_b
        FROM (SELECT doc_id, unnest(ts) AS term_a FROM base) a
        JOIN (SELECT doc_id, unnest(ts) AS term_b FROM base) b
          ON a.doc_id = b.doc_id AND a.term_a < b.term_b
    ),
    pair_df AS (
        SELECT term_a, term_b, count(*) AS n_ab
        FROM pairs GROUP BY term_a, term_b
        HAVING count(*) >= {PMI_MIN_PAIR_DOCS}
    )
    SELECT
        p.term_a, p.term_b,
        p.n_ab::BIGINT AS n_ab,
        da.df::BIGINT AS df_a,
        db.df::BIGINT AS df_b,
        {sql_round(
            "ln((p.n_ab / n.n) / ((da.df / n.n) * (db.df / n.n)))", 6
        )} AS pmi
    FROM pair_df p
    JOIN df_tab da ON da.term = p.term_a
    JOIN df_tab db ON db.term = p.term_b
    CROSS JOIN n_docs n
    ORDER BY pmi DESC, term_a ASC, term_b ASC
    LIMIT {PMI_TOPK}
"""


def source_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length distribution: exact p50/p90/p99 token
    counts plus doc and token totals — the dataset-card table readers
    check first (a source whose p99 collapses after a scraper change is
    the classic silent regression). Exact interpolated percentiles via
    the two-phase grouped layout (ops.global_order.grouped_percentile):
    the source DOMAIN is bounded but a single source's row count is
    not — one crawl source holds billions of docs at 100 TB, and the
    exact ``percentile()`` aggregate would buffer every one of its
    values in a single aggregator (VERDICT r7 #1). The grouped layout
    range-partitions each source's sorted values across many tasks and
    interpolates from global ranks — same exact result, no unbounded
    buffer."""
    from data_platform_spark.ops.global_order import grouped_percentile

    from data_platform_spark.cache import scoped_persist

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    # (source, n_tokens) is two narrow columns per doc and feeds BOTH
    # the totals and the percentile rank phase — persist so the token
    # regex (the expensive per-row stage) runs once
    scored = scoped_persist(
        docs.select(
            "source",
            X.token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
    )
    base = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    pct = grouped_percentile(
        scored, ["source"], "n_tokens", {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    )
    return base.join(pct, on="source", how="left").select(
        "source",
        "n_docs",
        "total_tokens",
        pround(F.col("p50"), 4).alias("p50_tokens"),
        pround(F.col("p90"), 4).alias("p90_tokens"),
        pround(F.col("p99"), 4).alias("p99_tokens"),
    )


QUERIES["source_token_percentiles"] = source_token_percentiles

ORACLE["source_token_percentiles"] = f"""
    WITH scored AS (
        SELECT source,
               len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::BIGINT
                   AS n_tokens
        FROM documents
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens,
           {sql_round("quantile_cont(n_tokens, 0.5)", 4)} AS p50_tokens,
           {sql_round("quantile_cont(n_tokens, 0.9)", 4)} AS p90_tokens,
           {sql_round("quantile_cont(n_tokens, 0.99)", 4)} AS p99_tokens
    FROM scored
    GROUP BY source
"""


BURSTINESS_MIN_DF = 3
BURSTINESS_TOPK = 25


def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness: mean occurrences per CONTAINING doc
    (tf/df) for terms above a document-frequency floor, top-k. A bursty
    term (high tf/df) concentrates in few docs — boilerplate, code, or
    topical jargon — while function words spread evenly (tf/df ≈ tf/N);
    the signal complements IDF for template detection in crawl data.
    Two shuffles (term totals + distinct-doc counts folded in ONE
    groupBy over (doc, term) partial counts), then a global top-k
    (TakeOrdered, no full sort)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    per_doc = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    stats = per_doc.groupBy("term").agg(
        F.sum("tf_doc").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    out = stats.filter(F.col("df") >= BURSTINESS_MIN_DF).select(
        "term",
        "tf",
        "df",
        pround(F.col("tf") / F.col("df"), 6).alias("burstiness"),
    )
    return out.orderBy(
        F.desc("burstiness"), F.asc("term")
    ).limit(BURSTINESS_TOPK)


QUERIES["term_burstiness"] = term_burstiness

ORACLE["term_burstiness"] = f"""
    WITH per_doc AS (
        SELECT doc_id, term, count(*)::BIGINT AS tf_doc
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        )
        GROUP BY doc_id, term
    ),
    stats AS (
        SELECT term,
               sum(tf_doc)::BIGINT AS tf,
               count(*)::BIGINT AS df
        FROM per_doc GROUP BY term
    )
    SELECT term, tf, df,
           {sql_round("tf * 1.0 / df", 6)} AS burstiness
    FROM stats
    WHERE df >= {BURSTINESS_MIN_DF}
    ORDER BY burstiness DESC, term ASC
    LIMIT {BURSTINESS_TOPK}
"""


SENT_REGEX = "[.!?]+"
ALNUM_REGEX = "[A-Za-z0-9]"


def doc_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Automated Readability Index — the cheap quality signal
    corpus filters cut on before any model-based scoring: ARI =
    4.71·(chars/words) + 0.5·(words/sentences) − 21.43 over alnum chars,
    regex tokens and terminator-run sentence counts. Pure projection
    (regexp counts, no shuffle at all until the sink); NULL where a doc
    has no words or no sentence terminator (score undefined, filters
    treat as reject)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    n_chars = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(ALNUM_REGEX), 0)
    ).cast("long")
    n_words = X.token_count(F.col("text")).cast("long")
    n_sents = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(SENT_REGEX), 0)
    ).cast("long")
    ari = (
        F.lit(4.71) * (n_chars / n_words)
        + F.lit(0.5) * (n_words / n_sents)
        - F.lit(21.43)
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_alnum_chars"),
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        F.when((n_words > 0) & (n_sents > 0), pround(ari, 4)).alias("ari"),
    )


QUERIES["doc_readability_scores"] = doc_readability_scores

ORACLE["doc_readability_scores"] = f"""
    WITH base AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{ALNUM_REGEX}'))::BIGINT
                   AS n_alnum_chars,
               len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::BIGINT
                   AS n_words,
               len(regexp_extract_all(text, '{SENT_REGEX}'))::BIGINT
                   AS n_sentences
        FROM documents
    )
    SELECT doc_id, n_alnum_chars, n_words, n_sentences,
           CASE WHEN n_words > 0 AND n_sentences > 0 THEN
               {sql_round(
                   "4.71 * (n_alnum_chars * 1.0 / n_words)"
                   " + 0.5 * (n_words * 1.0 / n_sentences) - 21.43", 4
               )}
           END AS ari
    FROM base
"""


# ---------------------------------------------------------------------------
# round 9: retrieval-leg agreement, char entropy, bigram-LM scoring
# ---------------------------------------------------------------------------

AGREEMENT_KS = [5, 10, 20]


def hybrid_leg_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-eval diagnostic for the hybrid stack: how much do the
    lexical (BM25) and dense (cosine) rankings AGREE at the top? For
    each cutoff k: the size of each leg's top-k (< k when a leg ranks
    fewer docs), the overlap, and the Jaccard of the two top-k sets.
    Near-zero overlap means the legs retrieve complementary documents
    (fusion helps most); near-total overlap means the dense leg adds
    little over BM25 — the first question a retrieval eval answers.

    Scale shape: both legs reuse the exact ranking derivations of
    hybrid_rrf_topk (two-phase global row numbers — no single-partition
    window), the cutoffs fan out from a 3-literal array explode over
    the already-ranked fused relation, and every agreement number is an
    integer count until the final single-division Jaccard (6 dp both
    engines)."""
    from data_platform_spark.functions import similarity as S
    from data_platform_spark.ops.global_order import global_row_number

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    base = R.token_base(docs, ["doc_id"])
    # df derives from tf (r16, guide §2.3/§2.4; no exchange reuse —
    # see stats_tf_df's docstring)
    stats, tf, df_tab = R.stats_tf_df(base, BM25_QUERY_TERMS, ["doc_id"])
    lex_scored = R.score_tf(
        tf,
        df_tab,
        stats,
        ["doc_id"],
        with_match_count=False,
    ).filter(F.col("doc_id") != 0)
    lex = global_row_number(
        lex_scored, [F.desc("score_micro"), F.asc("doc_id")], "rn_lex"
    ).select("doc_id", "rn_lex")

    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    qv = emb.filter(F.col("vec_id") == 0).select(
        S.as_double(F.col("embedding")).alias("q")
    )
    dense_scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            pround(
                S.cosine(S.as_double(F.col("embedding")), F.col("q")), 4
            ).alias("cosine"),
        )
    )
    dense = global_row_number(
        dense_scored, [F.desc("cosine"), F.asc("doc_id")], "rn_dense"
    ).select("doc_id", "rn_dense")

    fused = dense.join(lex, "doc_id", "full_outer")
    ks = F.explode(
        F.array(*[F.lit(k) for k in AGREEMENT_KS])
    ).alias("k")
    per_k = fused.select("rn_lex", "rn_dense", ks).groupBy("k").agg(
        F.sum(
            F.when(F.col("rn_lex") <= F.col("k"), 1).otherwise(0)
        ).cast("long").alias("n_lex"),
        F.sum(
            F.when(F.col("rn_dense") <= F.col("k"), 1).otherwise(0)
        ).cast("long").alias("n_dense"),
        F.sum(
            F.when(
                (F.col("rn_lex") <= F.col("k"))
                & (F.col("rn_dense") <= F.col("k")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_common"),
    )
    return per_k.select(
        "k",
        "n_lex",
        "n_dense",
        "n_common",
        pround(
            F.col("n_common")
            / (F.col("n_lex") + F.col("n_dense") - F.col("n_common")),
            6,
        ).alias("topk_jaccard"),
    )


QUERIES["hybrid_leg_agreement"] = hybrid_leg_agreement


def _hybrid_leg_agreement_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    ks = ", ".join(str(k) for k in AGREEMENT_KS)
    cos = (
        "list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) / "
        "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
    )
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len(string_split(text, ' '))::DOUBLE AS dl,
                   string_split(text, ' ') AS ws
            FROM documents
        ),
        stats AS (
            SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM base
        ),
        matched AS (
            SELECT doc_id, dl, term
            FROM (SELECT doc_id, dl, unnest(ws) AS term FROM base)
            WHERE term IN ({terms})
        ),
        tf AS (
            SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
            FROM matched GROUP BY doc_id, dl, term
        ),
        df_tab AS (
            SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
            FROM matched GROUP BY term
        ),
        lex_scored AS (
            SELECT
                tf.doc_id,
                sum(CAST(floor(
                    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * (tf.tf * ({BM25_K1} + 1)) / (tf.tf + {BM25_K1}
                       * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
                    * 1000000 + 0.5) AS BIGINT))::BIGINT AS score_micro
            FROM tf JOIN df_tab d USING (term) CROSS JOIN stats s
            WHERE tf.doc_id != 0
            GROUP BY tf.doc_id
        ),
        lex AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY score_micro DESC, doc_id ASC
                   )::BIGINT AS rn_lex
            FROM lex_scored
        ),
        q AS (
            SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
        ),
        dense_scored AS (
            SELECT e.vec_id AS doc_id, {sql_round(cos, 4)} AS cosine
            FROM embeddings e, q
            WHERE e.vec_id != 0
        ),
        dense AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY cosine DESC, doc_id ASC
                   )::BIGINT AS rn_dense
            FROM dense_scored
        ),
        fused AS (
            SELECT coalesce(d.doc_id, l.doc_id) AS doc_id,
                   l.rn_lex, d.rn_dense
            FROM dense d FULL OUTER JOIN lex l USING (doc_id)
        ),
        per_k AS (
            SELECT k.k,
                   sum(CASE WHEN rn_lex <= k.k THEN 1 ELSE 0 END)::BIGINT
                       AS n_lex,
                   sum(CASE WHEN rn_dense <= k.k THEN 1 ELSE 0 END)::BIGINT
                       AS n_dense,
                   sum(CASE WHEN rn_lex <= k.k AND rn_dense <= k.k
                            THEN 1 ELSE 0 END)::BIGINT AS n_common
            FROM fused CROSS JOIN (SELECT unnest([{ks}]) AS k) k
            GROUP BY k.k
        )
        SELECT k::INT AS k, n_lex, n_dense, n_common,
               {sql_round(
                   "n_common * 1.0 / (n_lex + n_dense - n_common)", 6
               )} AS topk_jaccard
        FROM per_k
    """


ORACLE["hybrid_leg_agreement"] = _hybrid_leg_agreement_oracle()


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (NATS): the
    compressibility/gibberish signal — boilerplate and repeated
    padding sit low, base64/random blobs sit near the alphabet's
    maximum; a standard cheap quality feature next to doc_quality.

    Determinism: each character class contributes
    floor(p·ln(p)·1e6 + 0.5) MICRO-NATS — an integer — before the
    per-doc sum, so the aggregate is order-independent (the BM25
    discipline); entropy_micro = −sum. Characters enumerate via
    substr(text, i, 1) in both engines (no split-on-empty edge
    cases)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    chars = docs.select(
        "doc_id",
        F.length("text").alias("n"),
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)), "
                "i -> substring(text, i, 1))"
            )
        ).alias("ch"),
    ).filter(F.col("n") > 0)
    counts = chars.groupBy("doc_id", "n", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    p = F.col("cnt") / F.col("n")
    contrib = F.floor(p * F.log(p) * 1_000_000 + F.lit(0.5)).cast("long")
    return counts.groupBy("doc_id").agg(
        F.first("n").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        (-F.sum(contrib)).alias("entropy_micro"),
    )


QUERIES["doc_char_entropy"] = doc_char_entropy

ORACLE["doc_char_entropy"] = """
    WITH chars AS (
        SELECT doc_id, length(text)::BIGINT AS n,
               unnest(list_transform(range(1, length(text) + 1),
                                     i -> substr(text, i, 1))) AS ch
        FROM documents
        WHERE length(text) > 0
    ),
    counts AS (
        SELECT doc_id, n, ch, count(*)::DOUBLE AS cnt
        FROM chars GROUP BY doc_id, n, ch
    )
    SELECT doc_id,
           any_value(n) AS n_chars,
           count(*)::BIGINT AS n_distinct_chars,
           (-sum(CAST(floor((cnt / n) * ln(cnt / n) * 1000000 + 0.5)
                      AS BIGINT)))::BIGINT AS entropy_micro
    FROM counts
    GROUP BY doc_id
"""


def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under an add-one-
    smoothed corpus bigram LM — the CCNet-style LM-quality filter one
    step up from doc_unigram_logprob: word-salad documents whose
    unigrams look normal still score low because their TRANSITIONS are
    rare. P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V); docs with fewer
    than two tokens have no bigrams and are excluded.

    Determinism: each bigram contributes floor(ln(P)·1e6 + 0.5)
    micro-nats (integer) before the per-doc sum; the mean is one
    LONG/LONG division, 4 dp. Scale shape: two token-level groupBys
    build the LM (bigram + unigram counts, both corpus-bounded
    relations), the scoring join is bigram→LM (broadcast-ineligible at
    scale but key-partitioned), no windows."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    ws = F.split(F.col("text"), " ")
    big = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> struct(split(text, ' ')[i - 1] AS w1, "
                "split(text, ' ')[i] AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = docs.select(F.explode(ws).alias("w1")).groupBy("w1").agg(
        F.count(F.lit(1)).cast("double").alias("c1")
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    bgc = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c12")
    )
    scored = (
        big.join(bgc, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))
                * 1_000_000
                + F.lit(0.5)
            ).cast("long").alias("lp_micro"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lp_micro").alias("sum_lp_micro"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        pround(F.col("sum_lp_micro") / F.col("n_bigrams") / 1_000_000, 4)
        .alias("avg_logprob"),
    )


QUERIES["doc_bigram_logprob"] = doc_bigram_logprob

ORACLE["doc_bigram_logprob"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    big AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                      i -> {'w1': ws[i], 'w2': ws[i + 1]}),
                      recursive := true)
        FROM toks
    ),
    uni AS (
        SELECT w1, count(*)::DOUBLE AS c1
        FROM (SELECT unnest(ws) AS w1 FROM toks)
        GROUP BY w1
    ),
    vocab AS (SELECT count(*)::DOUBLE AS v FROM uni),
    bgc AS (
        SELECT w1, w2, count(*)::DOUBLE AS c12
        FROM big GROUP BY w1, w2
    ),
    scored AS (
        SELECT big.doc_id,
               CAST(floor(ln((bgc.c12 + 1.0) / (uni.c1 + vocab.v))
                          * 1000000 + 0.5) AS BIGINT) AS lp_micro
        FROM big
        JOIN bgc USING (w1, w2)
        JOIN uni USING (w1)
        CROSS JOIN vocab
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_bigrams,
           floor((sum(lp_micro) * 1.0 / count(*) / 1000000) * 10000 + 0.5)
               / 10000 AS avg_logprob
    FROM scored
    GROUP BY doc_id
"""


def source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift audit per source: KL divergence of each
    source's unigram term distribution from the corpus-wide
    distribution, plus token and vocabulary totals — the mix-drift
    signal a data-curation loop monitors (a crawl source whose KL
    jumps between snapshots changed its content mix even when volume
    held steady). KL(s ‖ corpus) = Σ_t (c_st/T_s)·ln((c_st·T)/(T_s·c_t));
    every term a source holds exists in the corpus, so no term needs
    smoothing.

    Determinism: each (source, term) contributes
    floor(c_st·ln(ratio)·1e6 + 0.5) integer micro-nats before the
    per-source LONG sum (order-independent); one final /1e6/T_s
    division, 6 dp. Scale shape: token-level groupBys build the two
    count relations; the scoring join is (source,term)→corpus-term,
    key-partitioned on the term; per-source totals are a
    bounded-domain broadcast."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    st = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c_st")
    )
    ct = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c_t")
    )
    ts = st.groupBy("source").agg(
        F.sum("c_st").alias("t_s"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    tot = ts.agg(F.sum("t_s").alias("t"))
    contrib = (
        st.join(ct, "term")
        .join(F.broadcast(ts.select("source", "t_s")), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.floor(
                F.col("c_st")
                # double-first products: c_st·T and T_s·c_t overflow LONG
                # at ~1e13-token corpora; below 2^53 the double product is
                # the exact integer, so the gate hash is unchanged
                * F.log(
                    (
                        F.col("c_st").cast("double")
                        * F.col("t").cast("double")
                    )
                    / (
                        F.col("t_s").cast("double")
                        * F.col("c_t").cast("double")
                    )
                )
                * 1_000_000
                + F.lit(0.5)
            ).cast("long").alias("kl_micro"),
        )
    )
    agg = contrib.groupBy("source").agg(
        F.sum("kl_micro").alias("sum_kl_micro")
    )
    return agg.join(F.broadcast(ts), "source").select(
        "source",
        F.col("t_s").cast("long").alias("n_tokens"),
        "n_terms",
        pround(
            F.col("sum_kl_micro") / F.lit(1_000_000.0) / F.col("t_s"), 6
        ).alias("kl_from_corpus"),
    )


QUERIES["source_unigram_kl"] = source_unigram_kl

ORACLE["source_unigram_kl"] = f"""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    st AS (
        SELECT source, term, count(*)::BIGINT AS c_st
        FROM toks GROUP BY source, term
    ),
    ct AS (
        SELECT term, count(*)::BIGINT AS c_t FROM toks GROUP BY term
    ),
    ts AS (
        SELECT source, sum(c_st)::BIGINT AS t_s,
               count(*)::BIGINT AS n_terms
        FROM st GROUP BY source
    ),
    tot AS (SELECT sum(t_s)::BIGINT AS t FROM ts),
    contrib AS (
        SELECT st.source,
               CAST(floor(
                   st.c_st * ln((st.c_st::DOUBLE * tot.t::DOUBLE)
                                / (ts.t_s::DOUBLE * ct.c_t::DOUBLE))
                   * 1000000 + 0.5) AS BIGINT) AS kl_micro
        FROM st
        JOIN ct USING (term)
        JOIN ts USING (source)
        CROSS JOIN tot
    )
    SELECT ts.source,
           ts.t_s AS n_tokens,
           ts.n_terms,
           {sql_round("sum(c.kl_micro) / 1000000.0 / ts.t_s", 6)}
               AS kl_from_corpus
    FROM contrib c JOIN ts ON ts.source = c.source
    GROUP BY ts.source, ts.t_s, ts.n_terms
"""


def doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio (distinct
    words / words) and the share of tokens that are corpus hapax
    legomena (words occurring exactly once in the whole corpus) — the
    twin screens for template boilerplate (TTR collapses) and
    OCR/gibberish noise (hapax share inflates: garbage strings are
    globally unique).

    Scale shape: one token-level corpus count relation, a token→count
    key-partitioned join, and one per-doc aggregate; counts are exact
    LONGs, ratios one division each (6 dp). No windows, no
    self-joins."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    ct = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c_t")
    )
    agg = toks.join(ct, "term").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_types"),
        F.sum((F.col("c_t") == 1).cast("long")).cast("long").alias(
            "n_hapax"
        ),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        pround(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
        pround(F.col("n_hapax") / F.col("n_tokens"), 6).alias(
            "hapax_share"
        ),
    )


QUERIES["doc_lexical_diversity"] = doc_lexical_diversity

ORACLE["doc_lexical_diversity"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    ct AS (
        SELECT term, count(*)::BIGINT AS c_t FROM toks GROUP BY term
    )
    SELECT t.doc_id,
           count(*)::BIGINT AS n_tokens,
           count(DISTINCT t.term)::BIGINT AS n_types,
           sum(CASE WHEN ct.c_t = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
           {sql_round("count(DISTINCT t.term) * 1.0 / count(*)", 6)} AS ttr,
           {sql_round(
               "sum(CASE WHEN ct.c_t = 1 THEN 1 ELSE 0 END) * 1.0"
               " / count(*)", 6
           )} AS hapax_share
    FROM toks t JOIN ct ON ct.term = t.term
    GROUP BY t.doc_id
"""


OOV_VOCAB_TOP = 1000


def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-1000
    term vocabulary: the share of a doc's tokens falling outside the
    head of the frequency distribution — the cheap proxy for the
    tokenizer-fertility screen (a doc of rare strings fragments into
    many subwords and wastes sequence budget; a doc of pure head terms
    is likely boilerplate).

    Scale shape: the vocabulary rank is a TOTAL order over the corpus
    vocabulary, so it rides the two-phase range-partition layout
    (ops.global_order.global_row_number — never a single-partition
    window); scoring is one token→vocab key-partitioned join and one
    per-doc aggregate. Ties at the cut break on the term string,
    pinned identically in the oracle."""
    from data_platform_spark.ops.global_order import global_row_number

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    ranked = global_row_number(
        counts, [F.desc("n"), F.asc("term")], "freq_rank"
    ).select("term", (F.col("freq_rank") > OOV_VOCAB_TOP).alias("oov"))
    agg = toks.join(ranked, "term").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("oov").cast("long")).cast("long").alias("n_oov"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        pround(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
    )


QUERIES["doc_oov_rate"] = doc_oov_rate

ORACLE["doc_oov_rate"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    ranked AS (
        SELECT term,
               row_number() OVER (ORDER BY count(*) DESC, term ASC)
                   > {OOV_VOCAB_TOP} AS oov
        FROM toks GROUP BY term
    )
    SELECT t.doc_id,
           count(*)::BIGINT AS n_tokens,
           sum(CASE WHEN r.oov THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           {sql_round(
               "sum(CASE WHEN r.oov THEN 1 ELSE 0 END) * 1.0 / count(*)",
               6
           )} AS oov_rate
    FROM toks t JOIN ranked r ON r.term = t.term
    GROUP BY t.doc_id
"""


def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: docs bucketed into ten
    equal doc_id ranges, with each bucket's doc count, FIRST-OCCURRENCE
    term count and the cumulative vocabulary — the curve that sizes a
    tokenizer's vocab and predicts how much new text still adds new
    words (a flattening curve means the corpus is saturating).

    Determinism: a term's first occurrence is its min doc_id
    (corpus_ngram_novelty's attribution rule, applied to unigrams).
    Scale shape: one term-keyed min aggregate, one bounded 10-bucket
    rollup, and the cumulative sum is a triangular self-join over the
    TEN-row aggregate (never a global window over data-scale rows);
    the doc_id range bound rides a 1-row broadcast."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    bound = docs.agg(
        (F.max("doc_id") + 1).cast("double").alias("hi")
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    first = toks.groupBy("term").agg(
        F.min("doc_id").alias("first_doc")
    )
    nb = first.crossJoin(F.broadcast(bound)).select(
        F.floor(F.col("first_doc") * 10 / F.col("hi")).cast("long").alias(
            "bucket"
        )
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("new_terms")
    )
    nd = docs.crossJoin(F.broadcast(bound)).select(
        F.floor(F.col("doc_id") * 10 / F.col("hi")).cast("long").alias(
            "bucket"
        )
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    per = nd.join(nb, "bucket", "left").select(
        "bucket",
        "n_docs",
        F.coalesce("new_terms", F.lit(0)).cast("long").alias("new_terms"),
    )
    cum = (
        per.alias("a")
        .join(
            per.select(
                F.col("bucket").alias("b2"),
                F.col("new_terms").alias("nt2"),
            ),
            F.col("b2") <= F.col("a.bucket"),
        )
        .groupBy("a.bucket")
        .agg(F.sum("nt2").cast("long").alias("cum_vocab"))
    )
    return per.join(cum, "bucket").select(
        "bucket", "n_docs", "new_terms", "cum_vocab"
    )


QUERIES["corpus_vocab_growth"] = corpus_vocab_growth

ORACLE["corpus_vocab_growth"] = """
    WITH bound AS (
        SELECT (max(doc_id) + 1)::DOUBLE AS hi FROM documents
    ),
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    nb AS (
        SELECT CAST(floor(first_doc * 10 / hi) AS BIGINT) AS bucket,
               count(*)::BIGINT AS new_terms
        FROM (SELECT term, min(doc_id) AS first_doc FROM toks GROUP BY term)
        CROSS JOIN bound
        GROUP BY 1
    ),
    nd AS (
        SELECT CAST(floor(doc_id * 10 / hi) AS BIGINT) AS bucket,
               count(*)::BIGINT AS n_docs
        FROM documents CROSS JOIN bound
        GROUP BY 1
    ),
    per AS (
        SELECT nd.bucket, nd.n_docs,
               coalesce(nb.new_terms, 0)::BIGINT AS new_terms
        FROM nd LEFT JOIN nb ON nb.bucket = nd.bucket
    )
    SELECT a.bucket, a.n_docs, a.new_terms,
           (SELECT sum(b.new_terms) FROM per b
            WHERE b.bucket <= a.bucket)::BIGINT AS cum_vocab
    FROM per a
"""


def positional_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-drift audit: KL divergence of each document-QUARTILE's
    term distribution from the corpus-wide distribution — the
    within-document twin of source_unigram_kl. Generated or templated
    text concentrates boilerplate at fixed positions (openings,
    closings), so a quartile whose KL detaches from the others flags
    positional bias a bag-of-words source audit can't see; it is also
    the evidence behind prefix-dedup thresholds (corpus_prefix_dup_rate
    assumes openings are the most templated slice).

    Determinism: same micro-nat integer contributions as
    source_unigram_kl (floor before the per-bucket LONG sum); the
    quartile index is integer math on the token ordinal. Scale shape:
    identical to the source variant with the bounded 4-value bucket key
    in place of source — the scoring join stays key-partitioned on the
    term; no windows (the ordinal comes from posexplode, not a rank)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"),
        F.size(F.split(F.col("text"), " ")).alias("n_toks"),
    ).select(
        F.expr("(pos * 4) DIV n_toks").cast("int").alias("quartile"),
        "term",
    )
    qt = toks.groupBy("quartile", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c_qt")
    )
    ct = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c_t")
    )
    tq = qt.groupBy("quartile").agg(
        F.sum("c_qt").alias("t_q"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    tot = tq.agg(F.sum("t_q").alias("t"))
    contrib = (
        qt.join(ct, "term")
        .join(F.broadcast(tq.select("quartile", "t_q")), "quartile")
        .crossJoin(F.broadcast(tot))
        .select(
            "quartile",
            F.floor(
                F.col("c_qt")
                * F.log(
                    (
                        F.col("c_qt").cast("double")
                        * F.col("t").cast("double")
                    )
                    / (
                        F.col("t_q").cast("double")
                        * F.col("c_t").cast("double")
                    )
                )
                * 1_000_000
                + F.lit(0.5)
            ).cast("long").alias("kl_micro"),
        )
    )
    agg = contrib.groupBy("quartile").agg(
        F.sum("kl_micro").alias("sum_kl_micro")
    )
    return agg.join(F.broadcast(tq), "quartile").select(
        "quartile",
        F.col("t_q").cast("long").alias("n_tokens"),
        "n_terms",
        pround(
            F.col("sum_kl_micro") / F.lit(1_000_000.0) / F.col("t_q"), 6
        ).alias("kl_from_corpus"),
    )


QUERIES["positional_unigram_kl"] = positional_unigram_kl

ORACLE["positional_unigram_kl"] = f"""
    WITH toks AS (
        SELECT ((t.i - 1) * 4) // len(string_split(text, ' '))
                   AS quartile,
               string_split(text, ' ')[t.i] AS term
        FROM documents,
             unnest(generate_series(1, len(string_split(text, ' '))))
                 AS t(i)
    ),
    qt AS (
        SELECT quartile, term, count(*)::BIGINT AS c_qt
        FROM toks GROUP BY quartile, term
    ),
    ct AS (
        SELECT term, count(*)::BIGINT AS c_t FROM toks GROUP BY term
    ),
    tq AS (
        SELECT quartile, sum(c_qt)::BIGINT AS t_q,
               count(*)::BIGINT AS n_terms
        FROM qt GROUP BY quartile
    ),
    tot AS (SELECT sum(t_q)::BIGINT AS t FROM tq),
    contrib AS (
        SELECT qt.quartile,
               CAST(floor(
                   qt.c_qt * ln((qt.c_qt::DOUBLE * tot.t::DOUBLE)
                                / (tq.t_q::DOUBLE * ct.c_t::DOUBLE))
                   * 1000000 + 0.5) AS BIGINT) AS kl_micro
        FROM qt
        JOIN ct ON ct.term = qt.term
        JOIN tq ON tq.quartile = qt.quartile
        CROSS JOIN tot
    )
    SELECT a.quartile,
           tq.t_q::BIGINT AS n_tokens,
           tq.n_terms,
           {sql_round("a.sum_kl_micro / 1000000.0 / tq.t_q", 6)}
               AS kl_from_corpus
    FROM (SELECT quartile, sum(kl_micro)::BIGINT AS sum_kl_micro
          FROM contrib GROUP BY quartile) a
    JOIN tq ON tq.quartile = a.quartile
"""


def source_bigram_cond_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source sequence predictability: unigram entropy H(w) next to
    the conditional bigram entropy H(next | prev) in nats — the
    language-complexity pair (their gap is the mutual information
    between adjacent tokens). Templated/boilerplate sources collapse
    H(next|prev) toward 0 while H(w) stays high — a sequence-level
    screen the bag-of-words quality signals (doc_unigram_logprob,
    source_unigram_kl) cannot express; H(next|prev) is also the
    floor on what a bigram LM (doc_bigram_logprob) can achieve per
    source.

    Determinism: H(next|prev) = Σ_ab (c_ab/B)·ln(c_a·/c_ab) with every
    term floored to integer micro-nats before the per-source LONG sum;
    unigram entropy identically over token counts. Scale shape:
    adjacent-pair explode (narrow), two bounded-key groupBys (source ×
    vocab / vocab²), prefix-count join keyed on (source, prev); totals
    broadcast on the bounded source domain."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    pairs = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> struct(split(text, ' ')[i - 1] AS prev, "
        "split(text, ' ')[i] AS next))"
    )
    bg = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select("source", F.explode(pairs).alias("e"))
        .groupBy("source", F.col("e.prev").alias("prev"), F.col("e.next").alias("next"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    pre = bg.groupBy("source", "prev").agg(
        F.sum("c_ab").cast("long").alias("c_a")
    )
    btot = bg.groupBy("source").agg(
        F.sum("c_ab").cast("long").alias("n_bigrams")
    )
    cond_micro = (
        bg.join(pre, ["source", "prev"])
        .select(
            "source",
            F.floor(
                F.col("c_ab")
                * F.log(
                    F.col("c_a").cast("double") / F.col("c_ab").cast("double")
                )
                * 1_000_000
                + F.lit(0.5)
            ).cast("long").alias("h_micro"),
        )
        .groupBy("source")
        .agg(F.sum("h_micro").alias("sum_cond_micro"))
    )
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tc = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c_t")
    )
    ttot = tc.groupBy("source").agg(
        F.sum("c_t").cast("long").alias("n_tokens")
    )
    uni_micro = (
        tc.join(F.broadcast(ttot), "source")
        .select(
            "source",
            F.floor(
                F.col("c_t")
                * F.log(
                    F.col("n_tokens").cast("double") / F.col("c_t").cast("double")
                )
                * 1_000_000
                + F.lit(0.5)
            ).cast("long").alias("h_micro"),
        )
        .groupBy("source")
        .agg(F.sum("h_micro").alias("sum_uni_micro"))
    )
    return (
        uni_micro.join(F.broadcast(ttot), "source")
        .join(cond_micro, "source")
        .join(F.broadcast(btot), "source")
        .select(
            "source",
            "n_tokens",
            "n_bigrams",
            pround(
                F.col("sum_uni_micro") / F.lit(1_000_000.0) / F.col("n_tokens"),
                6,
            ).alias("unigram_entropy"),
            pround(
                F.col("sum_cond_micro") / F.lit(1_000_000.0) / F.col("n_bigrams"),
                6,
            ).alias("bigram_cond_entropy"),
        )
    )


QUERIES["source_bigram_cond_entropy"] = source_bigram_cond_entropy

ORACLE["source_bigram_cond_entropy"] = f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS ws
        FROM documents
    ),
    bg AS (
        SELECT source, ws[i] AS prev, ws[i + 1] AS next,
               count(*)::BIGINT AS c_ab
        FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2
        GROUP BY source, prev, next
    ),
    pre AS (
        SELECT source, prev, sum(c_ab)::BIGINT AS c_a
        FROM bg GROUP BY source, prev
    ),
    btot AS (
        SELECT source, sum(c_ab)::BIGINT AS n_bigrams
        FROM bg GROUP BY source
    ),
    cond AS (
        SELECT bg.source,
               sum(CAST(floor(
                   bg.c_ab * ln(pre.c_a::DOUBLE / bg.c_ab::DOUBLE)
                   * 1000000 + 0.5) AS BIGINT))::BIGINT AS sum_cond_micro
        FROM bg JOIN pre
          ON pre.source = bg.source AND pre.prev = bg.prev
        GROUP BY bg.source
    ),
    tc AS (
        SELECT source, t.term, count(*)::BIGINT AS c_t
        FROM (SELECT source, unnest(string_split(text, ' ')) AS term
              FROM documents) t
        GROUP BY source, t.term
    ),
    ttot AS (
        SELECT source, sum(c_t)::BIGINT AS n_tokens
        FROM tc GROUP BY source
    ),
    uni AS (
        SELECT tc.source,
               sum(CAST(floor(
                   tc.c_t * ln(ttot.n_tokens::DOUBLE / tc.c_t::DOUBLE)
                   * 1000000 + 0.5) AS BIGINT))::BIGINT AS sum_uni_micro
        FROM tc JOIN ttot ON ttot.source = tc.source
        GROUP BY tc.source
    )
    SELECT u.source,
           ttot.n_tokens,
           btot.n_bigrams,
           {sql_round("u.sum_uni_micro / 1000000.0 / ttot.n_tokens", 6)}
               AS unigram_entropy,
           {sql_round("c.sum_cond_micro / 1000000.0 / btot.n_bigrams", 6)}
               AS bigram_cond_entropy
    FROM uni u
    JOIN ttot ON ttot.source = u.source
    JOIN cond c ON c.source = u.source
    JOIN btot ON btot.source = u.source
"""


def hybrid_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four-index serving capstone under the CORRECTNESS GATE:
    build the persisted BM25 lexical index and the persisted IVF index
    from the raw tables into a temp dir, then serve the standing
    hybrid query through ops.hybrid_index.hybrid_search_index — the
    production path (term-bucket-pruned postings + nprobe-cell-pruned
    vectors + RRF fusion). With nprobe = the index's cell count the
    dense ranking is the exact global cosine order, so the result is
    bit-identical to the oracled hybrid_rrf_topk — the oracle is
    REUSED verbatim, making the driver verify build + both index scans
    + fusion end-to-end (the layout-roundtrip discipline of
    events_clustered_time_slice applied to the index family).

    The one .collect() is the 1-row query vector (metadata-scale, the
    accepted scalar pattern). Builds amortize in production (they're
    the persisted-index point); re-building per call here is what puts
    the full derivation under the oracle, same as kmeans_ivf_topk."""
    from data_platform_spark.queries._util import scratch_dir

    from data_platform_spark.ops.ann_index import build_ivf_index
    from data_platform_spark.ops.hybrid_index import hybrid_search_index
    from data_platform_spark.ops.lexical_index import build_lexical_index

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    base = scratch_dir("dps_hybrid_rt_")
    lex_path = f"{base}/lex"
    ivf_path = f"{base}/ivf"
    build_lexical_index(docs, lex_path)
    build_ivf_index(emb, ivf_path, k=8)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return hybrid_search_index(
        spark,
        lex_path,
        ivf_path,
        BM25_QUERY_TERMS,
        qvec,
        topk=20,
        nprobe=8,  # = k: every cell probed → exact dense ranking
        exclude_ids=[0],
    )


QUERIES["hybrid_index_roundtrip"] = hybrid_index_roundtrip

# the serving path is bit-identical to the oracled derivation by
# construction — reuse the oracle VERBATIM so the gate proves it
ORACLE["hybrid_index_roundtrip"] = ORACLE["hybrid_rrf_topk"]


def lexical_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED BM25 lexical index under the CORRECTNESS GATE:
    build the on-disk (postings, stats, params) index from the corpus
    into a temp dir, then serve the standing term query through
    ops.lexical_index.bm25_search_index — the production path whose
    scan touches ONLY the query terms' postings buckets (partition-
    pruned; plan-asserted in tests). The persisted path is
    bit-identical to the in-memory bm25_topk math over the same
    corpus, so that oracle is REUSED verbatim: the driver verifies
    tokenize + persist + pruned serve end-to-end (the index-roundtrip
    discipline for the lexical family)."""
    from data_platform_spark.queries._util import scratch_dir

    from data_platform_spark.ops.lexical_index import (
        bm25_search_index,
        build_lexical_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = scratch_dir("dps_lex_rt_")
    build_lexical_index(docs, f"{base}/lex")
    return bm25_search_index(
        spark, f"{base}/lex", BM25_QUERY_TERMS, topk=BM25_TOPK
    )


QUERIES["lexical_index_roundtrip"] = lexical_index_roundtrip

# bit-identical to the in-memory derivation by construction — reuse the
# oracle verbatim so the gate proves the persisted serve path
ORACLE["lexical_index_roundtrip"] = ORACLE["bm25_topk"]


SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5  # test gets the remaining 5


def split_of(key):
    """THE deterministic split expression: md5-bucket of the decimal
    rendering of ``key`` (a Column) mod 100 → train/val/test. Shared by
    corpus_split_assignment (doc-level key) and dedup.leakage_safe_split
    (component-level key) — the leakage audit's naive-vs-group comparison
    is only meaningful while both use the byte-identical formula, so
    there is exactly one copy."""
    bucket = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split audit: every document hashes
    to a bucket in [0, 100) via md5(doc_id) — train < 90, val < 95,
    test otherwise — and the query reports per (source, split) doc and
    token counts plus each split's doc share WITHIN its source. The
    split is a pure function of the document id: stable across runs,
    machines, and engine versions (no RNG, no sampling), so a doc
    never migrates between train and the eval sets as the corpus
    grows — the property an LLM data pipeline needs to keep eval
    uncontaminated across snapshots.

    Determinism: the bucket is the first 8 hex chars of md5 of the
    decimal doc_id rendering, mod 100 — identical bytes hashed in both
    engines. Scale shape: one projection + one map-side-combined
    groupBy on the (source × 3) domain; the per-source totals relation
    is bounded by the source domain (broadcast)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    assigned = docs.select(
        "source",
        split_of(F.col("doc_id")).alias("split"),
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    per = assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    totals = per.groupBy("source").agg(F.sum("n_docs").alias("src_docs"))
    return per.join(F.broadcast(totals), "source").select(
        "source",
        "split",
        "n_docs",
        "n_tokens",
        pround(F.col("n_docs") / F.col("src_docs"), 6).alias("doc_share"),
    )


QUERIES["corpus_split_assignment"] = corpus_split_assignment

ORACLE["corpus_split_assignment"] = f"""
    WITH assigned AS (
        SELECT source,
               CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8)
                         )::UBIGINT % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8)
                         )::UBIGINT % 100
                         < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split,
               len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::BIGINT
                   AS n_tokens
        FROM documents
    ),
    per AS (
        SELECT source, split,
               count(*)::BIGINT AS n_docs,
               sum(n_tokens)::BIGINT AS n_tokens
        FROM assigned GROUP BY source, split
    ),
    totals AS (
        SELECT source, sum(n_docs)::BIGINT AS src_docs
        FROM per GROUP BY source
    )
    SELECT p.source, p.split, p.n_docs, p.n_tokens,
           {sql_round("p.n_docs / t.src_docs", 6)} AS doc_share
    FROM per p JOIN totals t ON t.source = p.source
"""


def source_unigram_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source similarity: Jensen-Shannon divergence between
    every pair of sources' unigram term distributions — the symmetric,
    smoothing-free complement of source_unigram_kl (which compares each
    source to the corpus): a near-zero JSD pair is the same content
    mix under two source labels (mirror/syndication — merge before
    weighting the mix), a high pair is genuinely complementary
    coverage. JSD(P,Q) = ½·Σ P·ln(2P/(P+Q)) + ½·Σ Q·ln(2Q/(P+Q));
    terms held by only one side contribute ln 2 times that side's
    unshared mass, so the SHARED-term join plus two exact unshared-mass
    totals give the full sum — no smoothing, no full outer join.

    Determinism: each shared (pair, term) contributes
    floor(c_a·ln(2·c_a·T_b / (c_a·T_b + c_b·T_a))·1e6 + 0.5) integer
    micro-nats (double-first products — exact below 2^53) before the
    per-pair LONG sum; the unshared tail is exact LONG mass arithmetic;
    one final fixed double expression (6 dp). Scale shape: the pair
    enumeration is a TERM-KEYED self-join of the (source, term) count
    relation — fan-out bounded by the source domain per term, never
    pair-of-rows enumeration; per-source totals broadcast."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    st = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ts = st.groupBy("source").agg(F.sum("c").alias("t"))
    a = st.join(F.broadcast(ts), "source").select(
        F.col("source").alias("source_a"),
        "term",
        F.col("c").alias("c_a"),
        F.col("t").alias("t_a"),
    )
    b = st.join(F.broadcast(ts), "source").select(
        F.col("source").alias("source_b"),
        "term",
        F.col("c").alias("c_b"),
        F.col("t").alias("t_b"),
    )
    shared = a.join(b, "term").filter(F.col("source_a") < F.col("source_b"))
    mic = lambda c_x, t_x, c_y, t_y: F.floor(  # noqa: E731
        F.col(c_x)
        * F.log(
            (F.lit(2.0) * F.col(c_x).cast("double") * F.col(t_y).cast("double"))
            / (
                F.col(c_x).cast("double") * F.col(t_y).cast("double")
                + F.col(c_y).cast("double") * F.col(t_x).cast("double")
            )
        )
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    per_pair = shared.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
        F.sum(mic("c_a", "t_a", "c_b", "t_b")).alias("mic_a"),
        F.sum(mic("c_b", "t_b", "c_a", "t_a")).alias("mic_b"),
        F.sum("c_a").alias("shared_a"),
        F.sum("c_b").alias("shared_b"),
        F.max("t_a").alias("t_a"),
        F.max("t_b").alias("t_b"),
    )
    ln2 = F.log(F.lit(2.0))
    jsd = F.lit(0.5) * (
        F.col("mic_a") / 1_000_000.0 / F.col("t_a")
        + (F.lit(1.0) - F.col("shared_a") / F.col("t_a").cast("double")) * ln2
    ) + F.lit(0.5) * (
        F.col("mic_b") / 1_000_000.0 / F.col("t_b")
        + (F.lit(1.0) - F.col("shared_b") / F.col("t_b").cast("double")) * ln2
    )
    return per_pair.select(
        "source_a",
        "source_b",
        "n_shared_terms",
        pround(jsd, 6).alias("jsd"),
    )


QUERIES["source_unigram_jsd"] = source_unigram_jsd

_JSD_MIC = (
    "CAST(floor({cx} * ln((2.0 * {cx}::DOUBLE * {ty}::DOUBLE)"
    " / ({cx}::DOUBLE * {ty}::DOUBLE + {cy}::DOUBLE * {tx}::DOUBLE))"
    " * 1000000 + 0.5) AS BIGINT)"
)

ORACLE["source_unigram_jsd"] = f"""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    st AS (
        SELECT source, term, count(*)::BIGINT AS c
        FROM toks GROUP BY source, term
    ),
    ts AS (
        SELECT source, sum(c)::BIGINT AS t FROM st GROUP BY source
    ),
    shared AS (
        SELECT a.source AS source_a, b.source AS source_b,
               a.c AS c_a, b.c AS c_b, ta.t AS t_a, tb.t AS t_b
        FROM st a
        JOIN st b ON a.term = b.term AND a.source < b.source
        JOIN ts ta ON ta.source = a.source
        JOIN ts tb ON tb.source = b.source
    ),
    per_pair AS (
        SELECT source_a, source_b,
               count(*)::BIGINT AS n_shared_terms,
               sum({_JSD_MIC.format(cx="c_a", cy="c_b", tx="t_a", ty="t_b")}
                  )::BIGINT AS mic_a,
               sum({_JSD_MIC.format(cx="c_b", cy="c_a", tx="t_b", ty="t_a")}
                  )::BIGINT AS mic_b,
               sum(c_a)::BIGINT AS shared_a,
               sum(c_b)::BIGINT AS shared_b,
               max(t_a) AS t_a,
               max(t_b) AS t_b
        FROM shared GROUP BY source_a, source_b
    )
    SELECT source_a, source_b, n_shared_terms,
           {sql_round(
               "0.5 * (mic_a / 1000000.0 / t_a"
               "       + (1.0 - shared_a / t_a::DOUBLE) * ln(2.0))"
               " + 0.5 * (mic_b / 1000000.0 / t_b"
               "          + (1.0 - shared_b / t_b::DOUBLE) * ln(2.0))", 6
           )} AS jsd
    FROM per_pair
"""


def doc_length_moments_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Log-length distribution fit per source: mean, standard deviation
    and skewness of ln(n_chars) — natural text lengths run roughly
    lognormal, so per-source log-moments are the cheap distribution-
    shape audit (a skew jump flags truncation or concatenation bugs in
    one crawl source; a std collapse flags templated output) and the
    parameters a length-matched sampler needs.

    Determinism: ln(n_chars) quantizes per row to 4-dp integer units;
    Σx folds as exact LONG, while Σx² and Σx³ fold as DECIMAL(38,0) —
    a ~10k-char doc gives x≈92,000 so x³≈7.8e14, which would wrap a
    silent (non-ANSI) LONG sum at only ~12k docs per source (ADVICE
    r10); DECIMAL(38,0) keeps the cube fold exact to ~1e23 docs per
    source, and the oracle folds HUGEINT (int128) so both engines stay
    exact and value-identical. The central moments derive by one fixed
    double expression (6 dp). Scale shape: one map-side-combined
    groupBy on the bounded source domain — no joins, no windows."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    lx = F.floor(
        F.log(F.col("n_chars").cast("double")) * 10_000 + F.lit(0.5)
    ).cast("long")
    # cast BEFORE multiplying: x*x*x as LONG already wraps pre-cast.
    # (13,0)*(13,0)->(27,0), *(13,0)->(38,0): inside decimal bounds.
    xd = F.col("x").cast("decimal(13,0)")
    sums = (
        docs.filter(F.col("n_chars") > 0)
        .select("source", lx.alias("x"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("s1"),
            F.sum((xd * xd).cast("decimal(38,0)")).alias("s2"),
            F.sum((xd * xd * xd).cast("decimal(38,0)")).alias("s3"),
        )
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1") / n / 10_000.0
    m2 = F.col("s2") / n / 100_000_000.0
    m3 = F.col("s3") / n / 1_000_000_000_000.0
    var = m2 - m1 * m1
    cm3 = m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1
    return sums.select(
        "source",
        F.col("n").alias("n_docs"),
        pround(m1, 6).alias("log_len_mean"),
        pround(F.when(var > 0, F.sqrt(var)), 6).alias("log_len_std"),
        pround(
            F.when(var > 0, cm3 / (F.sqrt(var) * F.sqrt(var) * F.sqrt(var))),
            6,
        ).alias("log_len_skew"),
    )


QUERIES["doc_length_moments_by_source"] = doc_length_moments_by_source

ORACLE["doc_length_moments_by_source"] = f"""
    WITH q AS (
        SELECT source,
               CAST(floor(ln(n_chars::DOUBLE) * 10000 + 0.5) AS BIGINT) AS x
        FROM documents WHERE n_chars > 0
    ),
    sums AS (
        -- x promotes to HUGEINT before the products so neither the
        -- per-row cube nor its fold can wrap int64 (the Spark side
        -- folds DECIMAL(38,0)); s2/s3 stay HUGEINT — they only ever
        -- divide into DOUBLE below, never surface as result columns
        SELECT source,
               count(*)::BIGINT AS n,
               sum(x)::BIGINT AS s1,
               sum(x::HUGEINT * x) AS s2,
               sum(x::HUGEINT * x * x) AS s3
        FROM q GROUP BY source
    ),
    m AS (
        SELECT source, n,
               s1 / n::DOUBLE / 10000.0 AS m1,
               s2 / n::DOUBLE / 100000000.0 AS m2,
               s3 / n::DOUBLE / 1000000000000.0 AS m3
        FROM sums
    )
    SELECT source,
           n AS n_docs,
           {sql_round("m1", 6)} AS log_len_mean,
           {sql_round(
               "CASE WHEN m2 - m1 * m1 > 0 THEN sqrt(m2 - m1 * m1) END", 6
           )} AS log_len_std,
           {sql_round(
               "CASE WHEN m2 - m1 * m1 > 0 THEN"
               " (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)"
               " / (sqrt(m2 - m1 * m1) * sqrt(m2 - m1 * m1)"
               "    * sqrt(m2 - m1 * m1)) END", 6
           )} AS log_len_skew
    FROM m
"""


def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution per language: for each (lang, length)
    how many tokens, the share within the language, and the cumulative
    share — the fertility profile a tokenizer budget is calibrated
    against (a language whose mass sits at length 1-2 is being shredded
    by the token regex; a long-tail shift after a crawl refresh is an
    encoding regression). Lengths cap at 20 (the 20+ bucket) so the
    domain is bounded by construction.

    Determinism: pure integer counts; shares are one division each
    (6 dp); the cumulative share rides a window over the ≤20-row
    per-lang length domain — calendar-bounded, never data-bounded.
    Scale shape: one token explode + one (lang × ≤20)-domain groupBy
    with map-side partials; per-lang totals broadcast."""
    from pyspark.sql.window import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        "lang",
        F.explode(
            F.expr(f"regexp_extract_all(text, '{X.TOKEN_REGEX}', 0)")
        ).alias("tok"),
    )
    bucketed = toks.select(
        "lang", F.least(F.length("tok"), F.lit(20)).alias("tok_len")
    )
    agg = bucketed.groupBy("lang", "tok_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    totals = agg.groupBy("lang").agg(F.sum("n_tokens").alias("t"))
    w = (
        Window.partitionBy("lang")
        .orderBy("tok_len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        agg.join(F.broadcast(totals), "lang")
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "lang",
            F.col("tok_len").cast("long").alias("tok_len"),
            "n_tokens",
            pround(F.col("n_tokens") / F.col("t"), 6).alias("token_share"),
            pround(F.col("cum") / F.col("t"), 6).alias("cum_share"),
        )
    )


QUERIES["token_length_histogram"] = token_length_histogram

ORACLE["token_length_histogram"] = f"""
    WITH toks AS (
        SELECT lang,
               unnest(regexp_extract_all(text, '{X.TOKEN_REGEX}')) AS tok
        FROM documents
    ),
    agg AS (
        SELECT lang, least(length(tok), 20)::BIGINT AS tok_len,
               count(*)::BIGINT AS n_tokens
        FROM toks GROUP BY 1, 2
    ),
    totals AS (
        SELECT lang, sum(n_tokens)::BIGINT AS t FROM agg GROUP BY lang
    )
    SELECT a.lang, a.tok_len, a.n_tokens,
           {sql_round("a.n_tokens * 1.0 / t.t", 6)} AS token_share,
           {sql_round(
               "sum(a.n_tokens) OVER ("
               " PARTITION BY a.lang ORDER BY a.tok_len"
               " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
               ") * 1.0 / t.t", 6
           )} AS cum_share
    FROM agg a JOIN totals t ON t.lang = a.lang
"""


def corpus_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram lang-ID heuristic against the
    corpus's lang labels: per (true, predicted) cell the doc count and
    the recall within the true language — the classifier-health eval
    that decides whether the heuristic is fit to route documents whose
    label is MISSING (the production use: crawl sources rarely carry
    trustworthy language tags). A diagonal-heavy matrix green-lights
    routing; a specific off-diagonal cell names the marker list to fix.

    Determinism: the prediction is the existing deterministic marker
    argmax (functions.text.predicted_lang — priority-ordered
    tie-break); counts are exact LONGs, one division per cell (6 dp).
    Scale shape: one projection + one groupBy on the bounded
    (lang × lang) domain; per-true-lang totals broadcast."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    cells = docs.select(
        F.col("lang").alias("true_lang"),
        X.predicted_lang(F.col("text")).alias("predicted_lang"),
    ).groupBy("true_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    totals = cells.groupBy("true_lang").agg(
        F.sum("n_docs").alias("t")
    )
    return cells.join(F.broadcast(totals), "true_lang").select(
        "true_lang",
        "predicted_lang",
        "n_docs",
        pround(F.col("n_docs") / F.col("t"), 6).alias("true_lang_share"),
    )


QUERIES["corpus_language_confusion"] = corpus_language_confusion


def _language_confusion_oracle() -> str:
    score_cols = ", ".join(
        f"{_sql_marker_score(X.LANG_MARKERS[lang])} AS s_{lang}"
        for lang in X.LANG_PRIORITY
    )
    max_expr = (
        "greatest(" + ", ".join(f"s_{lang}" for lang in X.LANG_PRIORITY) + ")"
    )
    case_branches = " ".join(
        f"WHEN s_{lang} = {max_expr} THEN '{lang}'"
        for lang in X.LANG_PRIORITY[:-1]
    )
    return f"""
        WITH pred AS (
            SELECT lang AS true_lang,
                   CASE {case_branches}
                        ELSE '{X.LANG_PRIORITY[-1]}' END AS predicted_lang
            FROM (SELECT lang, {score_cols} FROM documents)
        ),
        cells AS (
            SELECT true_lang, predicted_lang, count(*)::BIGINT AS n_docs
            FROM pred GROUP BY 1, 2
        ),
        totals AS (
            SELECT true_lang, sum(n_docs)::BIGINT AS t
            FROM cells GROUP BY true_lang
        )
        SELECT c.true_lang, c.predicted_lang, c.n_docs,
               {sql_round("c.n_docs * 1.0 / t.t", 6)} AS true_lang_share
        FROM cells c JOIN totals t ON t.true_lang = c.true_lang
    """


ORACLE["corpus_language_confusion"] = _language_confusion_oracle()


def doc_quality_by_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-neutrality audit: quality-score mean and exact p50/p90 per
    train/val/test split — the check that the hash split is UNBIASED
    on the axis that matters (an eval set that skews high-quality
    overstates model performance; one that skews low understates it).
    The hash split is content-blind by construction, so any measured
    skew flags either tiny-split noise (n_docs says which) or a broken
    hash.

    Determinism: the split is the corpus_split_assignment bucket
    (md5 mod 100); quality sums as integer 4-dp units (exact LONG
    folds); percentiles ride the two-phase grouped layout. Scale
    shape: one projection, one 3-row groupBy, the grouped_percentile
    range/offset shuffles — a split's doc count is unbounded, so never
    the native buffer-the-group percentile."""
    from data_platform_spark.ops.global_order import grouped_percentile

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    scored = docs.select(
        split_of(F.col("doc_id")).alias("split"),
        F.floor(X.quality_score(F.col("text")) * 10_000 + F.lit(0.5))
        .cast("long")
        .alias("q"),
    )
    base = scored.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("q").alias("sum_q"),
    )
    pct = grouped_percentile(
        scored, ["split"], "q", {"p50": 0.5, "p90": 0.9}
    )
    return base.join(pct, "split").select(
        "split",
        "n_docs",
        pround(F.col("sum_q") / 10_000.0 / F.col("n_docs"), 6).alias(
            "mean_quality"
        ),
        pround(F.col("p50") / 10_000.0, 6).alias("p50_quality"),
        pround(F.col("p90") / 10_000.0, 6).alias("p90_quality"),
    )


QUERIES["doc_quality_by_split"] = doc_quality_by_split


def _quality_by_split_oracle() -> str:
    return f"""
        WITH scored AS (
            SELECT CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8)
                             )::UBIGINT % 100 < {SPLIT_TRAIN_PCT}
                        THEN 'train'
                        WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8)
                             )::UBIGINT % 100
                             < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                        ELSE 'test' END AS split,
                   CAST(floor(({quality_sql()}) * 10000 + 0.5) AS BIGINT)
                       AS q
            FROM documents
        )
        SELECT split,
               count(*)::BIGINT AS n_docs,
               {sql_round("sum(q) / 10000.0 / count(*)", 6)}
                   AS mean_quality,
               {sql_round("quantile_cont(q, 0.5) / 10000.0", 6)}
                   AS p50_quality,
               {sql_round("quantile_cont(q, 0.9) / 10000.0", 6)}
                   AS p90_quality
        FROM scored GROUP BY split
    """


ORACLE["doc_quality_by_split"] = _quality_by_split_oracle()


def doc_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source: exact corpus-level
    shares of alphabetic / digit / whitespace / other characters plus
    the per-doc mean other-share — the cheapest encoding-regression
    screen there is (mojibake, stray markup, and binary leakage all
    surface as an 'other' spike before any tokenizer sees the text;
    a digit spike flags tables/logs masquerading as prose).

    Determinism: per-class counts are exact string-length arithmetic
    (length of the text minus length with the class stripped), summed
    as LONGs; shares one division each (6 dp). Scale shape: one
    projection + one bounded per-source rollup — no joins, no windows,
    all regex work inside whole-stage codegen."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    t = F.col("text")
    n_all = F.length(t).cast("long")
    n_alpha = (
        F.length(t) - F.length(F.regexp_replace(t, "[A-Za-z]", ""))
    ).cast("long")
    n_digit = (
        F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))
    ).cast("long")
    n_space = (
        F.length(t) - F.length(F.regexp_replace(t, "\\s", ""))
    ).cast("long")
    agg = docs.select(
        "source",
        n_all.alias("n_all"),
        n_alpha.alias("n_alpha"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_all").alias("chars"),
        F.sum("n_alpha").alias("alpha"),
        F.sum("n_digit").alias("digit"),
        F.sum("n_space").alias("space"),
    )
    return agg.select(
        "source",
        "n_docs",
        F.col("chars").alias("n_chars"),
        pround(F.col("alpha") / F.col("chars").cast("double"), 6).alias(
            "alpha_share"
        ),
        pround(F.col("digit") / F.col("chars").cast("double"), 6).alias(
            "digit_share"
        ),
        pround(F.col("space") / F.col("chars").cast("double"), 6).alias(
            "space_share"
        ),
        pround(
            (F.col("chars") - F.col("alpha") - F.col("digit") - F.col("space"))
            / F.col("chars").cast("double"),
            6,
        ).alias("other_share"),
    )


QUERIES["doc_char_class_profile"] = doc_char_class_profile

ORACLE["doc_char_class_profile"] = f"""
    WITH per_doc AS (
        SELECT source,
               length(text)::BIGINT AS n_all,
               (length(text)
                - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
               )::BIGINT AS n_alpha,
               (length(text)
                - length(regexp_replace(text, '[0-9]', '', 'g'))
               )::BIGINT AS n_digit,
               (length(text)
                - length(regexp_replace(text, '\\s', '', 'g'))
               )::BIGINT AS n_space
        FROM documents
    ),
    agg AS (
        SELECT source,
               count(*)::BIGINT AS n_docs,
               sum(n_all)::BIGINT AS chars,
               sum(n_alpha)::BIGINT AS alpha,
               sum(n_digit)::BIGINT AS digit,
               sum(n_space)::BIGINT AS space
        FROM per_doc GROUP BY source
    )
    SELECT source, n_docs, chars AS n_chars,
           {sql_round("alpha * 1.0 / chars", 6)} AS alpha_share,
           {sql_round("digit * 1.0 / chars", 6)} AS digit_share,
           {sql_round("space * 1.0 / chars", 6)} AS space_share,
           {sql_round(
               "(chars - alpha - digit - space) * 1.0 / chars", 6
           )} AS other_share
    FROM agg
"""


def corpus_doc_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini coefficient of document token counts — the
    length-inequality audit behind the sampling family (a source where
    1% of docs hold 80% of tokens needs token-budgeted sampling, not
    doc-count sampling; Gini near 0 says doc-count quotas are already
    token-fair). Rank formulation G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n
    over per-doc token counts ranked ascending (doc_id tie-break —
    identical in both engines), the events_user_gini discipline on the
    text axis.

    Scale shape: one per-doc projection; the ascending rank within
    each source rides the grouped two-phase layout (a dominant source
    ranks across many tasks, never one window task); Σ(rank·x) and Σx
    are exact LONG folds, the final Gini two deterministic double
    divisions (6 dp)."""
    from data_platform_spark.ops.global_order import grouped_running_sum

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    per_doc = docs.select(
        "source",
        "doc_id",
        X.token_count(F.col("text")).cast("long").alias("toks"),
    )
    ranked = grouped_running_sum(
        per_doc,
        ["source"],
        [F.asc("toks"), F.asc("doc_id")],
        F.lit(1).cast("long"),
        "rk",
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.sum(F.col("rk") * F.col("toks")).cast("long").alias("s_rank"),
    )
    gini = (2.0 * F.col("s_rank")) / (
        F.col("n_docs") * F.col("n_tokens")
    ) - (F.col("n_docs") + 1.0) / F.col("n_docs")
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        pround(F.when(F.col("n_tokens") > 0, gini), 6).alias("length_gini"),
    )


QUERIES["corpus_doc_length_gini"] = corpus_doc_length_gini

ORACLE["corpus_doc_length_gini"] = f"""
    WITH per_doc AS (
        SELECT source, doc_id,
               len(regexp_extract_all(text, '{X.TOKEN_REGEX}'))::BIGINT
                   AS toks
        FROM documents
    ),
    ranked AS (
        SELECT source, toks,
               row_number() OVER (
                   PARTITION BY source ORDER BY toks ASC, doc_id ASC
               )::BIGINT AS rk
        FROM per_doc
    ),
    agg AS (
        SELECT source,
               count(*)::BIGINT AS n_docs,
               sum(toks)::BIGINT AS n_tokens,
               sum(rk * toks)::BIGINT AS s_rank
        FROM ranked GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           {sql_round(
               "CASE WHEN n_tokens > 0 THEN"
               " (2.0 * s_rank) / (n_docs * n_tokens)"
               " - (n_docs + 1.0) / n_docs END", 6
           )} AS length_gini
    FROM agg
"""
