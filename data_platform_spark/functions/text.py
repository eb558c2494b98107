"""Text-analysis column expressions: tokenization, quality scoring,
language identification, document fingerprinting.

All pure built-in expressions (split/filter/transform/md5/regexp) — no
Python UDFs — so they stay inside whole-stage codegen and scale linearly
with input bytes. Designed for a documents table of shape
(doc_id, text, lang, source, n_chars); column args let callers reuse them
on any string column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_platform_spark.queries._util import pround

# Marker stopwords per language for the n-gram/keyword language-ID
# heuristic. Deterministic and intentionally small — the point is the
# distributed scoring shape (per-row argmax over k marker scores), not
# linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "y", "de", "que"],
    "de": ["der", "und", "die", "das", "ein"],
    "zh": ["的", "了", "是", "在", "我"],
}
# Fixed priority for deterministic argmax tie-breaking.
LANG_PRIORITY = ["en", "fr", "es", "de", "zh"]

TOKEN_REGEX = "[A-Za-z]+|[0-9]+"


def words(col: Column) -> Column:
    """Whitespace tokenization (single-space separated corpus)."""
    return F.split(col, " ")


def word_count(col: Column) -> Column:
    return F.size(words(col))


def token_count(col: Column) -> Column:
    """BPE-ish token proxy: alpha runs + digit runs via one regex pass."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0))


def char_count_no_spaces(col: Column) -> Column:
    return F.length(F.regexp_replace(col, " ", ""))


def avg_word_len(col: Column) -> Column:
    return pround(
        char_count_no_spaces(col).cast("double") / word_count(col)
    )


def marker_score(col: Column, markers: list[str]) -> Column:
    """Count of tokens present in the marker list (lambda filter, JVM-side)."""
    return F.size(F.filter(words(col), lambda w: w.isin(markers)))


def predicted_lang(col: Column) -> Column:
    """Argmax over language marker scores with fixed-priority tie-break.

    Evaluated as a CASE chain in priority order: the first language whose
    score equals the max wins — deterministic, portable to any SQL engine.
    """
    scores = {lang: marker_score(col, LANG_MARKERS[lang]) for lang in LANG_PRIORITY}
    max_score = F.greatest(*scores.values())
    expr = F.lit(LANG_PRIORITY[-1])
    for lang in reversed(LANG_PRIORITY[:-1]):
        expr = F.when(scores[lang] == max_score, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence.

    0.5 * min(word_count/50, 1) + 0.5 * min(marker_hits/5, 1), rounded.
    Mirrors reference-free quality filters used in LLM data pipelines.
    """
    wc = word_count(col).cast("double")
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    hits = marker_score(col, all_markers).cast("double")
    return pround(
        0.5 * F.least(wc / 50.0, F.lit(1.0))
        + 0.5 * F.least(hits / 5.0, F.lit(1.0)),
        4,
    )


def fingerprint(col: Column, prefix_len: int = 64) -> Column:
    """Deterministic document fingerprint: md5 of the normalized prefix.

    Normalization = lowercase + collapse whitespace runs; prefix bound keeps
    the hash O(1) per row regardless of document size (rolling-hash analog).
    """
    normalized = F.regexp_replace(F.lower(col), "\\s+", " ")
    return F.md5(F.substring(normalized, 1, prefix_len))

