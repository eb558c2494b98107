"""Deduplication primitives: exact hashing, word-shingling, MinHash
signatures, LSH banding, verified n-gram Jaccard, SimHash.

Design (scale-first):
- Exact dedup = content hash + groupBy — one shuffle on the hash key.
- Near-dup = shingle → MinHash → band → bucket self-join for CANDIDATES
  (cost ∝ bucket collisions, not n²), then Jaccard verification restricted
  to candidate pairs. This is the standard MinHash-LSH pipeline; at 100 TB
  the band join shuffles only (band_key, doc_id) pairs, never text.
- Hash functions are salted md5 strings with lexicographic min — engine-
  portable (identical in Spark and any SQL oracle) and uniformly
  distributed per salt; swap for xxhash64 when oracle portability is not
  needed (cheaper, same architecture).
- SimHash packs per-token hash bits into a 64-bit signature with a
  vectorized Pandas UDF (bit manipulation is awkward as SQL expressions);
  near-dup = Hamming distance on the signature.

Reference note: the reference has no dedup beyond PK upserts
(`/root/reference/dags/raw_character.py:46-52`); this module is the
charter-mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from data_platform_spark.queries._util import pround

N_MINHASH = 8
BAND_SIZE = 2  # 8 hashes -> 4 bands of 2: catches jaccard >~0.4 pairs w.h.p.


def content_hash(col: Column) -> Column:
    """Exact-dup key. md5 here for oracle portability; sha2-256 offered too."""
    return F.md5(col)


def shingle_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded distinct k-word shingle relation.

    Pure SQL lambda expressions — codegen'd, no Python. Documents shorter
    than k words yield their whole text as one shingle.
    """
    w = F.split(F.col(text_col), " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        )
    )
    return docs.select(F.col(id_col), F.explode(sh).alias("shingle"))


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", n_hashes: int = N_MINHASH) -> DataFrame:
    """One row per doc: mh0..mh{n-1} = min over shingles of salted md5.

    Single groupBy pass — n_hashes min-aggregates, no shingle re-explosion.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Distinct (doc_a, doc_b) pairs sharing at least one LSH band.

    Bands are concatenated minhash runs; the self-join is an equi-join on
    band value — shuffle-partitioned by band, never a cross join.
    """
    n_bands = n_hashes // band_size
    bands = sig.select(
        F.col(id_col),
        *[
            F.concat_ws(
                "#", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
            ).alias(f"band{b}")
            for b in range(n_bands)
        ],
    )
    pair_frames = []
    for b in range(n_bands):
        left = bands.select(F.col(id_col).alias("doc_a"), F.col(f"band{b}").alias("bk"))
        right = bands.select(F.col(id_col).alias("doc_b"), F.col(f"band{b}").alias("bk"))
        pair_frames.append(
            left.join(right, "bk").filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
        )
    out = pair_frames[0]
    for p in pair_frames[1:]:
        out = out.union(p)
    return out.distinct()


def verified_jaccard(
    sh: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over shingle sets, computed only for candidate pairs.

    common(a,b) via shingle equi-join pre-filtered to candidate docs;
    |a|,|b| from a tiny per-doc count aggregate (broadcastable).
    """
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ja = (
        common.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            pround(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
    )
    return ja.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


@pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (Arrow-vectorized Pandas UDF).

    Per doc: hash each token to 64 bits (stable Python sha1-derived),
    sum ±1 per bit position weighted by term frequency, sign → bit.
    Near-dups have small Hamming distance between signatures.
    """
    import hashlib

    def sig(text: str) -> int:
        if not text:
            return 0
        acc = [0] * 64
        for tok in text.split(" "):
            h = int.from_bytes(
                hashlib.sha1(tok.encode("utf-8")).digest()[:8], "big"
            )
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        v = 0
        for bit in range(64):
            if acc[bit] > 0:
                v |= 1 << bit
        # wrap to signed 64-bit for LongType
        return v - (1 << 64) if v >= (1 << 63) else v

    return texts.map(sig)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))
