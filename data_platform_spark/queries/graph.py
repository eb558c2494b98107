"""Graph-analytics queries over data-derived graphs (extension surface):
weighted PageRank on the term-adjacency graph.

The dedup stack already ships two graph primitives (connected components
via pointer jumping, triangle counting — queries/dedup.py); this module
adds the iterative-propagation family. Everything is integer NANO-unit
arithmetic so per-node sums are order-independent LONG adds — the same
cross-engine determinism discipline as bm25_topk's micro-units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.queries._util import fan_out, pround, sql_round
from data_platform_spark.sources.tables import load_table

PAGERANK_DAMP = 0.85
PAGERANK_ITER = 3
PAGERANK_TOPK = 20
_NANO = 1_000_000_000


def term_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the word-adjacency graph: nodes are corpus
    terms, a directed edge (a → b) weighs how often b follows a — the
    random-surfer centrality of the vocabulary (keyword extraction à la
    TextRank, built corpus-scale).

    Distributed shape: one shuffle builds the edge list (adjacent-pair
    explode → groupBy), one more the out-weight table; each of the
    PAGERANK_ITER fixed rounds is an edges⋈ranks join + a groupBy(dst)
    sum — the classic synchronous PageRank layout where only (node,
    rank) pairs shuffle, never the graph payload. Edges are
    localCheckpoint'd once (reused every round, constant plan depth).

    Determinism: ranks live in NANO-unit LONGs; each edge contribution
    is floor(d · (rank·w / out_w)) with the cast/multiply order
    identical in the oracle, so per-node sums are order-independent
    integer adds. Dangling terms (docs' last words with no successors)
    leak their mass — the standard simplification, identical in both
    engines. Deterministic argsort output: top-k by rank desc, term asc.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    ws = F.split(F.col("text"), " ")
    pairs = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> struct(split(text, ' ')[i - 1] AS src, "
        "split(text, ' ')[i] AS dst))"
    )
    edges = (
        docs.filter(F.size(ws) >= 2)
        .select(F.explode(pairs).alias("e"))
        .select("e.src", "e.dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    edges = edges.join(out_w, "src")
    nodes = (
        docs.select(F.explode(ws).alias("term")).distinct().localCheckpoint()
    )
    n = nodes.agg(F.count(F.lit(1)).alias("n_terms"))

    base = F.floor(F.lit(float(_NANO)) / F.col("n_terms")).cast("long")
    teleport = F.floor(
        F.lit((1 - PAGERANK_DAMP) * _NANO) / F.col("n_terms")
    ).cast("long")

    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "term", base.alias("pr_nano")
    )
    for _ in range(PAGERANK_ITER):
        contribs = (
            ranks.join(edges, ranks["term"] == edges["src"])
            .select(
                F.col("dst").alias("term"),
                F.floor(
                    F.lit(PAGERANK_DAMP)
                    * (
                        (F.col("pr_nano").cast("double") * F.col("w"))
                        / F.col("out_w")
                    )
                )
                .cast("long")
                .alias("c"),
            )
            .groupBy("term")
            .agg(F.sum("c").alias("in_nano"))
        )
        ranks = (
            nodes.join(contribs, "term", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "term",
                (teleport + F.coalesce(F.col("in_nano"), F.lit(0))).alias(
                    "pr_nano"
                ),
            )
        )
    return ranks.orderBy(F.desc("pr_nano"), F.asc("term")).limit(
        PAGERANK_TOPK
    )


# QUERIES / ORACLE are assembled at module bottom.


def _pagerank_oracle() -> str:
    def round_ctes(i: int) -> str:
        return f"""
        c{i} AS (
            SELECT e.dst AS term,
                   sum(CAST(floor({PAGERANK_DAMP} *
                       ((p.pr_nano::DOUBLE * e.w) / e.out_w))
                       AS BIGINT)) AS in_nano
            FROM pr{i - 1} p JOIN edges e ON p.term = e.src
            GROUP BY e.dst
        ),
        pr{i} AS (
            SELECT n.term,
                   (SELECT teleport FROM scalars)
                   + coalesce(c.in_nano, 0) AS pr_nano
            FROM nodes n LEFT JOIN c{i} c USING (term)
        )"""

    ctes = [
        f"""pairs AS (
            SELECT ws[i] AS src, ws[i + 1] AS dst
            FROM (
                SELECT string_split(text, ' ') AS ws FROM documents
            ), unnest(generate_series(1, len(ws) - 1)) AS t(i)
            WHERE len(ws) >= 2
        ),
        edges_raw AS (
            SELECT src, dst, count(*)::BIGINT AS w
            FROM pairs GROUP BY src, dst
        ),
        edges AS (
            SELECT e.*, o.out_w
            FROM edges_raw e
            JOIN (
                SELECT src, sum(w)::BIGINT AS out_w
                FROM edges_raw GROUP BY src
            ) o USING (src)
        ),
        nodes AS (
            SELECT DISTINCT unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        scalars AS (
            SELECT
                CAST(floor({_NANO}.0 / count(*)) AS BIGINT) AS base,
                CAST(floor({(1 - PAGERANK_DAMP) * _NANO} / count(*))
                     AS BIGINT) AS teleport
            FROM nodes
        ),
        pr0 AS (
            SELECT term, (SELECT base FROM scalars) AS pr_nano FROM nodes
        )"""
    ]
    for i in range(1, PAGERANK_ITER + 1):
        ctes.append(round_ctes(i))
    return f"""
        WITH {",".join(ctes)}
        SELECT term, pr_nano::BIGINT AS pr_nano
        FROM pr{PAGERANK_ITER}
        ORDER BY pr_nano DESC, term ASC
        LIMIT {PAGERANK_TOPK}
    """


ORACLE = {"term_pagerank_topk": _pagerank_oracle()}


def term_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the word-adjacency graph PageRank runs
    over: for each degree value, how many terms have that many DISTINCT
    out-neighbors and how many that many in-neighbors — the structural
    audit behind the centrality family (a heavy-tailed out-degree
    histogram is what makes the two-phase rank layouts necessary; a
    sudden hub spike is template/boilerplate contamination).

    Scale shape: one distinct-edge shuffle, two bounded per-term
    counts, and a full-outer fuse on the degree key (rows = distinct
    degree VALUES, ≪ vocabulary). No windows."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    pairs = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> struct(split(text, ' ')[i - 1] AS src, "
        "split(text, ' ')[i] AS dst))"
    )
    edges = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select(F.explode(pairs).alias("e"))
        .select("e.src", "e.dst")
        .distinct()
    )
    outd = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_terms_out"))
    )
    ind = (
        edges.groupBy("dst").agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_terms_in"))
    )
    return (
        outd.join(ind, on="degree", how="full_outer")
        .select(
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("n_terms_out", F.lit(0)).cast("long").alias(
                "n_terms_out"
            ),
            F.coalesce("n_terms_in", F.lit(0)).cast("long").alias(
                "n_terms_in"
            ),
        )
    )


QUERIES = {
    "term_pagerank_topk": term_pagerank_topk,
    "term_graph_degree_stats": term_graph_degree_stats,
}

ORACLE["term_graph_degree_stats"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    edges AS (
        SELECT DISTINCT ws[i] AS src, ws[i + 1] AS dst
        FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2
    ),
    outd AS (
        SELECT degree, count(*)::BIGINT AS n_terms_out
        FROM (SELECT src, count(*)::BIGINT AS degree
              FROM edges GROUP BY src)
        GROUP BY degree
    ),
    ind AS (
        SELECT degree, count(*)::BIGINT AS n_terms_in
        FROM (SELECT dst, count(*)::BIGINT AS degree
              FROM edges GROUP BY dst)
        GROUP BY degree
    )
    SELECT coalesce(o.degree, i.degree)::BIGINT AS degree,
           coalesce(o.n_terms_out, 0)::BIGINT AS n_terms_out,
           coalesce(i.n_terms_in, 0)::BIGINT AS n_terms_in
    FROM outd o FULL OUTER JOIN ind i ON i.degree = o.degree
"""


def term_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the word-adjacency graph, split by whether the
    edge's source is a top-20 hub (by distinct out-degree): the share
    of distinct src→dst edges whose reverse dst→src edge also exists —
    the structural signal separating grammar-driven adjacency (low
    reciprocity: 'of the' but rarely 'the of') from boilerplate and
    list-like text (high reciprocity), and hubs behave differently
    from the long tail.

    Scale shape: one distinct-edge shuffle (self-loops excluded), the
    reverse-edge test is a LEFT SEMI self-join on the edge key, the
    hub set is a 20-row broadcast off a TakeOrdered top-k — a bounded
    2-row output with exact LONG counts."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    pairs = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> struct(split(text, ' ')[i - 1] AS src, "
        "split(text, ' ')[i] AS dst))"
    )
    edges = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select(F.explode(pairs).alias("e"))
        .select("e.src", "e.dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    hubs = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outd"))
        .orderBy(F.col("outd").desc(), F.col("src"))
        .limit(20)
        .select("src")
    )
    recip = edges.join(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ),
        ["src", "dst"],
        "left_semi",
    ).select("src", "dst", F.lit(1).cast("long").alias("is_recip"))
    tagged = (
        edges.join(recip, ["src", "dst"], "left")
        .join(
            F.broadcast(hubs.withColumn("is_hub", F.lit(True))),
            "src",
            "left",
        )
        .select(
            F.coalesce("is_hub", F.lit(False)).alias("src_is_hub"),
            F.coalesce("is_recip", F.lit(0)).alias("is_recip"),
        )
    )
    return tagged.groupBy("src_is_hub").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("is_recip").cast("long").alias("n_reciprocal"),
    ).select(
        "src_is_hub",
        "n_edges",
        "n_reciprocal",
        pround(F.col("n_reciprocal") / F.col("n_edges"), 6).alias(
            "reciprocity"
        ),
    )


QUERIES["term_graph_reciprocity"] = term_graph_reciprocity

ORACLE["term_graph_reciprocity"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    edges AS (
        SELECT DISTINCT ws[i] AS src, ws[i + 1] AS dst
        FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2 AND ws[i] <> ws[i + 1]
    ),
    hubs AS (
        SELECT src FROM (
            SELECT src, count(*) AS outd FROM edges GROUP BY src
            ORDER BY outd DESC, src LIMIT 20
        )
    ),
    tagged AS (
        SELECT (e.src IN (SELECT src FROM hubs)) AS src_is_hub,
               CASE WHEN EXISTS (
                   SELECT 1 FROM edges r
                   WHERE r.src = e.dst AND r.dst = e.src
               ) THEN 1 ELSE 0 END AS is_recip
        FROM edges e
    )
    SELECT src_is_hub,
           count(*)::BIGINT AS n_edges,
           sum(is_recip)::BIGINT AS n_reciprocal,
           {sql_round("sum(is_recip) * 1.0 / count(*)", 6)} AS reciprocity
    FROM tagged
    GROUP BY src_is_hub
"""


def term_graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local clustering-coefficient histogram of the UNDIRECTED
    word-adjacency graph: per term, the share of its neighbor pairs
    that are themselves adjacent (c = 2t/(d(d-1))), bucketed into ten
    bins — the cohesion audit completing the graph family (degree =
    size, reciprocity = direction symmetry, clustering = neighborhood
    density: templated/list-like text drives coefficients toward 1,
    grammatical prose keeps hubs sparse).

    Scale shape: triangles are counted DEGREE-ORDERED — every
    undirected edge orients from its lower-(degree, term) endpoint, so
    wedge enumeration is bounded by oriented out-degrees (≈ graph
    arboricity), never a hub's full d² neighbor pairs; each triangle
    is found exactly once and credited to its three corners via a
    3-literal explode. One distinct-edge shuffle, degree join, wedge
    self-join keyed on the pivot, closing-edge semi-join on the
    oriented key, bounded 10-bin rollup."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    pairs = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> struct(split(text, ' ')[i - 1] AS src, "
        "split(text, ' ')[i] AS dst))"
    )
    und = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select(F.explode(pairs).alias("e"))
        .filter(F.col("e.src") != F.col("e.dst"))
        .select(
            F.least("e.src", "e.dst").alias("u"),
            F.greatest("e.src", "e.dst").alias("v"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("term"))
        .union(und.select(F.col("v").alias("term")))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    # orient every edge low→high by (degree, term); carries both ranks
    oriented = (
        und.join(deg.select(F.col("term").alias("u"), F.col("degree").alias("du")), "u")
        .join(deg.select(F.col("term").alias("v"), F.col("degree").alias("dv")), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(
                    F.col("u").alias("lo"), F.col("v").alias("hi"),
                    F.col("du").alias("dlo"), F.col("dv").alias("dhi"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("lo"), F.col("u").alias("hi"),
                    F.col("dv").alias("dlo"), F.col("du").alias("dhi"),
                )
            )
            .alias("o")
        )
        .select("o.lo", "o.hi", "o.dlo", "o.dhi")
    )
    e1 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("b"),
        F.col("dhi").alias("db"),
    )
    e2 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("c"),
        F.col("dhi").alias("dc"),
    )
    wedges = e1.join(e2, "a").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    tris = wedges.join(
        oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c")),
        ["b", "c"],
        "left_semi",
    ).select("a", "b", "c")
    t_per_node = (
        tris.select(
            F.explode(F.array("a", "b", "c")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    coeff = (
        deg.filter(F.col("degree") >= 2)
        .join(t_per_node, "term", "left")
        .select(
            "term",
            (
                F.lit(2.0)
                * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1))
            ).alias("c"),
        )
    )
    return (
        coeff.select(
            F.least(F.floor(F.col("c") * 10).cast("long"), F.lit(9)).alias(
                "bucket"
            ),
            "c",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            pround(
                F.sum(F.floor(F.col("c") * 1_000_000 + F.lit(0.5)))
                / F.lit(1_000_000.0)
                / F.count(F.lit(1)),
                6,
            ).alias("mean_coeff"),
        )
    )


QUERIES["term_graph_clustering_coefficient"] = term_graph_clustering_coefficient

ORACLE["term_graph_clustering_coefficient"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    und AS (
        SELECT DISTINCT least(ws[i], ws[i + 1]) AS u,
                        greatest(ws[i], ws[i + 1]) AS v
        FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2 AND ws[i] <> ws[i + 1]
    ),
    deg AS (
        SELECT term, count(*)::BIGINT AS degree
        FROM (SELECT u AS term FROM und
              UNION ALL SELECT v AS term FROM und)
        GROUP BY term
    ),
    oriented AS (
        SELECT CASE WHEN (du.degree < dv.degree)
                      OR (du.degree = dv.degree AND e.u < e.v)
                    THEN e.u ELSE e.v END AS lo,
               CASE WHEN (du.degree < dv.degree)
                      OR (du.degree = dv.degree AND e.u < e.v)
                    THEN e.v ELSE e.u END AS hi,
               CASE WHEN (du.degree < dv.degree)
                      OR (du.degree = dv.degree AND e.u < e.v)
                    THEN dv.degree ELSE du.degree END AS dhi
        FROM und e
        JOIN deg du ON du.term = e.u
        JOIN deg dv ON dv.term = e.v
    ),
    tris AS (
        SELECT e1.a, e1.b, e2.c
        FROM (SELECT lo AS a, hi AS b, dhi AS db FROM oriented) e1
        JOIN (SELECT lo AS a, hi AS c, dhi AS dc FROM oriented) e2
          ON e2.a = e1.a
         AND ((e1.db < e2.dc) OR (e1.db = e2.dc AND e1.b < e2.c))
        WHERE EXISTS (
            SELECT 1 FROM oriented o
            WHERE o.lo = e1.b AND o.hi = e2.c
        )
    ),
    t_per_node AS (
        SELECT term, count(*)::BIGINT AS t
        FROM (SELECT a AS term FROM tris
              UNION ALL SELECT b AS term FROM tris
              UNION ALL SELECT c AS term FROM tris)
        GROUP BY term
    ),
    coeff AS (
        SELECT d.term,
               2.0 * coalesce(t.t, 0)
               / (d.degree * (d.degree - 1)) AS c
        FROM deg d LEFT JOIN t_per_node t ON t.term = d.term
        WHERE d.degree >= 2
    )
    SELECT least(CAST(floor(c * 10) AS BIGINT), 9) AS bucket,
           count(*)::BIGINT AS n_terms,
           {sql_round(
               "sum(CAST(floor(c * 1000000 + 0.5) AS BIGINT))"
               " / 1000000.0 / count(*)", 6
           )} AS mean_coeff
    FROM coeff
    GROUP BY 1
"""


def term_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the UNDIRECTED word-adjacency graph:
    Newman's r — the Pearson correlation of the two endpoint degrees
    over all edges — the one-number mixing audit completing the
    structural family (degree = size, reciprocity = direction symmetry,
    clustering = neighborhood density, assortativity = do hubs link to
    hubs?). Natural-language adjacency graphs run DISASSORTATIVE
    (function-word hubs link to rare content words, r < 0); r drifting
    toward 0/positive is template/boilerplate contamination — lists and
    navigation chrome wire hubs to hubs.

    With each undirected edge contributing its endpoint-degree pair
    (j,k) symmetrically: r = (4M·Σjk − (Σ(j+k))²) /
    (2M·Σ(j²+k²) − (Σ(j+k))²) over the M distinct edges.

    Determinism: degrees and the three edge folds are exact LONGs; the
    closing expression is fixed double arithmetic (products stay below
    2^53 at gate scale — the DECIMAL(38) upgrade is the extreme-scale
    path), 6 dp. Scale shape: one distinct-edge shuffle, one bounded
    degree aggregate, two degree joins keyed on the edge endpoints, one
    global scalar fold. No windows, no self-joins."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    pairs = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> struct(split(text, ' ')[i - 1] AS src, "
        "split(text, ' ')[i] AS dst))"
    )
    und = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select(F.explode(pairs).alias("e"))
        .filter(F.col("e.src") != F.col("e.dst"))
        .select(
            F.least("e.src", "e.dst").alias("u"),
            F.greatest("e.src", "e.dst").alias("v"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("term"))
        .union(und.select(F.col("v").alias("term")))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    edges = und.join(
        deg.select(F.col("term").alias("u"), F.col("degree").alias("j")), "u"
    ).join(
        deg.select(F.col("term").alias("v"), F.col("degree").alias("k")), "v"
    )
    sums = edges.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("j") * F.col("k")).alias("sjk"),
        F.sum(F.col("j") + F.col("k")).alias("sjpk"),
        F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k")).alias(
            "sj2k2"
        ),
    )
    n_terms = deg.agg(F.count(F.lit(1)).cast("long").alias("n_terms"))
    num = (
        F.lit(4.0) * F.col("m").cast("double") * F.col("sjk").cast("double")
        - F.col("sjpk").cast("double") * F.col("sjpk").cast("double")
    )
    den = (
        F.lit(2.0) * F.col("m").cast("double") * F.col("sj2k2").cast("double")
        - F.col("sjpk").cast("double") * F.col("sjpk").cast("double")
    )
    return sums.crossJoin(F.broadcast(n_terms)).select(
        F.col("m").alias("n_edges"),
        "n_terms",
        pround(F.when(den > 0, num / den), 6).alias("assortativity"),
    )


QUERIES["term_graph_assortativity"] = term_graph_assortativity

ORACLE["term_graph_assortativity"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    und AS (
        SELECT DISTINCT least(ws[i], ws[i + 1]) AS u,
                        greatest(ws[i], ws[i + 1]) AS v
        FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2 AND ws[i] <> ws[i + 1]
    ),
    deg AS (
        SELECT term, count(*)::BIGINT AS degree
        FROM (SELECT u AS term FROM und
              UNION ALL SELECT v AS term FROM und)
        GROUP BY term
    ),
    edges AS (
        SELECT du.degree AS j, dv.degree AS k
        FROM und e
        JOIN deg du ON du.term = e.u
        JOIN deg dv ON dv.term = e.v
    ),
    sums AS (
        SELECT count(*)::BIGINT AS m,
               sum(j * k)::BIGINT AS sjk,
               sum(j + k)::BIGINT AS sjpk,
               sum(j * j + k * k)::BIGINT AS sj2k2
        FROM edges
    )
    SELECT s.m AS n_edges,
           (SELECT count(*)::BIGINT FROM deg) AS n_terms,
           {sql_round(
               "CASE WHEN 2.0 * s.m::DOUBLE * s.sj2k2::DOUBLE"
               "          - s.sjpk::DOUBLE * s.sjpk::DOUBLE > 0"
               " THEN (4.0 * s.m::DOUBLE * s.sjk::DOUBLE"
               "       - s.sjpk::DOUBLE * s.sjpk::DOUBLE)"
               "    / (2.0 * s.m::DOUBLE * s.sj2k2::DOUBLE"
               "       - s.sjpk::DOUBLE * s.sjpk::DOUBLE) END", 6
           )} AS assortativity
    FROM sums s
"""
