"""Full-text retrieval: BM25 scoring + top-k over a document corpus.

The classic Okapi BM25 of Robertson & Zaragoza 2009 ("The Probabilistic
Relevance Framework"), idf = ln(1 + (N - df + 0.5)/(df + 0.5)) so scores are
always >= 0.

Spark-first shape — for a FIXED query (the common "score the corpus against
this prompt/benchmark question" pipeline step), no inverted index is built
at all: per-term term frequencies are `size(filter(tokens, t -> t = term))`
array expressions in whole-stage codegen, so the corpus scan is ONE pass
with no explode and no shuffle.  Corpus statistics (N, avgdl, per-term df)
are a single 1-row aggregate broadcast back over the scan, and the top-k is
Spark's TakeOrderedAndProject (per-partition heaps + driver merge of k rows,
never a full sort).  Total cost at 100 TB: two scans of (id, dl, tf...) —
the second one feeds from the first's narrow projection — and k rows moved.

For ad-hoc many-query workloads an inverted index (explode + groupBy term)
amortizes better; that shape already exists in this repo as the shingle
inverted index of operators/dedup.py::ngram_jaccard_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import hashing as H


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score) — the ``k`` highest-BM25 documents for ``query_terms``,
    score descending, ties broken by ascending id on the 6-dp-rounded score
    (rounding makes the ordering reproducible across engines; see module
    docstring for the plan shape)."""
    toks = H.tokens_col(F.col(text_col))

    def tf_expr(term):
        # single-arg lambda via closure: a two-arg lambda would make Spark
        # pass the array INDEX as the second argument
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    d = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[tf_expr(term).alias(f"tf{i}") for i, term in enumerate(query_terms)],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    )
    j = d.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        part = idf * (
            (tf * F.lit(k1 + 1.0))
            / (
                tf
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl")))
            )
        )
        score = part if score is None else score + part
    scored = j.select(F.col(id_col), F.round(score, 6).alias("score")).filter(
        F.col("score") > 0
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def bm25_topk_sql(
    table: str,
    tokens_sql_expr: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical formula structure and
    literal constants (same fold of k1+1 and 1-b), so every arithmetic step
    is the same float64 operation sequence in both engines."""
    tfs = ",\n       ".join(
        f"len(list_filter(t, x -> x = '{term}')) AS tf{i}"
        for i, term in enumerate(query_terms)
    )
    dfs = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query_terms))
    )
    parts = " + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * ((tf{i} * {k1 + 1.0}) / (tf{i} + {k1} * ({1.0 - b} + {b} * (dl / avgdl))))"
        for i in range(len(query_terms))
    )
    return f"""
WITH toks AS (SELECT {id_col}, {tokens_sql_expr} AS t FROM {table}),
d AS (SELECT {id_col}, len(t) AS dl,
       {tfs}
      FROM toks),
s AS (SELECT count(*) AS n, avg(dl) AS avgdl, {dfs} FROM d)
SELECT {id_col}, score FROM (
  SELECT {id_col}, round({parts}, 6) AS score FROM d, s
) WHERE score > 0
ORDER BY score DESC, {id_col} LIMIT {k}
"""


def ranking_metrics(
    ranked: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
    rel_threshold: int = 2,
) -> DataFrame:
    """RANKING-QUALITY METRICS (NDCG@k + reciprocal rank) per query — the
    standard retrieval/reranker evaluation a training pipeline runs over
    eval sets (Järvelin & Kekäläinen 2002).

        DCG@k  = sum_{pos<=k} (2^rel - 1) / log2(pos + 1)
        NDCG@k = DCG@k / IDCG@k   (IDCG = DCG of the ideal ordering)
        RR     = 1 / first position with rel >= rel_threshold

    Exactness scheme: the only irrational inputs are the k position
    discounts 1/log2(pos+1) and the k reciprocals 1/pos, so both are
    quantized ONCE driver-side (round(1e6/...) int64) and inlined as a
    literal map into the plan — gains (2^rel - 1) are exact ints, DCG/
    IDCG/RR become order-free integer sums, and the engine's log/ln
    never runs. The SQL twin inlines the identical constants
    (`ranking_metrics_weights`). NDCG is one replayable double division;
    a query with IDCG 0 (all rels 0) reports NDCG 0.0 and rr_q 0.

    The ideal ordering ties (equal rel) are pinned by ascending
    ``rank_col``, so IDCG is deterministic. Rows with rank > k are
    ignored. Returns (query_col, n_ranked, dcg_q, idcg_q, ndcg,
    first_rel_pos, rr_q).

    Scale: one shuffle on query_col (the ideal-rank window + the final
    groupBy share it); everything else is literal-map lookups in
    whole-stage codegen."""
    import math

    w_disc = {p: round(1e6 / math.log2(p + 1)) for p in range(1, k + 1)}
    w_rr = {p: round(1e6 / p) for p in range(1, k + 1)}
    disc_map = F.create_map(
        *[F.lit(x) for p in range(1, k + 1) for x in (p, w_disc[p])]
    )
    rr_map = F.create_map(
        *[F.lit(x) for p in range(1, k + 1) for x in (p, w_rr[p])]
    )
    q, r, rel = F.col(query_col), F.col(rank_col), F.col(rel_col)
    topk = ranked.filter(r <= k).select(
        q.alias("_q"),
        r.cast("int").alias("_pos"),
        rel.cast("long").alias("_rel"),
    )
    gain = F.pow(F.lit(2.0), F.col("_rel")).cast("long") - 1
    ideal_pos = F.row_number().over(
        Window.partitionBy("_q").orderBy(
            F.col("_rel").desc(), F.col("_pos").asc()
        )
    )
    scored = topk.select(
        "_q",
        "_pos",
        "_rel",
        (gain * disc_map[F.col("_pos")]).alias("_dcg_term"),
    ).withColumn("_ideal_pos", ideal_pos)
    scored = scored.withColumn(
        "_idcg_term",
        (gain * disc_map[F.col("_ideal_pos")]),
    ).withColumn(
        "_hit_pos",
        F.when(F.col("_rel") >= rel_threshold, F.col("_pos")),
    )
    out = scored.groupBy(F.col("_q").alias(query_col)).agg(
        F.count(F.lit(1)).cast("int").alias("n_ranked"),
        F.sum("_dcg_term").alias("dcg_q"),
        F.sum("_idcg_term").alias("idcg_q"),
        F.min("_hit_pos").alias("_first"),
    )
    return out.select(
        query_col,
        "n_ranked",
        "dcg_q",
        "idcg_q",
        F.when(F.col("idcg_q") > 0,
               F.col("dcg_q").cast("double") / F.col("idcg_q"))
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
        F.coalesce(F.col("_first"), F.lit(0)).cast("int").alias(
            "first_rel_pos"
        ),
        F.coalesce(rr_map[F.col("_first")], F.lit(0)).cast("long").alias(
            "rr_q"
        ),
    )


def ranking_metrics_weights(k: int = 10) -> tuple[dict, dict]:
    """The exact integer weight tables ranking_metrics inlines — exposed
    so SQL twins replay the identical constants."""
    import math

    return (
        {p: round(1e6 / math.log2(p + 1)) for p in range(1, k + 1)},
        {p: round(1e6 / p) for p in range(1, k + 1)},
    )
