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


MMR_Q = 1_000_000  # similarity quantization: term = floor(a*b*1e6 + 0.5)
MMR_LAM = 700_000  # default lambda = 0.7 in micro-units


def _mmr_dot_q(a, b):
    """Quantized dot product Σ_j floor(a_j·b_j·1e6 + 0.5) — order-free
    int64, so NumPy and the SQL twin agree bit-exactly (floor and IEEE
    multiply are deterministic; a plain float dot would differ in
    summation order between engines)."""
    import numpy as np

    t = np.floor(
        a.astype(np.float64) * b.astype(np.float64) * MMR_Q + 0.5
    ).astype(np.int64)
    return t.sum(axis=-1)


def mmr_rerank(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    lam_micro: int = MMR_LAM,
) -> DataFrame:
    """(qid, step, doc_id, mmr_score) — MAXIMAL MARGINAL RELEVANCE
    re-ranking (Carbonell & Goldstein 1998), the diversity-aware
    selection that every dedup-conscious retrieval / training-data
    curation pipeline runs after ANN: greedily pick k candidates
    maximizing

        lam·rel(d) − (1e6−lam)·max_{s∈selected} sim(d, s)

    with rel = quantized query·doc dot and sim = quantized doc·doc dot
    (both integer micro-units via ``_mmr_dot_q``), ties broken by
    ascending doc id. Step 1 has no selected set: score = lam·rel.
    All-integer scoring → the greedy trace is engine-independent and a
    k-step unrolled SQL twin hash-matches exactly.

    Inputs: ``queries`` (qid, qvec), ``candidates`` (qid, doc_id, vec).

    Scale: MMR runs AFTER candidate generation, so each query group is
    ANN-top-N small (tens to hundreds); the greedy + its pairwise sims
    run inside one Arrow batch per query (applyInPandas, O(k·N) sims
    per query since sim columns are computed lazily per selected doc).
    Queries parallelize across the cluster; nothing global shuffles."""
    import numpy as np
    import pandas as pd

    joined = candidates.join(queries, "qid").select(
        "qid", "doc_id", "vec", "qvec"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"qid": [], "step": [], "doc_id": [], "mmr_score": []}
            )
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        qid = pdf["qid"].iloc[0]
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        qv = np.asarray(pdf["qvec"].iloc[0], dtype=np.float64)
        rel = _mmr_dot_q(V, qv[None, :])
        n = len(pdf)
        lam = int(lam_micro)
        mu = MMR_Q - lam
        selected: list[int] = []
        maxsim = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        out = {"qid": [], "step": [], "doc_id": [], "mmr_score": []}
        for step in range(1, min(k, n) + 1):
            if selected:
                score = lam * rel - mu * maxsim
            else:
                score = lam * rel
            score = np.where(
                np.isin(np.arange(n), selected), np.iinfo(np.int64).min, score
            )
            best = int(np.argmax(score))  # ties: lowest index = lowest doc_id
            out["qid"].append(qid)
            out["step"].append(step)
            out["doc_id"].append(int(pdf["doc_id"].iloc[best]))
            out["mmr_score"].append(int(score[best]))
            selected.append(best)
            sims = _mmr_dot_q(V, V[best][None, :])
            maxsim = np.maximum(maxsim, sims)
        return pd.DataFrame(out)

    return joined.groupBy("qid").applyInPandas(
        fn, schema="qid long, step int, doc_id long, mmr_score long"
    )


def mmr_rerank_sql(
    queries_cte: str,
    cands_cte: str,
    k: int = 5,
    lam_micro: int = MMR_LAM,
    dim: int = 64,
) -> str:
    """DuckDB twin of mmr_rerank: the greedy unrolled as k chained CTEs
    (sel1..sel{k}), identical quantized-dot arithmetic over
    unnest(generate_series) index joins. ``queries_cte`` -> (qid, qv
    DOUBLE[]), ``cands_cte`` -> (qid, doc_id, v DOUBLE[])."""
    lam = int(lam_micro)
    mu = MMR_Q - lam
    def dot(u, w):
        return (
            f"(SELECT CAST(sum(CAST(floor({u}[j] * {w}[j] * {MMR_Q} + 0.5)"
            f" AS BIGINT)) AS BIGINT)"
            f" FROM unnest(generate_series(1, {dim})) t(j))"
        )

    rel_dot = dot("a.qv", "b.v")
    sim_dot = dot("a.v", "b2.v2")
    parts = [
        f"q AS ({queries_cte})",
        f"c AS ({cands_cte})",
        f"""rel AS (
  SELECT b.qid, b.doc_id, {rel_dot} AS rel
  FROM c b JOIN q a ON a.qid = b.qid
)""",
        f"""sims AS (
  SELECT a.qid, a.doc_id AS d1, b2.doc_id AS d2, {sim_dot} AS sim
  FROM (SELECT qid, doc_id, v FROM c) a
  JOIN (SELECT qid, doc_id, v AS v2 FROM c) b2
    ON b2.qid = a.qid
)""",
        f"""sel1 AS (
  SELECT qid, doc_id, {lam} * rel AS mmr_score
  FROM rel QUALIFY row_number() OVER (
    PARTITION BY qid ORDER BY {lam} * rel DESC, doc_id ASC) = 1
)""",
    ]
    prev_sel = ["sel1"]
    for i in range(2, k + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT qid, doc_id FROM {s}" for s in prev_sel
        )
        parts.append(
            f"""picked{i} AS ({sel_union})""")
        parts.append(
            f"""sc{i} AS (
  SELECT r.qid, r.doc_id,
         {lam} * r.rel - {mu} * (
           SELECT max(s.sim) FROM sims s
           WHERE s.qid = r.qid AND s.d1 = r.doc_id
             AND s.d2 IN (SELECT doc_id FROM picked{i} p WHERE p.qid = r.qid)
         ) AS mmr_score
  FROM rel r
  WHERE r.doc_id NOT IN
        (SELECT doc_id FROM picked{i} p2 WHERE p2.qid = r.qid)
)""")
        parts.append(
            f"""sel{i} AS (
  SELECT qid, doc_id, mmr_score FROM sc{i}
  QUALIFY row_number() OVER (
    PARTITION BY qid ORDER BY mmr_score DESC, doc_id ASC) = 1
)""")
        prev_sel.append(f"sel{i}")
    final = " UNION ALL ".join(
        f"SELECT qid, {i} AS step, doc_id, mmr_score FROM sel{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT qid, CAST(step AS INTEGER) AS step, doc_id, mmr_score"
        f" FROM ({final})"
    )


def maxsim_topk(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 5,
) -> DataFrame:
    """(qid, rnk, doc_id, score_micro, score) — LATE-INTERACTION
    retrieval (ColBERT, Khattab & Zaharia SIGIR 2020): multi-vector
    MaxSim scoring.  Each query and each document is a BAG of token
    vectors; the score is

        score(q, d) = Σ_{t ∈ q} max_{u ∈ d} <t, u>

    with every dot quantized per-term (``_mmr_dot_q``: Σ_j floor(t_j ·
    u_j · 1e6 + 0.5), order-free int64) so the score — and therefore the
    top-k and its tie-breaks (score DESC, doc_id ASC) — is bit-identical
    between NumPy and the SQL twin.

    Inputs: ``doc_tokens`` (doc_id, vec array<double>) one row per
    document token; ``query_tokens`` (qid, qtok, qvec) one row per query
    token.  Queries are the fixed benchmark/prompt set and broadcast
    (collected once — same fixed-query shape as ``bm25_topk``); the
    corpus NEVER shuffles raw vectors: the Arrow kernel reduces each
    batch to per-(doc_id, qid, qtok) partial maxima, so shuffle rows are
    O(docs · |q|) ints, independent of tokens-per-doc, and the max →
    sum cascade is combinable (map-side partial max).  Top-k per query
    is a tiny window over O(docs) score rows; at corpus scale swap it
    for TakeOrdered per qid.  No per-row Python anywhere."""
    import numpy as np
    import pandas as pd

    qrows = sorted(
        query_tokens.select("qid", "qtok", "qvec").collect(),
        key=lambda r: (r["qid"], r["qtok"]),
    )
    qids = np.asarray([r["qid"] for r in qrows], dtype=np.int64)
    qtoks = np.asarray([r["qtok"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["qvec"], dtype=np.float64) for r in qrows])
    m = len(qrows)

    def fn(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            D = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            n = len(pdf)
            dots = np.empty((n, m), dtype=np.int64)
            for t in range(m):  # loop keeps peak memory at one n x 64
                dots[:, t] = _mmr_dot_q(D, Q[t][None, :])
            part = pd.DataFrame(
                {
                    "doc_id": np.repeat(
                        pdf["doc_id"].to_numpy(np.int64), m
                    ),
                    "qid": np.tile(qids, n),
                    "qtok": np.tile(qtoks, n),
                    "idot": dots.reshape(-1),
                }
            )
            # in-batch partial max: one row per (doc, qid, qtok) leaves
            yield part.groupby(
                ["doc_id", "qid", "qtok"], as_index=False
            )["idot"].max()

    partial = doc_tokens.select("doc_id", "vec").mapInPandas(
        fn, schema="doc_id long, qid long, qtok long, idot long"
    )
    mx = partial.groupBy("qid", "doc_id", "qtok").agg(
        F.max("idot").alias("mtok")
    )
    sc = mx.groupBy("qid", "doc_id").agg(
        F.sum("mtok").alias("score_micro")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
        .select(
            "qid",
            "rnk",
            "doc_id",
            "score_micro",
            (F.col("score_micro") / 1000000.0).alias("score"),
        )
    )


def maxsim_topk_sql(
    doc_tokens_cte: str,
    query_tokens_cte: str,
    k: int = 5,
    dim: int = 64,
) -> str:
    """DuckDB twin of maxsim_topk — identical quantized per-term dots
    via unnest(generate_series) index joins, max per (qid, doc, qtok),
    sum per (qid, doc), row_number top-k.  ``doc_tokens_cte`` ->
    (doc_id, v DOUBLE[]); ``query_tokens_cte`` -> (qid, qtok, qv
    DOUBLE[])."""
    return f"""
WITH d AS ({doc_tokens_cte}),
q AS ({query_tokens_cte}),
dots AS (
  SELECT q.qid, q.qtok, d.doc_id,
         (SELECT CAST(sum(CAST(floor(q.qv[j] * d.v[j] * {MMR_Q} + 0.5)
                 AS BIGINT)) AS BIGINT)
          FROM unnest(generate_series(1, {dim})) t(j)) AS idot
  FROM q CROSS JOIN d
),
mx AS (
  SELECT qid, doc_id, qtok, max(idot) AS mtok FROM dots GROUP BY 1, 2, 3
),
sc AS (
  SELECT qid, doc_id, CAST(sum(mtok) AS BIGINT) AS score_micro
  FROM mx GROUP BY 1, 2
)
SELECT qid, CAST(rnk AS INTEGER) AS rnk, doc_id, score_micro,
       CAST(score_micro AS DOUBLE) / 1000000.0 AS score
FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (
           PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC) AS rnk
  FROM sc
)
WHERE rnk <= {int(k)}
"""


def rrf_fuse(
    rankings: DataFrame,
    k: int = 10,
    kappa: int = 60,
    qid_col: str = "qid",
    doc_col: str = "doc",
    rank_col: str = "rank",
) -> DataFrame:
    """(qid, doc, rrf_score, n_systems, fused_rank) — RECIPROCAL RANK
    FUSION (Cormack/Clarke/Buettcher 2009): merge the ranked lists of
    several retrieval systems (BM25, dense ANN, ...) into one list by

        score(d) = Σ_systems  1000000 DIV (kappa + rank_s(d))

    — the hybrid-search combiner every lexical+vector stack ships
    (kappa = 60 is the paper constant). The credit is an exact integer
    (truncating DIV on positives), so the sum is order-free and the
    DuckDB twin is bit-identical; ties are pinned by (score DESC,
    doc ASC). ``rankings`` holds one row per (qid, system, doc) with
    that system's 1-based rank; systems may return different depths.

    Scale: one combinable groupBy(qid, doc) rollup over the union of
    system lists (each system's list is already top-depth small per
    query), then a per-qid window for the final top-k — partitioned by
    query, never a global sort."""
    from pyspark.sql.window import Window

    scored = (
        rankings.select(
            F.col(qid_col).alias("qid"),
            F.col(doc_col).alias("doc"),
            F.expr(f"1000000 DIV ({kappa} + CAST({rank_col} AS BIGINT))").alias(
                "_cr"
            ),
        )
        .groupBy("qid", "doc")
        .agg(
            F.sum("_cr").cast("long").alias("rrf_score"),
            F.count(F.lit(1)).cast("long").alias("n_systems"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("rrf_score").desc(), F.col("doc").asc()
    )
    return (
        scored.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= k)
    )


def rrf_fuse_sql(rankings_cte: str, k: int = 10, kappa: int = 60) -> str:
    """DuckDB twin of rrf_fuse. ``rankings_cte`` -> (qid, doc, rank)."""
    return f"""
WITH rrf_src AS ({rankings_cte}),
rrf_sc AS (
  SELECT qid, doc,
         CAST(SUM(1000000 // ({kappa} + CAST(rank AS BIGINT))) AS BIGINT)
           AS rrf_score,
         CAST(COUNT(*) AS BIGINT) AS n_systems
  FROM rrf_src GROUP BY 1, 2
),
rrf_rk AS (
  SELECT qid, doc, rrf_score, n_systems,
         CAST(row_number() OVER (PARTITION BY qid
              ORDER BY rrf_score DESC, doc ASC) AS BIGINT) AS fused_rank
  FROM rrf_sc
)
SELECT * FROM rrf_rk WHERE fused_rank <= {k}
"""


ROCCHIO_MICRO = 1_000_000  # expansion-weight fixed point


def rocchio_expand(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    m: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, weight_micro, in_query, df_rel) — ROCCHIO PSEUDO-
    RELEVANCE-FEEDBACK query expansion (α = β = 1): the BM25 top-``k``
    documents are assumed relevant and their centroid term mass is
    added to the query —

        weight(w) = 10⁶·[w ∈ Q]  +  (10⁶ · Σ_{d∈R} tf_d(w)) DIV |R|

    — the classic recall lever of every search stack, composed over
    bm25_topk (reused verbatim, stats broadcast and all). Output is
    the top-``m`` terms by (weight DESC, term ASC); df_rel counts how
    many feedback docs contain the term. All arithmetic integer
    (truncating DIV on nonnegatives), so the composition is
    engine-exact even though the BM25 scores inside are floats — only
    the SET of top-k ids crosses the boundary, and those are pinned
    by bm25_topk's rounded-score ordering.

    Scale: one broadcast of the k feedback ids against the token
    explode (leftsemi), one combinable term rollup."""
    rel = bm25_topk(docs, query_terms, k=k, id_col=id_col, text_col=text_col)
    # the k-row feedback set is consumed twice (count + leftsemi probe):
    # materialize it once so the BM25 scan doesn't execute twice
    rel_ids = rel.select(id_col).localCheckpoint()
    n_rel = rel_ids.count()
    toks = (
        docs.join(F.broadcast(rel_ids), id_col, "leftsemi")
        .select(
            F.explode(H.tokens_col(F.col(text_col))).alias("term"),
            F.col(id_col).alias("_d"),
        )
    )
    mass = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf_sum"),
        F.countDistinct("_d").cast("long").alias("df_rel"),
    )
    w = (
        F.when(F.col("term").isin(*query_terms), F.lit(ROCCHIO_MICRO))
        .otherwise(F.lit(0))
        + F.expr(f"CAST({ROCCHIO_MICRO} * tf_sum DIV {max(n_rel, 1)} AS BIGINT)")
    ).cast("long")
    from pyspark.sql.window import Window as _W

    ranked = mass.select(
        "term",
        w.alias("weight_micro"),
        F.col("term").isin(*query_terms).alias("in_query"),
        "df_rel",
    ).withColumn(
        "_rk",
        F.row_number().over(
            _W.orderBy(F.col("weight_micro").desc(), F.col("term").asc())
        ),
    )
    return ranked.filter(F.col("_rk") <= m).drop("_rk")


def rocchio_expand_sql(
    table: str,
    tokens_sql_expr: str,
    query_terms: list[str],
    k: int = 10,
    m: int = 10,
    n_rel_expr: str | None = None,
) -> str:
    """DuckDB twin of rocchio_expand — nests bm25_topk_sql for the
    feedback set, replays the integer weight assembly."""
    bm25 = bm25_topk_sql(table, tokens_sql_expr, query_terms, k=k)
    terms_list = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH ro_rel AS (SELECT doc_id FROM ({bm25})),
ro_n AS (SELECT GREATEST(COUNT(*), 1) AS nr FROM ro_rel),
ro_tok AS (
  SELECT d.doc_id, unnest({tokens_sql_expr}) AS term
  FROM {table} d JOIN ro_rel USING (doc_id)
),
ro_mass AS (
  SELECT term, COUNT(*) AS tf_sum, COUNT(DISTINCT doc_id) AS df_rel
  FROM ro_tok GROUP BY 1
),
ro_w AS (
  SELECT term,
         CAST(CASE WHEN term IN ({terms_list}) THEN {ROCCHIO_MICRO}
                   ELSE 0 END
              + ({ROCCHIO_MICRO} * tf_sum) // (SELECT nr FROM ro_n)
              AS BIGINT) AS weight_micro,
         term IN ({terms_list}) AS in_query,
         CAST(df_rel AS BIGINT) AS df_rel
  FROM ro_mass
),
ro_rk AS (
  SELECT *, row_number() OVER (ORDER BY weight_micro DESC, term ASC) AS rk
  FROM ro_w
)
SELECT term, weight_micro, in_query, df_rel FROM ro_rk WHERE rk <= {m}
"""
