"""BM25 retrieval vs a pure-Python oracle + plan-shape pins."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.retrieval import bm25_topk

CORPUS = [
    (0, "spark merge join window merge merge"),
    (1, "window window window spark"),
    (2, "completely unrelated tokens about nothing relevant"),
    (3, "spark spark spark spark spark"),
    (4, "merge"),
    (5, ""),
]
TERMS = ["spark", "window", "merge"]


def _norm_tokens(text):
    t = re.sub(" +", " ", re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
    return t.split(" ") if t else []


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: _norm_tokens(t) for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for term in terms:
            tf = tk.count(term)
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (len(tk) / avgdl))))
        if round(s, 6) > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_python_oracle(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, TERMS, k=10).collect()}
    exp = _py_bm25(CORPUS, TERMS)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=2e-6)


def test_bm25_topk_order_and_limit(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = bm25_topk(df, TERMS, k=2).collect()
    exp = sorted(_py_bm25(CORPUS, TERMS).items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [r["doc_id"] for r in rows] == [i for i, _ in exp]
    # scores strictly descending (ties broken by id keep order deterministic)
    assert rows[0]["score"] >= rows[1]["score"]


def test_bm25_plan_no_explode_no_shuffle_join(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("spark merge body number "), F.col("id")).alias("text"),
    )
    plan = bm25_topk(df, TERMS, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, never a full sort
    assert "Generate" not in plan           # no explode: tf is an array filter
    assert "SortMergeJoin" not in plan      # stats arrive via broadcast


def test_ranking_metrics_matches_float_brute(spark):
    """ranking_metrics == a float NDCG/MRR replay (within quantization);
    a perfectly ordered query scores NDCG exactly 1.0; an all-zero-rel
    query reports NDCG 0.0 and rr 0; rank > k rows are ignored."""
    import math

    from osm2geojson_spark.operators.retrieval import ranking_metrics

    rows = []
    # q0: perfectly ordered rels 3,2,1,0
    for pos, rel in enumerate([3, 2, 1, 0], 1):
        rows.append((0, pos, rel))
    # q1: worst-first ordering
    for pos, rel in enumerate([0, 0, 1, 3], 1):
        rows.append((1, pos, rel))
    # q2: all zero
    for pos in range(1, 5):
        rows.append((2, pos, 0))
    # q3: random-ish + a rank-12 row that must be ignored
    for pos, rel in enumerate([1, 0, 2, 0, 3, 1, 0, 2, 1, 0], 1):
        rows.append((3, pos, rel))
    rows.append((3, 12, 3))
    df = spark.createDataFrame(rows, "query_id long, rank int, rel int")
    got = {r["query_id"]: r for r in ranking_metrics(df, k=10).collect()}

    def brute(rels, thr=2):
        dcg = sum(
            (2**rel - 1) / math.log2(pos + 1)
            for pos, rel in enumerate(rels, 1)
        )
        idcg = sum(
            (2**rel - 1) / math.log2(pos + 1)
            for pos, rel in enumerate(sorted(rels, reverse=True), 1)
        )
        ndcg = dcg / idcg if idcg > 0 else 0.0
        first = next(
            (pos for pos, rel in enumerate(rels, 1) if rel >= thr), 0
        )
        return ndcg, first

    cases = {
        0: [3, 2, 1, 0],
        1: [0, 0, 1, 3],
        2: [0, 0, 0, 0],
        3: [1, 0, 2, 0, 3, 1, 0, 2, 1, 0],
    }
    for q, rels in cases.items():
        ndcg, first = brute(rels)
        r = got[q]
        assert r["n_ranked"] == len(rels), q
        assert abs(r["ndcg"] - ndcg) < 1e-5, q
        assert r["first_rel_pos"] == first, q
        if first:
            assert abs(r["rr_q"] / 1e6 - 1.0 / first) < 1e-5, q
        else:
            assert r["rr_q"] == 0, q
    assert got[0]["ndcg"] == 1.0
    assert got[2]["ndcg"] == 0.0 and got[2]["dcg_q"] == 0


def test_mmr_rerank_matches_serial_greedy_and_twin(spark):
    """mmr_rerank == a serial Python greedy (exact integer scores), and
    the unrolled-CTE DuckDB twin returns identical rows; diversity
    sanity: near-duplicate of the top pick is deferred."""
    import duckdb
    import numpy as np

    from osm2geojson_spark.operators.retrieval import (
        MMR_LAM,
        MMR_Q,
        mmr_rerank,
        mmr_rerank_sql,
    )

    rng = np.random.default_rng(5)
    dim = 8
    qrows, crows = [], []
    vecs = {}
    for qid in range(3):
        qv = rng.normal(size=dim).astype(np.float32)
        qrows.append((qid, [float(x) for x in qv]))
        for d in range(12):
            v = rng.normal(size=dim).astype(np.float32)
            if d == 7:  # near-duplicate of doc 0
                v = np.array(vecs[(qid, 0)], dtype=np.float32) * 1.001
            vecs[(qid, d)] = [float(x) for x in v]
            crows.append((qid, d, vecs[(qid, d)]))
    q = spark.createDataFrame(qrows, "qid long, qvec array<double>")
    c = spark.createDataFrame(crows, "qid long, doc_id long, vec array<double>")
    got = {
        (r["qid"], r["step"]): (r["doc_id"], r["mmr_score"])
        for r in mmr_rerank(q, c, k=5).collect()
    }

    def dq(a, b):
        return int(
            np.floor(
                np.asarray(a, np.float64) * np.asarray(b, np.float64) * MMR_Q
                + 0.5
            ).astype(np.int64).sum()
        )

    lam, mu = MMR_LAM, MMR_Q - MMR_LAM
    want = {}
    for qid, qv in qrows:
        docs = sorted(d for (qq, d) in vecs if qq == qid)
        rel = {d: dq(qv, vecs[(qid, d)]) for d in docs}
        sel = []
        for step in range(1, 6):
            best = None
            for d in docs:
                if d in sel:
                    continue
                if sel:
                    ms = max(dq(vecs[(qid, d)], vecs[(qid, s)]) for s in sel)
                    sc = lam * rel[d] - mu * ms
                else:
                    sc = lam * rel[d]
                if best is None or (sc, -d) > (best[1], -best[0]):
                    best = (d, sc)
            want[(qid, step)] = best
            sel.append(best[0])
    assert got == want

    duck = duckdb.connect()
    duck.execute("CREATE TABLE qt (qid BIGINT, qv DOUBLE[])")
    duck.executemany("INSERT INTO qt VALUES (?, ?)", qrows)
    duck.execute("CREATE TABLE ct (qid BIGINT, doc_id BIGINT, v DOUBLE[])")
    duck.executemany("INSERT INTO ct VALUES (?, ?, ?)", crows)
    twin = {
        (r[0], r[1]): (r[2], r[3])
        for r in duck.sql(
            mmr_rerank_sql(
                "SELECT qid, qv FROM qt",
                "SELECT qid, doc_id, v FROM ct",
                k=5,
                dim=dim,
            )
        ).fetchall()
    }
    assert twin == got

    # diversity sanity: pure relevance would rank the near-dup of the
    # top pick adjacent; MMR must NOT pick it at step 2
    for qid, qv in qrows:
        rel = {d: dq(qv, vecs[(qid, d)]) for d in range(12)}
        top = max(rel, key=lambda d: (rel[d], -d))
        dup = 7 if top == 0 else (0 if top == 7 else None)
        if dup is not None:
            assert got[(qid, 1)][0] == top
            assert got[(qid, 2)][0] != dup


def test_maxsim_brute_and_twin(spark):
    import math
    import random

    import duckdb

    from osm2geojson_spark.operators.retrieval import (
        maxsim_topk,
        maxsim_topk_sql,
    )

    rng = random.Random(23)
    dim = 16

    def vec():
        return [rng.uniform(-1, 1) for _ in range(dim)]

    # 2 queries x 3 tokens; 10 docs x 4 tokens. doc 7 contains exact
    # copies of query 0's tokens -> must be its undisputed top-1.
    qrows = [(q, t, vec()) for q in range(2) for t in range(3)]
    drows = [(d, vec()) for d in range(10) for _ in range(4)]
    drows += [(7, qv) for q, t, qv in qrows if q == 0]

    qdf = spark.createDataFrame(
        qrows, "qid long, qtok long, qvec array<double>"
    )
    ddf = spark.createDataFrame(drows, "doc_id long, vec array<double>")
    got = [
        (r["qid"], r["rnk"], r["doc_id"], r["score_micro"])
        for r in maxsim_topk(ddf, qdf, k=4)
        .orderBy("qid", "rnk")
        .collect()
    ]

    # brute force with the same quantized per-term dot
    def dq(a, b):
        return sum(math.floor(x * y * 1_000_000 + 0.5) for x, y in zip(a, b))

    want = []
    for q in range(2):
        scores = {}
        for d in range(10):
            dvs = [v for dd, v in drows if dd == d]
            scores[d] = sum(
                max(dq(qv, v) for v in dvs)
                for qq, t, qv in qrows
                if qq == q
            )
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        want += [(q, i + 1, d, s) for i, (d, s) in enumerate(top)]
    assert got == want
    # exact-copy doc wins query 0 with score == sum of self-dots
    self_score = sum(dq(qv, qv) for qq, t, qv in qrows if qq == 0)
    assert got[0][2] == 7 and got[0][3] >= self_score

    duck = duckdb.connect()
    duck.execute("CREATE TABLE qt (qid BIGINT, qtok BIGINT, qv DOUBLE[])")
    duck.executemany("INSERT INTO qt VALUES (?, ?, ?)", qrows)
    duck.execute("CREATE TABLE dt (doc_id BIGINT, v DOUBLE[])")
    duck.executemany("INSERT INTO dt VALUES (?, ?)", drows)
    twin = [
        (r[0], r[1], r[2], r[3])
        for r in duck.sql(
            maxsim_topk_sql(
                "SELECT doc_id, v FROM dt",
                "SELECT qid, qtok, qv FROM qt",
                k=4,
                dim=dim,
            )
        ).fetchall()
    ]
    assert sorted(twin) == sorted(got)


def test_rrf_fuse_brute_and_twin(spark):
    """RRF credits vs a dict brute force, paper-constant kappa=60."""
    import duckdb

    from osm2geojson_spark.operators.retrieval import rrf_fuse, rrf_fuse_sql

    rows = [
        # (qid, doc, rank) across two systems: doc 7 is #1 in A, #3 in B;
        # doc 8 only in A (#2); doc 9 is #1 in B, #2 skipped in A.
        ("q", 7, 1), ("q", 8, 2), ("q", 9, 3),
        ("q", 9, 1), ("q", 5, 2), ("q", 7, 3),
    ]
    df = spark.createDataFrame(rows, "qid string, doc long, rank long")
    got = {
        r["doc"]: (r["rrf_score"], r["n_systems"], r["fused_rank"])
        for r in rrf_fuse(df, k=3).collect()
    }

    import collections

    brute = collections.Counter()
    nsys = collections.Counter()
    for _, d, rk in rows:
        brute[d] += 1000000 // (60 + rk)
        nsys[d] += 1
    order = sorted(brute, key=lambda d: (-brute[d], d))[:3]
    want = {d: (brute[d], nsys[d], i + 1) for i, d in enumerate(order)}
    assert got == want
    # both-system docs beat single-system docs here
    assert set(got) == {7, 9, 5} or set(got) == {7, 9, 8}

    duck = duckdb.connect()
    duck.execute("CREATE TABLE rrf (qid VARCHAR, doc BIGINT, rank BIGINT)")
    duck.executemany("INSERT INTO rrf VALUES (?, ?, ?)", rows)
    twin = {
        r[1]: (r[2], r[3], r[4])
        for r in duck.sql(rrf_fuse_sql("SELECT * FROM rrf", k=3)).fetchall()
    }
    assert twin == got


def test_rocchio_expand_brute_and_twin(spark):
    """Rocchio weights vs a scalar replay on a tiny corpus: feedback
    docs' dominant co-occurring term outranks rare terms, query terms
    get the alpha boost."""
    import collections
    import duckdb

    from osm2geojson_spark.functions import hashing as H
    from osm2geojson_spark.operators.retrieval import (
        ROCCHIO_MICRO,
        bm25_topk,
        rocchio_expand,
        rocchio_expand_sql,
    )

    docs = [
        (1, "spark window merge fastpath fastpath"),
        (2, "spark window fastpath join"),
        (3, "spark merge fastpath sort"),
        (4, "unrelated words entirely different"),
        (5, "more unrelated filler text"),
    ]
    terms = ["spark", "window"]
    k, m = 3, 6
    df = spark.createDataFrame(docs, "doc_id long, text string")

    rel = [r["doc_id"] for r in bm25_topk(df, terms, k=k).collect()]

    def brute():
        tf = collections.Counter()
        dfr = collections.Counter()
        for did, text in docs:
            if did not in rel:
                continue
            toks = text.split()
            for w in toks:
                tf[w] += 1
            for w in set(toks):
                dfr[w] += 1
        nr = max(len(rel), 1)
        rows = []
        for w in tf:
            wt = (ROCCHIO_MICRO if w in terms else 0) + ROCCHIO_MICRO * tf[w] // nr
            rows.append((w, wt, w in terms, dfr[w]))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return {r[0]: r[1:] for r in rows[:m]}

    got = {
        r["term"]: (r["weight_micro"], r["in_query"], r["df_rel"])
        for r in rocchio_expand(df, terms, k=k, m=m).collect()
    }
    assert got == brute()
    # 'fastpath' co-occurs in every feedback doc -> top expansion term
    assert "fastpath" in got and not got["fastpath"][1]
    assert got["fastpath"][2] == len(rel)

    duck = duckdb.connect()
    duck.execute("CREATE TABLE rodocs (doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO rodocs VALUES (?, ?)", docs)
    twin = {
        r[0]: tuple(r[1:])
        for r in duck.sql(
            rocchio_expand_sql("rodocs", H.tokens_sql("text"), terms, k=k, m=m)
        ).fetchall()
    }
    assert twin == got
