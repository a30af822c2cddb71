"""bm25_search — pinned against a pure-Python BM25 computed from first
principles on a tiny corpus (the DuckDB twin parity lives in
test_entry_parity)."""

from __future__ import annotations

import math

from enem_spark import retrieval


def _bm25_reference(texts, terms, k1=retrieval.BM25_K1, b=retrieval.BM25_B):
    toks = {d: t.strip().split() for d, t in texts.items()}
    dl = {d: max(len(v), 1) for d, v in toks.items()}
    # match the engine: split(trim('')) yields [''] -> dl 1 for blank docs
    n = len(texts)
    avgdl = sum(dl.values()) / n
    scores = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            contrib = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * dl[d] / avgdl)
            )
            scores[d] = scores.get(d, 0.0) + contrib
    return {d: round(s, 6) for d, s in scores.items()}


def test_bm25_matches_reference(spark):
    texts = {
        1: "spark shuffles the hash join across the cluster",
        2: "hash hash hash everywhere",
        3: "window functions rank rows",
        4: "the spark window hash trio appears once each",
        5: "nothing relevant here at all",
        6: "",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    terms = ["spark", "hash", "window"]
    got = {
        r.doc_id: (r.score, r.rank)
        for r in retrieval.bm25_search(df, terms, k=4).collect()
    }
    exp = _bm25_reference(texts, terms)
    # 4 docs match; doc 5 and the empty doc never appear
    assert set(got) == {1, 2, 3, 4}
    for d, (score, _) in got.items():
        assert abs(score - exp[d]) < 1e-6, (d, score, exp[d])
    # ranks follow (score desc, doc_id asc)
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert order == [d for d in sorted(exp, key=lambda d: (-exp[d], d))][:4]


def test_bm25_duplicate_query_terms_weight_by_multiplicity(spark):
    """Bag semantics: ['hash','hash','spark'] weights hash's contribution
    2x — matching the reference loop, which visits the duplicate — instead
    of silently collapsing to the distinct set."""
    texts = {
        1: "spark shuffles the hash join across the cluster",
        2: "hash hash hash everywhere",
        4: "the spark window hash trio appears once each",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    terms = ["hash", "hash", "spark"]
    got = {
        r.doc_id: r.score for r in retrieval.bm25_search(df, terms, k=3).collect()
    }
    exp = _bm25_reference(texts, terms)
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-6, (d, got[d], exp[d])
    # and the weighting really changed the outcome vs the distinct query
    got_distinct = {
        r.doc_id: r.score
        for r in retrieval.bm25_search(df, ["hash", "spark"], k=3).collect()
    }
    assert got[2] > got_distinct[2]


def test_bm25_topk_truncates(spark):
    df = spark.createDataFrame(
        [(i, "common term text") for i in range(20)], ["doc_id", "text"]
    )
    out = retrieval.bm25_search(df, ["common"], k=5).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
    # all-equal scores: doc_id ascending breaks the tie deterministically
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == [0, 1, 2, 3, 4]
