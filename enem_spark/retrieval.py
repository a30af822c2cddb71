"""Corpus retrieval — BM25 keyword search over the documents table.

The training-data counterpart of "find me everything about X": targeted
corpus audits (which documents dominate a query?), decontamination probes,
and quality spot-checks all reduce to a bag-of-words ranked lookup.

Scale plan (the part that must survive 100 TB):
- The exploded token stream is filtered to the query terms BEFORE any
  shuffle — the surviving stream is O(matching postings), not O(corpus).
- The idf table is |query_terms| rows, built by aggregation and broadcast.
- Document lengths come from `size(split(...))` — no explode, no shuffle;
  the corpus-wide (N, avgdl) pair is a 1-row aggregate broadcast inside
  the plan (never a separate .count() action).
- Top-k is orderBy+limit = distributed TakeOrdered; the rank window runs
  on k rows only.
- Scores are rounded to 6 dp BEFORE ranking (the tfidf_top_terms
  discipline) so the DuckDB twin ranks the identical value.

Everything is built-in functions — whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .textops import _tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under Lucene-flavoured BM25.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)  (non-negative variant)
    score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Output: (doc_id, score, rank) — rank 1..k by (score desc, doc_id asc),
    ties on the ROUNDED score so ranking is engine-portable.

    Bag semantics: a term repeated in the query weights its contribution
    by its multiplicity (standard BM25 — the pure reference in
    tests/test_retrieval.py loops over terms and counts duplicates), so
    ['spark', 'spark'] scores spark-heavy docs twice as high as
    ['spark']. Distinct-term queries are unaffected (weight 1.0 is exact
    in float multiplication)."""
    from collections import Counter

    qweights = Counter(query_terms)
    weights = documents.sparkSession.createDataFrame(
        [(t, float(c)) for t, c in qweights.items()],
        "term string, qweight double",
    )
    dl = documents.select(
        "doc_id", F.size(_tokens(F.col("text"))).alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        documents.select(
            "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
        )
        .filter(F.col("term").isin(list(qweights)))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(weights), "term")
        .select(
            "term",
            "avgdl",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * F.col("qweight")
            ).alias("idf"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w))
