"""Model-based corpus filtering — a distributed multinomial Naive Bayes
text classifier, trained and applied entirely with DataFrame aggregations.

This is the CCNet/LLaMA-pipeline "model-based quality filter" pattern (a
linear bag-of-words classifier separating a trusted slice from the rest),
distilled to Naive Bayes so that TRAINING is nothing but groupBy/sum —
no gradient loop, no Python, byte-reproducible in any engine:

    lr(t)    = ln((cnt_pos(t)+1)/(tot_pos+V)) - ln((cnt_neg(t)+1)/(tot_neg+V))
    prior    = ln((n_pos+1)/(n_neg+1))
    score(d) = prior + sum_t tf(d,t) * lr(t)
    pred     = round(score, 6) > 0      (rounded first: engine-portable)

Scale plan:
- One token explode feeds both the per-class vocabulary counts and the
  per-doc tf table (two aggregations over the same shuffle key family).
- The learned model is ONE ROW PER VOCABULARY TERM — it is an aggregate,
  joined back by term (broadcast when the vocabulary is small, AQE decides
  otherwise). Corpus-wide scalars (class totals, V, priors) are 1-row
  aggregates cross-joined broadcast inside the plan — never a separate
  .count() action, never a driver-side constant.
- Token-free documents keep a row via the left join (score = prior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import _tokens


def nb_classifier(
    documents: DataFrame, label=None
) -> DataFrame:
    """Train multinomial NB on `label` (default: lang == 'en') and score
    every document in-sample: (doc_id, score, pred)."""
    if label is None:
        label = F.col("lang") == "en"
    labeled = documents.select(
        "doc_id", "text", label.cast("boolean").alias("y")
    )
    tok = labeled.select(
        "doc_id", "y", F.explode(_tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")

    # ONE aggregation over the exploded stream; per_term re-aggregates the
    # (doc, y, term) counts, so both consumers sit on the IDENTICAL
    # hash-partition exchange and ReuseExchange runs the scan + explode
    # once (grouping straight from `tok` twice built two different
    # exchanges and re-ran the corpus explode for each — measured 2x the
    # heaviest stage). y is constant per doc, so the extra grouping key
    # adds no rows.
    tf = tok.groupBy("doc_id", "y", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    per_term = tf.groupBy("term").agg(
        F.sum(F.when(F.col("y"), F.col("tf")).otherwise(0))
        .cast("long")
        .alias("cnt_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(F.col("tf")))
        .cast("long")
        .alias("cnt_neg"),
    )
    totals = per_term.agg(
        F.sum("cnt_pos").cast("long").alias("tot_pos"),
        F.sum("cnt_neg").cast("long").alias("tot_neg"),
        F.count("*").cast("long").alias("v"),
    )
    model = per_term.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            F.log((F.col("cnt_pos") + F.lit(1.0)) / (F.col("tot_pos") + F.col("v")))
            - F.log((F.col("cnt_neg") + F.lit(1.0)) / (F.col("tot_neg") + F.col("v")))
        ).alias("lr"),
    )

    doc_sum = (
        tf.join(model, "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("lr")).alias("evidence"))
    )
    priors = labeled.agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("long").alias("n_neg"),
    )
    return (
        labeled.select("doc_id")
        .join(doc_sum, "doc_id", "left")
        .crossJoin(F.broadcast(priors))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("n_pos") + F.lit(1.0)) / (F.col("n_neg") + F.lit(1.0)))
                + F.coalesce(F.col("evidence"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .withColumn("pred", F.col("score") > 0)
    )
