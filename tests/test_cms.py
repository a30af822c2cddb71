"""Count-min sketch (textops.cms_sketch / cms_estimate / cms_topk):
one-sided error (never underestimates), near-exactness at the engine
config (width >> vocabulary), planted heavy hitters surface at rank 1,
and sketches over disjoint slices merge by SUM into exactly the one-shot
sketch (the property that makes the sketch maintainable incrementally)."""

import pytest
from pyspark.sql import functions as F

from enem_spark import textops

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )


def _toks(docs):
    return docs.select(
        F.col("source").alias("grp"),
        "doc_id",
        F.explode(textops._tokens(F.col("text"))).alias("v"),
    )


def test_never_underestimates_parity_config(spark):
    """At the deliberately tiny parity width (64 cols), collisions are
    plentiful — the estimate may exceed the exact count but must NEVER
    fall below it, for every single token."""
    toks = _toks(_docs(spark))
    sketch = textops.cms_sketch(
        toks, ["grp"], "v",
        textops.PARITY_CMS_DEPTH, textops.PARITY_CMS_WIDTH,
    )
    est = textops.cms_estimate(
        sketch, toks, ["grp"], "v",
        textops.PARITY_CMS_DEPTH, textops.PARITY_CMS_WIDTH,
    )
    exact = toks.groupBy("grp", "v").agg(F.count("*").alias("c"))
    joined = est.join(exact, ["grp", "v"]).persist()
    try:
        assert joined.filter(F.col("est_count") < F.col("c")).count() == 0
        # and collisions DO happen at this width, or the parity twin
        # wouldn't be exercising the interesting part of the contract
        assert joined.filter(F.col("est_count") > F.col("c")).count() > 0
    finally:
        joined.unpersist()


def test_engine_config_is_near_exact(spark):
    """At the engine config (4 x 16384 cells) the sf0.001 vocabulary is
    tiny relative to the width, so almost every estimate is exactly the
    true count."""
    toks = _toks(_docs(spark))
    sketch = textops.cms_sketch(toks, ["grp"], "v")
    est = textops.cms_estimate(sketch, toks, ["grp"], "v")
    exact = toks.groupBy("grp", "v").agg(F.count("*").alias("c"))
    joined = est.join(exact, ["grp", "v"]).persist()
    try:
        n = joined.count()
        n_exact = joined.filter(F.col("est_count") == F.col("c")).count()
        assert n_exact / n >= 0.99, (n_exact, n)
    finally:
        joined.unpersist()


def test_planted_heavy_hitter_ranks_first(spark):
    """A term planted more often than any real token's frequency must come
    out of cms_topk at rank 1 for its source, with the exact count (engine
    config; the sample always contains it since it's in every doc)."""
    docs = _docs(spark)
    planted = docs.withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" "), F.expr("repeat('zzheavy ', 19)"),
                 F.lit("zzheavy")),
    )
    n_docs_per_src = (
        planted.groupBy("source").count().withColumnRenamed("count", "nd")
    )
    # sample_mod=1: every doc is a candidate source, so every source has
    # rows (at 25 docs/source a 1/8 sample can miss a whole source; at
    # real scale a heavy hitter is in the sample w.h.p.)
    top = textops.cms_topk(planted, k=1, sample_mod=1)
    row = {r.source: (r.term, r.est_count) for r in top.collect()}
    for r in n_docs_per_src.collect():
        term, est = row[r.source]
        assert term == "zzheavy", (r.source, term)
        assert est == 20 * r.nd, (r.source, est, 20 * r.nd)


def test_sketches_merge_by_sum(spark):
    """cms_sketch over two disjoint doc slices, summed cell-wise, equals
    the one-shot sketch over the union bit-for-bit — the merge that lets a
    persisted sketch store fold crawl increments without re-reading
    committed text."""
    docs = _docs(spark)
    toks_all = _toks(docs)
    # != 0 (not == 1): Spark % is a signed remainder, so a content-addressed
    # negative doc_id would otherwise fall into neither slice
    a = _toks(docs.filter(F.col("doc_id") % 2 == 0))
    b = _toks(docs.filter(F.col("doc_id") % 2 != 0))
    kw = (textops.PARITY_CMS_DEPTH, textops.PARITY_CMS_WIDTH)
    merged = (
        textops.cms_sketch(a, ["grp"], "v", *kw)
        .unionByName(textops.cms_sketch(b, ["grp"], "v", *kw))
        .groupBy("grp", "row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    one_shot = textops.cms_sketch(toks_all, ["grp"], "v", *kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, one_shot.collect())
    )
