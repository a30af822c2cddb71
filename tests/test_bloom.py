"""Bloom-filter dedup probe: no-false-negative guarantee, bounded false
positives, filter-size bound, and plan shape (no cartesian, no UDF)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from enem_spark import textops


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=f"corpus document number {i} body") for i in range(0, 200, 2)]
    )
    probe = spark.createDataFrame(
        [Row(doc_id=i, text=f"corpus document number {i} body") for i in range(200)]
    )
    return corpus, probe


def test_no_false_negatives_and_bounded_fp(spark, frames):
    corpus, probe = frames
    got = {
        r["doc_id"]: r["bloom_hit"]
        for r in textops.bloom_dedup(probe, corpus, m=textops.PARITY_BLOOM_M).collect()
    }
    members = set(range(0, 200, 2))
    assert all(got[i] for i in members), "false negative — impossible for a bloom"
    fp = sum(1 for i in range(200) if i not in members and got[i])
    # 100 docs * 4 bits in 2048 → p_bit ~ 0.18, FP ~ p^4 ~ 0.1% — allow slack
    assert fp <= 10, f"false-positive rate implausibly high: {fp}/100"


def test_filter_size_bounded_by_m(spark, frames):
    corpus, _ = frames
    m = 64  # tiny filter: positions must saturate below m, never exceed it
    n_bits = textops.bloom_build(corpus, m=m).count()
    assert n_bits <= m
    # 100 docs * 4 hashes into 64 bits must collide heavily (sparse-form
    # row count is the memory story: bounded by m, not corpus size)
    assert n_bits >= m // 2


def test_deterministic_across_runs(spark, frames):
    corpus, probe = frames
    a = sorted(map(tuple, textops.bloom_dedup(probe, corpus, m=2048).collect()))
    b = sorted(map(tuple, textops.bloom_dedup(probe, corpus, m=2048).collect()))
    assert a == b


def test_bloom_plan_shape(spark, frames):
    corpus, probe = frames
    plan = (
        textops.bloom_dedup(probe, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "EvalPython" not in plan, "bloom path must stay JVM-side"
