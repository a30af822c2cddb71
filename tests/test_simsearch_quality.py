"""Approximation-quality guards for the ANN scale paths.

The SRP-bucket and IVF paths trade recall for candidate-set size; these
tests pin (a) that the trade is real (candidates shrink) and (b) that recall
against the exact brute-force top-k stays above a floor on the driver
embeddings table. A silent recall collapse (e.g. a broken bucket join) fails
here even though the parity oracle — which replicates the same
approximation — would still match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enem_spark import simsearch

SF_DIR = "/root/testdata/sf0.01"
QUERIES = tuple(range(10))
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact(emb):
    rows = simsearch.cosine_topk(emb, QUERIES, k=K).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx_rows, exact):
    got = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = [
        len(got.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
    ]
    return sum(per_q) / len(per_q)


def test_srp_recall_floor(emb, exact):
    rows = simsearch.srp_bucket_topk(emb, QUERIES, k=K).collect()
    r = _recall(rows, exact)
    assert r >= 0.3, f"SRP recall collapsed: {r:.2f}"


def test_ivf_recall_floor(emb, exact):
    rows = simsearch.ivf_topk(emb, QUERIES, k=K).collect()
    r = _recall(rows, exact)
    assert r >= 0.3, f"IVF recall collapsed: {r:.2f}"


def test_ivf_prunes_candidates(emb):
    """IVF must actually shrink the scan: every cell holds < half the table,
    and probing n_probe cells covers the expected fraction."""
    assigned = simsearch.ivf_assignments(emb)
    total = emb.count()
    sizes = assigned.groupBy("cell").count().collect()
    assert len(sizes) == simsearch.IVF_CELLS
    assert max(r["count"] for r in sizes) < total / 2


def test_documents_text_is_ascii(spark):
    """The media_frame_sample DuckDB oracle slices VARCHAR by characters;
    that equals the Spark side's byte slicing ONLY while the driver corpus
    is pure ASCII — assert the assumption so a testdata change fails loudly
    instead of producing subtle hash mismatches."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    excess = docs.select(
        F.max(
            F.octet_length(F.col("text")) - F.length(F.col("text"))
        ).alias("x")
    ).first()["x"]
    assert excess == 0
