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


def _candidate_fraction(emb, bits, tables) -> float:
    """Mean fraction of the table a query's union-of-buckets touches —
    the work the LSH actually saves over a scan."""
    from enem_spark.simsearch import _srp_exploded, with_norm

    base = with_norm(emb)
    n = base.count()
    tagged = _srp_exploded(base, bits, tables).select("vec_id", "table", "bucket")
    q = tagged.filter(F.col("vec_id").isin(*QUERIES)).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cand = (
        tagged.join(q, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .groupBy("query_id")
        .count()
        .agg(F.avg("count").alias("m"))
        .first()["m"]
    )
    return cand / n


def test_srp_engine_config_same_recall_fewer_candidates(emb, exact):
    """The engine operating point (8 bits x 32 tables) must match the
    parity config's recall while touching a clearly smaller fraction of
    the table per query — more bits shrink buckets 16x, more tables buy
    the recall back (the L-table LSH trade the scale path relies on)."""
    from enem_spark.simsearch import ENGINE_SRP_BITS, ENGINE_SRP_TABLES, SRP_BITS, SRP_TABLES

    r_parity = _recall(
        simsearch.srp_bucket_topk(emb, QUERIES, k=K).collect(), exact
    )
    r_engine = _recall(
        simsearch.srp_bucket_topk(
            emb, QUERIES, k=K, bits=ENGINE_SRP_BITS, tables=ENGINE_SRP_TABLES
        ).collect(),
        exact,
    )
    assert r_engine >= r_parity - 0.1, (
        f"engine recall {r_engine:.2f} fell below parity {r_parity:.2f}"
    )
    f_parity = _candidate_fraction(emb, SRP_BITS, SRP_TABLES)
    f_engine = _candidate_fraction(emb, ENGINE_SRP_BITS, ENGINE_SRP_TABLES)
    assert f_engine < 0.75 * f_parity, (
        f"engine candidates {f_engine:.3f} not smaller than parity {f_parity:.3f}"
    )


def test_ivf_engine_config_recall(emb, exact):
    """IVF at a deployment-shaped config (more cells, more probes): recall
    must hold as the cell grid refines — the n_probe/n_cells fraction is
    the scan the scale path pays."""
    rows = simsearch.ivf_topk(emb, QUERIES, k=K, n_cells=32, n_probe=8).collect()
    r = _recall(rows, exact)
    assert r >= 0.5, f"engine-config IVF recall too low: {r:.2f}"


def test_embedding_decontaminate_recall_and_shape(emb):
    """SRP blocking may miss flagged docs vs the exact benchmark sweep;
    pin the recall floor and the output contract (every non-benchmark row
    present exactly once, clean rows carry NULL max_cos)."""
    bench = (0, 1, 2, 3, 4)
    tau = 0.35
    got = simsearch.embedding_decontaminate(
        emb, benchmark_ids=bench, threshold=tau
    ).collect()
    n_total = emb.count()
    assert len(got) == n_total - len(bench)
    assert len({r.vec_id for r in got}) == len(got)
    flagged = {r.vec_id for r in got if not r.is_clean}
    for r in got:
        if r.is_clean:
            assert r.n_hits == 0 and r.max_cos is None
        else:
            assert r.n_hits >= 1 and r.max_cos >= tau

    # exact sweep: brute-force cosine of every corpus vector vs the 5
    # benchmark vectors (495 x 5 — cheap), same rounding discipline
    base = simsearch.with_norm(emb)
    bv = base.filter(F.col("vec_id").isin(*bench)).select(
        F.col("vec").alias("bvec"), F.col("norm").alias("bnorm")
    )
    exact_flagged = {
        r.vec_id
        for r in base.filter(~F.col("vec_id").isin(*bench))
        .crossJoin(F.broadcast(bv))
        .withColumn(
            "cos",
            F.round(
                simsearch._dot(F.col("vec"), F.col("bvec"))
                / (F.col("norm") * F.col("bnorm")),
                6,
            ),
        )
        .filter(F.col("cos") >= tau)
        .select("vec_id")
        .distinct()
        .collect()
    }
    assert flagged <= exact_flagged  # blocking never invents a hit
    assert exact_flagged, "tau too high: exact sweep found nothing"
    recall = len(flagged & exact_flagged) / len(exact_flagged)
    assert recall >= 0.5, (recall, len(flagged), len(exact_flagged))


def test_srp_projections_follow_embedding_dim(spark):
    """128-dim embeddings must hash into real buckets: a projection set
    hardcoded at 64 dims made zip_with pad with NULLs, every bit fall to
    '0', and the LSH blocking silently degenerate to ONE global bucket
    (full O(n^2) pair join — the exact failure the blocking exists to
    avoid)."""
    import math
    import random

    rng = random.Random(7)
    rows = [
        (i, [math.sin(i * 131 + j) + rng.uniform(-0.1, 0.1) for j in range(128)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = simsearch.with_norm(emb)
    tagged = simsearch._srp_exploded(
        base, simsearch.SRP_BITS, simsearch.SRP_TABLES,
        simsearch._resolve_dim(emb, None),
    )
    per_table = (
        tagged.groupBy("table").agg(
            F.countDistinct("bucket").alias("n_buckets")
        ).collect()
    )
    assert all(r.n_buckets > 1 for r in per_table), per_table
    # end-to-end: near-dup over the 128-dim frame must not crash and the
    # default config must still find the planted duplicate pair
    dup = emb.union(
        spark.createDataFrame(
            [(1000, rows[0][1])], "vec_id long, embedding array<double>"
        )
    )
    pairs = simsearch.embedding_near_dup(dup, threshold=0.99).collect()
    assert any(p.vec_a == 0 and p.vec_b == 1000 for p in pairs)


def test_decontaminate_rejects_absent_benchmark_ids(spark):
    """A benchmark set missing from the table must raise, not report the
    whole corpus clean."""
    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(4)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="absent"):
        simsearch.embedding_decontaminate(
            emb, benchmark_ids=(5000, 5001), dim=4
        )


def test_ivf_rejects_missing_centroid_ids(spark):
    """ids not starting at 0 -> zero/partial centroids -> must raise, not
    silently return empty results."""
    emb = spark.createDataFrame(
        [(i + 1000, [float(i + j) for j in range(4)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="centroid"):
        simsearch.ivf_assignments(emb, n_cells=8)


def test_pq_recall_floors_and_refine(emb, exact):
    """PQ floors on this near-random corpus: pure integer-ADC recall sits
    in the SRP/IVF-parity regime, and the refine path (ADC shortlist ->
    exact cosine re-rank of refine*k rows per query) buys recall back —
    the codes-select / vectors-verify deployment shape."""
    adc = simsearch.pq_topk(emb, QUERIES, k=K, n_cent=16).collect()
    r_adc = _recall(adc, exact)
    assert r_adc >= 0.2, f"PQ ADC recall collapsed: {r_adc:.2f}"
    refined = simsearch.pq_topk(emb, QUERIES, k=K, n_cent=16, refine=4).collect()
    r_ref = _recall(refined, exact)
    assert r_ref >= 0.4, f"refined PQ recall too low: {r_ref:.2f}"
    assert r_ref >= r_adc, "refine must not lose recall vs raw ADC"
    # refined rows carry exact cosines consistent with the ground truth's
    # value range (sanity on the re-rank join, not just the ids)
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in refined)


def test_pq_codes_are_bounded_state(emb):
    """The memory claim is structural: every vector compresses to m codes
    in [0, n_cent) — the corpus-side search state is m small ints per
    vector, never the dim floats."""
    rows = simsearch.pq_codes(emb, m=simsearch.PQ_M, k=simsearch.PQ_K).collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r["codes"]) == simsearch.PQ_M
        assert all(0 <= c < simsearch.PQ_K for c in r["codes"])
