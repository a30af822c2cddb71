"""Persisted IVF index (vecindex.py): exactly-once maintenance runs,
commit-gated reads, config pinning, centroid pinning across runs, orphan
invisibility with replay-overwrite, and store-backed search == fresh
search at any coverage (the sig-store contract applied to ANN)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from enem_spark import simsearch, vecindex

SF_DIR = "/root/testdata/sf0.001"
C, D = simsearch.IVF_CELLS, simsearch.SRP_DIM


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _first_batch(emb):
    # must carry vec_id < C: the creation run pins centroids from its source
    return emb.filter((F.col("vec_id") < C) | (F.col("vec_id") % 2 == 0))


def test_build_resume_noop(spark, tmp_path):
    out = str(tmp_path / "idx")
    emb = _emb(spark)
    n_total = emb.count()
    first = _first_batch(emb)
    n_first = first.count()

    r1 = vecindex.update_ivf_index(spark, out, first, n_cells=C, dim=D)
    assert r1 == {
        "indexed": n_first,
        "run_id": vecindex.ivf_run_id(C, D, 1),
        "up_to_date": False,
    }
    r2 = vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    assert r2["indexed"] == n_total - n_first and not r2["up_to_date"]
    r3 = vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    assert r3["indexed"] == 0 and r3["up_to_date"]

    store = vecindex.committed_assignments(spark, out, C, D)
    assert store.count() == n_total
    assert store.select("vec_id").distinct().count() == n_total
    assert set(store.columns) == {"vec_id", "cell"}
    # the no-op third run committed no marker
    assert spark.read.parquet(f"{out}/runs").count() == 2
    # centroids written ONCE, by the creation run
    cent_runs = os.listdir(f"{out}/{vecindex.CENT_TABLE}")
    assert cent_runs == [f"run_id={vecindex.ivf_run_id(C, D, 1)}"]


def test_assignments_match_fresh_kernel(spark, tmp_path):
    """Stored cells (built across TWO runs — run 2 assigns against STORED
    centroids) must equal a one-shot fresh assignment of the whole corpus:
    the pinned-centroid path and the fresh path are the same kernel."""
    out = str(tmp_path / "idx")
    emb = _emb(spark)
    vecindex.update_ivf_index(spark, out, _first_batch(emb), n_cells=C, dim=D)
    vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    stored = {
        (r.vec_id, r.cell)
        for r in vecindex.committed_assignments(spark, out, C, D).collect()
    }
    fresh = {
        (r.vec_id, r.cell)
        for r in simsearch.ivf_assignments(emb, C)
        .select("vec_id", "cell")
        .collect()
    }
    assert stored == fresh


def test_store_backed_topk_equals_fresh(spark, tmp_path):
    """ivf_topk(index_store=) must return EXACTLY the fresh rows, at full
    AND partial coverage (uncovered vectors assigned on the fly against
    the stored centroids)."""
    emb = _emb(spark)
    base = sorted(tuple(r) for r in simsearch.ivf_topk(emb).collect())
    assert base  # non-vacuous

    full = str(tmp_path / "full")
    vecindex.update_ivf_index(spark, full, emb, n_cells=C, dim=D)
    partial = str(tmp_path / "partial")
    vecindex.update_ivf_index(
        spark, partial, _first_batch(emb), n_cells=C, dim=D
    )
    for store in (full, partial):
        got = sorted(
            tuple(r)
            for r in simsearch.ivf_topk(
                emb, index_store=store, dim=D
            ).collect()
        )
        assert got == base


def test_config_is_pinned(spark, tmp_path):
    out = str(tmp_path / "idx")
    emb = _emb(spark)
    vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    with pytest.raises(ValueError, match="one index, one config"):
        vecindex.update_ivf_index(spark, out, emb, n_cells=C * 2, dim=D)
    with pytest.raises(ValueError, match="one index, one config"):
        vecindex.committed_assignments(spark, out, C, D + 1)
    with pytest.raises(ValueError, match="one index, one config"):
        simsearch.ivf_topk(emb, index_store=out, n_cells=4, dim=D)


def test_missing_store_raises_not_falls_back(spark, tmp_path):
    """A search pointed at an empty store must raise — a silent fallback
    to full re-scoring would hide exactly the cost the store removes."""
    with pytest.raises(ValueError, match="no committed ivf index"):
        simsearch.ivf_topk(
            _emb(spark), index_store=str(tmp_path / "nope"), dim=D
        )


def test_orphan_invisible_then_replay_overwrites(spark, tmp_path):
    """A crashed attempt's directory (no marker) is invisible to readers;
    the retry derives the SAME run id from committed ids, overwrites the
    junk, and the final store matches the fresh kernel."""
    out = str(tmp_path / "idx")
    emb = _emb(spark)
    vecindex.update_ivf_index(spark, out, _first_batch(emb), n_cells=C, dim=D)

    orphan_id = vecindex.ivf_run_id(C, D, 2)
    junk = pd.DataFrame({"vec_id": [1, 3, 5], "cell": [99, 99, 99]})
    spark.createDataFrame(junk).write.mode("overwrite").parquet(
        f"{out}/{vecindex.ASSIGN_TABLE}/run_id={orphan_id}"
    )

    store = vecindex.committed_assignments(spark, out, C, D)
    assert store.filter(F.col("cell") == 99).count() == 0  # orphan invisible

    r = vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    assert r["run_id"] == orphan_id  # replay reuses the orphan's id
    stored = {
        (r.vec_id, r.cell)
        for r in vecindex.committed_assignments(spark, out, C, D).collect()
    }
    fresh = {
        (r.vec_id, r.cell)
        for r in simsearch.ivf_assignments(emb, C)
        .select("vec_id", "cell")
        .collect()
    }
    assert stored == fresh


def test_empty_update_writes_nothing(spark, tmp_path):
    out = str(tmp_path / "idx")
    emb = _emb(spark)
    vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    r = vecindex.update_ivf_index(
        spark, out, emb.filter(F.lit(False)), n_cells=C, dim=D
    )
    assert r["indexed"] == 0 and r["up_to_date"]
    assert spark.read.parquet(f"{out}/runs").count() == 1


B, T = simsearch.SRP_BITS, simsearch.SRP_TABLES


def test_pure_delta_batch_without_centroid_ids(spark, tmp_path):
    """The steady-state maintenance shape: after creation, every new
    embedding batch carries ONLY new vec_ids (no vec_id < n_cells rows) —
    the run must assign it against the STORED centroids, and the result
    must equal the fresh kernel over the union corpus."""
    out = str(tmp_path / "idx")
    emb = _emb(spark)
    old = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)  # no centroid ids at all
    vecindex.update_ivf_index(spark, out, old, n_cells=C, dim=D)
    r = vecindex.update_ivf_index(spark, out, delta, n_cells=C, dim=D)
    assert r["indexed"] == delta.count() and not r["up_to_date"]
    stored = {
        (r.vec_id, r.cell)
        for r in vecindex.committed_assignments(spark, out, C, D).collect()
    }
    fresh = {
        (r.vec_id, r.cell)
        for r in simsearch.ivf_assignments(emb, C)
        .select("vec_id", "cell")
        .collect()
    }
    assert stored == fresh


def test_srp_build_resume_noop_and_config_pin(spark, tmp_path):
    out = str(tmp_path / "idx")
    emb = _emb(spark)
    n_total = emb.count()
    n_even = emb.filter(F.col("vec_id") % 2 == 0).count()
    r1 = vecindex.update_srp_index(
        spark, out, emb.filter(F.col("vec_id") % 2 == 0), bits=B, tables=T, dim=D
    )
    assert r1 == {
        "indexed": n_even,
        "run_id": vecindex.srp_run_id(B, T, D, 1),
        "up_to_date": False,
    }
    r2 = vecindex.update_srp_index(spark, out, emb, bits=B, tables=T, dim=D)
    assert r2["indexed"] == n_total - n_even and not r2["up_to_date"]
    r3 = vecindex.update_srp_index(spark, out, emb, bits=B, tables=T, dim=D)
    assert r3["indexed"] == 0 and r3["up_to_date"]

    tags = vecindex.committed_srp_tags(spark, out, B, T, D)
    assert tags.count() == n_total * T  # one bucket row per (vector, table)
    assert set(tags.columns) == {"vec_id", "table", "bucket"}
    with pytest.raises(ValueError, match="one index, one config"):
        vecindex.committed_srp_tags(spark, out, B + 1, T, D)
    with pytest.raises(ValueError, match="one index, one config"):
        vecindex.update_srp_index(spark, out, emb, bits=B, tables=T * 2, dim=D)


def test_srp_store_backed_ops_equal_fresh(spark, tmp_path):
    """All three SRP consumers with ``index_store=`` must return EXACTLY
    the fresh rows, at full AND partial coverage."""
    emb = _emb(spark)
    full = str(tmp_path / "full")
    vecindex.update_srp_index(spark, full, emb, bits=B, tables=T, dim=D)
    partial = str(tmp_path / "partial")
    vecindex.update_srp_index(
        spark, partial, emb.filter(F.col("vec_id") % 2 == 0),
        bits=B, tables=T, dim=D,
    )

    cases = [
        (lambda **kw: simsearch.srp_bucket_topk(emb, dim=D, **kw)),
        (lambda **kw: simsearch.embedding_near_dup(
            emb, threshold=0.35, dim=D, **kw)),
        (lambda **kw: simsearch.embedding_decontaminate(emb, dim=D, **kw)),
    ]
    for op in cases:
        fresh = sorted(tuple(r) for r in op().collect())
        assert fresh  # non-vacuous
        for store in (full, partial):
            got = sorted(tuple(r) for r in op(index_store=store).collect())
            assert got == fresh


def test_srp_missing_store_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no committed srp index"):
        simsearch.srp_bucket_topk(
            _emb(spark), dim=D, index_store=str(tmp_path / "nope")
        ).collect()


def test_families_share_runs_table_without_interference(spark, tmp_path):
    """ivf and srp runs coexist in ONE out_dir/runs table: each family's
    readers see only their own committed runs, and each family's config
    pin ignores the other's ids (the statstore stats/terms pattern)."""
    out = str(tmp_path / "idx")
    emb = _emb(spark)
    vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    vecindex.update_srp_index(spark, out, emb, bits=B, tables=T, dim=D)
    runs = {r.run_id for r in spark.read.parquet(f"{out}/runs").collect()}
    assert runs == {
        vecindex.ivf_run_id(C, D, 1),
        vecindex.srp_run_id(B, T, D, 1),
    }
    n = emb.count()
    assert vecindex.committed_assignments(spark, out, C, D).count() == n
    assert vecindex.committed_srp_tags(spark, out, B, T, D).count() == n * T
    # a foreign ivf config would raise even though srp runs exist, and
    # vice versa — neither family's check sees the other's ids
    with pytest.raises(ValueError, match="one index, one config"):
        vecindex.committed_assignments(spark, out, C * 2, D)
    with pytest.raises(ValueError, match="one index, one config"):
        vecindex.committed_srp_tags(spark, out, B * 2, T, D)


def test_ivf_probe_serving_path(spark, tmp_path):
    """ivf_probe_topk (external query vectors) must equal ivf_topk when
    the queries are the corpus' own vectors, fresh AND store-backed; a
    genuinely external vector (fresh id, known direction) must find its
    corpus original at cosine 1.0 rank 1; zero-norm queries raise."""
    emb = _emb(spark)
    internal = sorted(tuple(r) for r in simsearch.ivf_topk(emb).collect())
    ext = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert internal == sorted(
        tuple(r) for r in simsearch.ivf_probe_topk(emb, ext).collect()
    )
    out = str(tmp_path / "idx")
    vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    assert internal == sorted(
        tuple(r)
        for r in simsearch.ivf_probe_topk(
            emb, ext, index_store=out, dim=D
        ).collect()
    )
    # truly external: corpus vectors under fresh ids find their originals
    fresh_ext = emb.filter(F.col("vec_id").isin(10, 20, 30)).select(
        (F.col("vec_id") + 1_000_000).alias("query_id"), "embedding"
    )
    hits = simsearch.ivf_probe_topk(
        emb, fresh_ext, index_store=out, dim=D
    ).collect()
    top = {r.query_id: (r.neighbor_id, r.cosine) for r in hits if r.rank == 1}
    assert top == {
        1_000_010: (10, 1.0), 1_000_020: (20, 1.0), 1_000_030: (30, 1.0)
    }
    # a zero-norm query vector must raise, not silently return no rows
    zero = spark.createDataFrame(
        [(5_000_000, [0.0] * D)], "query_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="query ids absent"):
        simsearch.ivf_probe_topk(emb, zero, index_store=out, dim=D)


def test_srp_dim_mismatch_refuses_loudly(spark, tmp_path):
    """Review finding (r5): a configured dim that mismatches the real
    embedding length NULLs every projection dot and every bucket bit
    falls to '0' — the whole corpus in ONE bucket, LSH degenerated to
    O(n^2), silently; with the persistent store that poison would be
    COMMITTED. The tagging kernel's in-plan guard must refuse on both
    the store-maintenance and fresh query paths."""
    out = str(tmp_path / "idx")
    emb = _emb(spark)
    with pytest.raises(Exception, match="dim mismatch"):
        vecindex.update_srp_index(spark, out, emb, bits=B, tables=T, dim=32)
    assert not os.path.exists(f"{out}/runs")  # nothing committed
    with pytest.raises(Exception, match="dim mismatch"):
        simsearch.srp_bucket_topk(emb, dim=48).collect()


def test_search_query_id_validation(spark, tmp_path):
    """Review finding (r5): srp_bucket_topk/ivf_topk silently returned no
    rows for absent query ids — the misconfiguration class _query_frame
    kills for cosine_topk/pq_topk; all four operators must raise."""
    emb = _emb(spark)
    with pytest.raises(ValueError, match="query ids absent"):
        simsearch.srp_bucket_topk(emb, query_ids=(0, 1, 99999), dim=D)
    with pytest.raises(ValueError, match="query ids absent"):
        simsearch.ivf_topk(emb, query_ids=(99999,))


def test_corrupted_store_refuses_update(spark, tmp_path):
    """Review finding (r5): committed run ids with missing table dirs
    (half-copied store) must refuse the next maintenance run loudly, not
    blame the centroid convention or crash opaquely."""
    import shutil

    out = str(tmp_path / "idx")
    emb = _emb(spark)
    vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    shutil.rmtree(f"{out}/{vecindex.CENT_TABLE}")
    with pytest.raises(ValueError, match="corrupted or moved"):
        vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)


def test_creation_without_centroid_ids_raises(spark, tmp_path):
    """A creation source missing the vec_id < n_cells convention must
    raise (ivf_assignments' validation) BEFORE anything is written — a
    degenerate index would poison every later probe."""
    out = str(tmp_path / "idx")
    emb = _emb(spark).filter(F.col("vec_id") >= C)
    with pytest.raises(ValueError, match="centroid convention"):
        vecindex.update_ivf_index(spark, out, emb, n_cells=C, dim=D)
    assert not os.path.exists(f"{out}/runs")
