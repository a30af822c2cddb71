"""Persisted MinHash signature index (sigindex.py): exactly-once
maintenance runs, commit-gated reads, config pinning, orphan invisibility
with replay-overwrite, and probe == recompute equivalence. The icetable
integration test is the steady-state story: extract a snapshot delta, sign
it, probe the next crawl against the store."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from enem_spark import icerun, lineage, sigindex, textops
from enem_spark.sources import icetable as it

SF_DIR = "/root/testdata/sf0.001"
P, B = textops.PARITY_PERMS, textops.PARITY_BANDS


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def test_build_resume_noop(spark, tmp_path):
    """Two maintenance runs cover the corpus without re-signing; a third is
    a committed-nothing no-op."""
    out = str(tmp_path / "idx")
    docs = _docs(spark)
    n_total = docs.count()
    n_even = docs.filter(F.col("doc_id") % 2 == 0).count()

    r1 = sigindex.update_signature_index(
        spark, out, source=docs.filter(F.col("doc_id") % 2 == 0), perms=P, bands=B
    )
    assert r1 == {
        "indexed": n_even,
        "run_id": sigindex.sig_run_id(P, B, 1),
        "up_to_date": False,
    }
    r2 = sigindex.update_signature_index(spark, out, source=docs, perms=P, bands=B)
    assert r2["indexed"] == n_total - n_even and not r2["up_to_date"]
    r3 = sigindex.update_signature_index(spark, out, source=docs, perms=P, bands=B)
    assert r3["indexed"] == 0 and r3["up_to_date"]

    store = sigindex.committed_signatures(spark, out, perms=P, bands=B)
    assert store.count() == n_total
    assert store.select("doc_id").distinct().count() == n_total
    assert set(store.columns) == {"doc_id", *(f"mh{s}" for s in range(P))}
    # the no-op third run committed no marker
    runs = spark.read.parquet(f"{out}/runs")
    assert runs.count() == 2


def _new_increment(docs):
    base = F.col("doc_id") + F.lit(1_000_000)
    exact = docs.filter(F.col("doc_id") % 3 == 0).select(base.alias("doc_id"), "text")
    near = docs.filter(F.col("doc_id") % 3 == 1).select(
        base.alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz1 zz2")).alias("text"),
    )
    return exact.unionByName(near)


def test_probe_equals_recompute(spark, tmp_path):
    """The store-backed probe must return EXACTLY what the recompute path
    (incremental_minhash_dedup over raw text) returns — same estimator,
    existing side swapped for the persisted table."""
    out = str(tmp_path / "idx")
    docs = _docs(spark)
    sigindex.update_signature_index(spark, out, source=docs, perms=P, bands=B)
    new = _new_increment(docs)

    via_store = {
        (r.doc_id, r.dup_of): r.est_jaccard
        for r in sigindex.probe_near_dups(
            spark, out, new, threshold=0.5, perms=P, bands=B
        ).collect()
    }
    recompute = {
        (r.doc_id, r.dup_of): r.est_jaccard
        for r in textops.incremental_minhash_dedup(
            new, docs, threshold=0.5, perms=P, bands=B
        ).collect()
    }
    assert via_store == recompute
    assert via_store  # planted exact copies guarantee non-empty


def test_config_is_pinned(spark, tmp_path):
    out = str(tmp_path / "idx")
    docs = _docs(spark)
    sigindex.update_signature_index(spark, out, source=docs, perms=P, bands=B)
    with pytest.raises(ValueError, match="one index, one config"):
        sigindex.update_signature_index(spark, out, source=docs, perms=P, bands=2)
    with pytest.raises(ValueError, match="one index, one config"):
        sigindex.probe_near_dups(spark, out, docs, perms=16, bands=4)
    with pytest.raises(ValueError, match="one index, one config"):
        sigindex.committed_signatures(spark, out, perms=P, bands=2)


def test_orphan_invisible_then_replay_overwrites(spark, tmp_path):
    """A crashed attempt's directory (no marker) is invisible to readers;
    the retry derives the SAME run id from committed ids and overwrites."""
    out = str(tmp_path / "idx")
    docs = _docs(spark)
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    odds = docs.filter(F.col("doc_id") % 2 == 1)
    sigindex.update_signature_index(spark, out, source=evens, perms=P, bands=B)

    # simulate a crashed second attempt: sig rows written, marker never
    orphan_id = sigindex.sig_run_id(P, B, 2)
    junk = textops.minhash_signatures(
        odds.withColumn("text", F.lit("junk junk junk junk")), None, P
    )
    junk.write.mode("overwrite").parquet(
        f"{out}/{sigindex.SIG_TABLE}/run_id={orphan_id}"
    )

    store = sigindex.committed_signatures(spark, out, perms=P, bands=B)
    even_ids = {r.doc_id for r in evens.select("doc_id").collect()}
    assert {r.doc_id for r in store.collect()} == even_ids  # orphan invisible

    r = sigindex.update_signature_index(spark, out, source=docs, perms=P, bands=B)
    assert r["run_id"] == orphan_id  # replay reuses the orphan's id
    store = sigindex.committed_signatures(spark, out, perms=P, bands=B)
    assert store.count() == docs.count()
    # the junk signatures are gone: odd docs' stored sigs equal fresh ones
    fresh = textops.minhash_signatures(odds, None, P)
    assert (
        store.join(odds.select("doc_id"), "doc_id", "left_semi")
        .exceptAll(fresh)
        .count()
        == 0
    )


def test_empty_update_writes_nothing(spark, tmp_path):
    out = str(tmp_path / "idx")
    empty = _docs(spark).filter(F.lit(False))
    r = sigindex.update_signature_index(spark, out, source=empty, perms=P, bands=B)
    assert r["indexed"] == 0 and r["up_to_date"]
    assert not os.path.exists(f"{out}/{sigindex.SIG_TABLE}")
    assert not os.path.exists(f"{out}/runs")
    # default source with no committed main content is the same no-op
    r = sigindex.update_signature_index(spark, out, perms=P, bands=B)
    assert r == {"indexed": 0, "run_id": None, "up_to_date": True}


def _html(i: int) -> bytes:
    words = " ".join(f"palavra{(i * 7 + k) % 53}" for k in range(40))
    return (
        f"<html><head><title>doc {i}</title></head><body>"
        f"<p>{words} documento {i}.</p>"
        f"<p>Outro paragrafo com conteudo suficiente para o classificador "
        f"do documento {i} considerar texto principal.</p></body></html>"
    ).encode("utf-8")


def _rows(ids, ts0: int):
    return [
        {
            "url": f"https://ex.org/d/{i}",
            "warc_ts": pd.Timestamp(ts0 + i, unit="s"),
            "html": _html(i),
            "text": f"doc {i}",
            "lang": "pt",
        }
        for i in ids
    ]


def _frame(rows):
    return pd.DataFrame(rows, columns=[f.name for f in it.PAGES_ICE_SCHEMA.fields])


def test_steady_state_over_icetable(spark, tmp_path):
    """The 100TB tail loop: extract snapshot -> sign delta (default source
    = committed main content) -> append crawl -> extract delta -> sign ONLY
    the delta -> probe a re-crawl against the store and find its originals."""
    tbl, out = str(tmp_path / "tbl"), str(tmp_path / "out")
    t = it.IceTable.create(
        spark,
        tbl,
        spark.createDataFrame(_frame(_rows(range(12), it.EPOCH_S)), schema=it.PAGES_ICE_SCHEMA),
        partition_by=(it.Transform("b_url", "bucket", "url", 4),),
        sequence=1,
    )
    icerun.run_html_extraction_ice(spark, tbl, out)
    r1 = sigindex.update_signature_index(spark, out, perms=P, bands=B)
    assert r1["indexed"] == 12

    t.append(
        spark.createDataFrame(_frame(_rows(range(12, 18), it.EPOCH_S + 100)), schema=it.PAGES_ICE_SCHEMA),
        2,
    )
    icerun.run_html_extraction_ice(spark, tbl, out)
    r2 = sigindex.update_signature_index(spark, out, perms=P, bands=B)
    assert r2["indexed"] == 6  # delta only — earlier docs never re-signed

    # a verbatim re-crawl probes the store and matches its original's main
    main = lineage.committed_main_content(spark, out)
    recrawl = main.filter(F.col("doc_id") % 2 == 0).select(
        # deterministic fresh id (the frame is evaluated more than once)
        F.xxhash64(F.col("doc_id").cast("string")).alias("doc_id"),
        F.col("main_text").alias("text"),
        F.col("doc_id").alias("orig"),
    )
    pairs = sigindex.probe_near_dups(
        spark, out, recrawl.select("doc_id", "text"), threshold=0.9, perms=P, bands=B
    )
    want = {(r.doc_id, r.orig) for r in recrawl.select("doc_id", "orig").collect()}
    got = {(r.doc_id, r.dup_of) for r in pairs.collect()}
    assert want <= got
    for r in pairs.join(
        recrawl.select("doc_id", "orig"), "doc_id"
    ).filter(F.col("dup_of") == F.col("orig")).collect():
        assert r.est_jaccard == 1.0


def test_probing_already_indexed_increment_yields_no_self_dups(spark, tmp_path):
    """Review finding (r3): the documented maintenance flow (extract an
    increment, sign it, probe) puts the SAME docs on both sides of the
    band join — every doc used to report itself as a duplicate with
    est 1.0, and a dedup consumer would drop the whole batch."""
    out = str(tmp_path / "idx")
    docs = _docs(spark).limit(120)
    sigindex.update_signature_index(spark, out, source=docs, perms=P, bands=B)
    hits = sigindex.probe_near_dups(
        spark, out, docs, threshold=0.5, perms=P, bands=B
    )
    self_pairs = hits.filter(F.col("doc_id") == F.col("dup_of")).count()
    assert self_pairs == 0
    # genuine cross-doc near-dups (if any) still surface
    assert hits.filter(F.col("doc_id") != F.col("dup_of")).count() >= 0


def test_crashed_foreign_config_orphan_does_not_poison_reads(spark, tmp_path):
    """Review finding (r3): a first maintenance attempt under a DIFFERENT
    (perms, bands) config that crashes pre-commit leaves an orphan run dir
    whose schema a bare directory read could resolve — the committed-path
    read must ignore it entirely."""
    out = str(tmp_path / "idx")
    docs = _docs(spark).limit(80)
    # orphan from a crashed 4-perm attempt (no commit marker)
    orphan = sigindex.sig_run_id(4, 2, 1)
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "mh0": ["x"], "mh1": ["x"],
                      "mh2": ["x"], "mh3": ["x"]})
    ).write.mode("overwrite").parquet(
        f"{out}/{sigindex.SIG_TABLE}/run_id={orphan}"
    )
    # real maintenance under the engine parity config commits fine
    r = sigindex.update_signature_index(spark, out, source=docs, perms=P, bands=B)
    assert r["indexed"] == 80
    sig = sigindex.committed_signatures(spark, out, perms=P, bands=B)
    assert sig.count() == 80 and f"mh{P-1}" in sig.columns
    # and probing still works end-to-end
    probe = sigindex.probe_near_dups(
        spark, out, docs.limit(10), threshold=0.5, perms=P, bands=B
    )
    assert probe.filter(F.col("doc_id") == F.col("dup_of")).count() == 0


def _pair_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_lsh_family_consumes_sig_store(spark, tmp_path):
    """minhash_lsh_pairs / minhash_estimate_pairs / dedup_clusters with
    ``sig_store=`` must produce IDENTICAL rows to the from-text path, at
    full AND partial coverage (uncovered docs are signed on the fly) —
    the r4-verdict ask: the pair stage reads persisted signatures
    instead of re-signing the corpus per query."""
    docs = _docs(spark)
    # plant near-dups so the pair set is non-trivial
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tail tail")).alias("text"),
    )
    corpus = docs.unionByName(near)

    full = str(tmp_path / "full")
    sigindex.update_signature_index(spark, full, source=corpus, perms=P, bands=B)
    partial = str(tmp_path / "partial")
    sigindex.update_signature_index(
        spark, partial, source=corpus.filter(F.col("doc_id") % 2 == 0),
        perms=P, bands=B,
    )

    base_est = _pair_rows(
        textops.minhash_estimate_pairs(corpus, 0.3, perms=P, bands=B)
    )
    assert base_est  # non-vacuous
    for store in (full, partial):
        assert base_est == _pair_rows(
            textops.minhash_estimate_pairs(
                corpus, 0.3, perms=P, bands=B, sig_store=store
            )
        )

    base_exact = _pair_rows(
        textops.minhash_lsh_pairs(corpus, 0.3, perms=P, bands=B)
    )
    assert base_exact == _pair_rows(
        textops.minhash_lsh_pairs(
            corpus, 0.3, perms=P, bands=B, sig_store=full
        )
    )

    base_clusters = _pair_rows(
        textops.dedup_clusters(corpus, 0.3, perms=P, bands=B)
    )
    assert base_clusters == _pair_rows(
        textops.dedup_clusters(
            corpus, 0.3, perms=P, bands=B, sig_store=full
        )
    )

    # config mismatch surfaces loudly through the sigindex validation
    with pytest.raises(ValueError, match="one index, one config"):
        textops.minhash_estimate_pairs(
            corpus, 0.3, perms=P + 8, bands=B, sig_store=full
        ).count()
