"""The exactly-once commit protocol on URI-schemed stores (runfs port).

Round-4 verdict #1: the protocol's control plane used to call `os`
directly, so `require_local_store` refused every URI-schemed out_dir.
These tests re-run the crash/replay battery from
test_lineage_streaming.py against a registered object-store-semantics
implementation (`runfs.MockObjectRunFS`, scheme ``mock://``) and against
``file://`` URIs, prove via the mock's op log that the control plane
routed through the six runfs primitives, and pin the conditional-put
contract that a real S3/GCS port must satisfy."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from enem_spark import corpus, runfs
from enem_spark.extract import ExtractorConfig, extract_questions
from enem_spark.lineage import (
    committed_questions,
    require_supported_store,
    run_extraction,
)

CFG = corpus.CorpusConfig(seed=11, n_exams=4, pages_per_exam=6, questions_per_page=2)


@pytest.fixture(scope="module")
def pages_df(spark):
    return corpus.pages_dataframe(spark, CFG)


@pytest.fixture()
def mockfs(tmp_path):
    fs = runfs.MockObjectRunFS("mock", str(tmp_path / "backing"))
    runfs.register("mock", fs)
    try:
        yield fs
    finally:
        runfs.unregister("mock")


def _question_keys(df):
    return sorted(
        (r["url"], r["seq"], r["question_text"], r["correct_answer"])
        for r in df.select(
            "url", "seq", "question_text", "correct_answer"
        ).collect()
    )


# ---------------------------------------------------------------------------
# primitives: the contract a real object-store port must satisfy
# ---------------------------------------------------------------------------


def test_conditional_put_winner_takes_all(mockfs):
    """create_exclusive is the protocol's ONE synchronization primitive:
    first writer wins, loser gets FileExistsError, and the winner's
    content is never clobbered — If-None-Match semantics."""
    path = "mock://bucket/meta/v00001.json"
    mockfs.create_exclusive(path, b"winner")
    with pytest.raises(FileExistsError):
        mockfs.create_exclusive(path, b"loser")
    assert mockfs.read_bytes(path) == b"winner"
    assert ("conditional_put", path) in mockfs.ops


def test_prefix_ops_are_idempotent_and_recursive(mockfs):
    base = "mock://bucket/t"
    mockfs.write_bytes(f"{base}/run_id=r1/part-0.parquet", b"x")
    mockfs.write_bytes(f"{base}/run_id=r1/sub/part-1.parquet", b"y")
    mockfs.write_bytes(f"{base}/run_id=r2/part-0.parquet", b"z")
    assert sorted(mockfs.list_names(base)) == ["run_id=r1", "run_id=r2"]
    assert sorted(mockfs.list_files(f"{base}/run_id=r1")) == [
        "part-0.parquet",
        "sub/part-1.parquet",
    ]
    mockfs.delete_prefix(f"{base}/run_id=r1")
    mockfs.delete_prefix(f"{base}/run_id=r1")  # absent prefix: no-op
    assert mockfs.list_names(base) == ["run_id=r2"]
    assert not mockfs.exists(f"{base}/run_id=r1")


def test_unregistered_scheme_refused_loudly(pages_df, spark):
    """s3:// (or any unregistered scheme) still fails FAST — the old
    silent-degradation mode (os.path returning False on URIs, resume
    re-extracting everything) must stay unreachable."""
    cfg = ExtractorConfig(output_type="json")
    with pytest.raises(ValueError, match="s3"):
        run_extraction(spark, pages_df, cfg, "s3://bucket/out", "r1")
    require_supported_store("/plain/posix/path")  # no raise
    require_supported_store("relative/path")
    require_supported_store("file:///tmp/x")  # file:// now supported


# ---------------------------------------------------------------------------
# the crash/replay battery, re-run on a mock:// store
# ---------------------------------------------------------------------------


def test_mock_store_rerun_noop_and_resume(spark, pages_df, mockfs, tmp_path):
    out = "mock://bucket/run"
    cfg = ExtractorConfig(output_type="json")
    s1 = run_extraction(spark, pages_df, cfg, out, run_id="r1")
    assert s1["input_pages"] > 0

    got = committed_questions(spark, out)
    assert _question_keys(got) == _question_keys(
        extract_questions(pages_df, cfg)
    )
    n1 = got.count()

    # identical rerun: every document is already in processed_docs
    s2 = run_extraction(spark, pages_df, cfg, out, run_id="r2")
    assert s2["input_pages"] == 0 and s2["questions_written"] == 0
    assert committed_questions(spark, out).count() == n1

    # add new documents: only they are processed on resume
    bigger = corpus.CorpusConfig(
        seed=11, n_exams=6, pages_per_exam=6, questions_per_page=2
    )
    pages2 = corpus.pages_dataframe(spark, bigger)
    s3 = run_extraction(spark, pages2, cfg, out, run_id="r3")
    assert 0 < s3["input_pages"]
    assert _question_keys(committed_questions(spark, out)) == _question_keys(
        extract_questions(pages2, cfg)
    )

    # the control plane really went through the interface
    ops = {op for op, _ in mockfs.ops}
    assert {"exists", "list_files", "delete_prefix"} <= ops
    # and the data plane landed under the backing root, not a literal
    # 'mock:' directory in the cwd
    assert os.path.isdir(os.path.join(mockfs.root, "bucket", "run"))
    assert not os.path.exists("mock:")


def test_mock_store_replay_same_run_id_idempotent(
    spark, pages_df, mockfs
):
    """Crash-before-commit replay (same run_id) on the URI store: side
    outputs are per-run overwrite dirs, so the retry leaves the questions
    table un-doubled."""
    out = "mock://bucket/replay"
    cfg = ExtractorConfig(output_type="json")
    run_extraction(spark, pages_df, cfg, out, run_id="b0")
    n1 = committed_questions(spark, out).count()

    # crash happened before the commit point: the marker table vanishes
    mockfs.delete_prefix(f"{out}/runs")
    summary = run_extraction(spark, pages_df, cfg, out, run_id="b0")
    assert summary["input_pages"] > 0  # uncommitted docs were retried
    committed = committed_questions(spark, out)
    assert committed.count() == n1
    dups = (
        committed.groupBy("url", "seq")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0


def test_mock_store_committed_id_reuse_never_destroys(
    spark, pages_df, mockfs
):
    out = "mock://bucket/reuse"
    cfg = ExtractorConfig(output_type="json")
    s1 = run_extraction(spark, pages_df, cfg, out, run_id="r1")
    n1 = committed_questions(spark, out).count()
    assert s1["run_id"] == "r1" and n1 > 0

    bigger = corpus.CorpusConfig(
        seed=11, n_exams=6, pages_per_exam=6, questions_per_page=2
    )
    pages2 = corpus.pages_dataframe(spark, bigger)
    s2 = run_extraction(spark, pages2, cfg, out, run_id="r1")  # same id!
    assert s2["run_id"] == "r1f000001"  # re-derived, not overwritten
    combined = committed_questions(spark, out)
    assert combined.count() > n1
    assert _question_keys(combined) == _question_keys(
        extract_questions(pages2, cfg)
    )


def test_file_uri_store_end_to_end(spark, pages_df, tmp_path):
    """file:/// URIs — the shared-mount deployment spelled as a URI —
    work without registration: Spark resolves them natively and the
    control plane strips the scheme (the old code refused them because
    os.path treats 'file:///x' as relative)."""
    out = f"file://{tmp_path}/run"
    cfg = ExtractorConfig(output_type="json")
    s1 = run_extraction(spark, pages_df, cfg, out, run_id="r1")
    assert s1["input_pages"] > 0
    assert _question_keys(committed_questions(spark, out)) == _question_keys(
        extract_questions(pages_df, cfg)
    )
    s2 = run_extraction(spark, pages_df, cfg, out, run_id="r2")
    assert s2["input_pages"] == 0  # resume sees the committed run
    # and the tree really lives at the stripped path
    assert os.path.isdir(f"{tmp_path}/run/questions")


# ---------------------------------------------------------------------------
# downstream exactly-once stores on the URI store
# ---------------------------------------------------------------------------


def test_statstore_fold_and_compaction_on_mock_store(spark, mockfs):
    """The stats store's incremental == one-shot equality and the
    compaction sweep (delimiter list + prefix delete) both run through
    the control plane on a mock:// store."""
    from enem_spark import statstore, textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text", "n_chars"
    )
    kw = dict(p=textops.PARITY_HLL_P, sub_bits=textops.QSKETCH_SUB_BITS)
    incr, full = "mock://bucket/stats_incr", "mock://bucket/stats_full"
    statstore.update_corpus_stats(
        spark, incr, docs.filter(F.col("doc_id") % 2 == 0), **kw
    )
    statstore.update_corpus_stats(spark, incr, docs, **kw)
    statstore.update_corpus_stats(spark, full, docs, **kw)

    def rows(out):
        return sorted(
            tuple(r)
            for r in statstore.corpus_stat_report(spark, out, **kw).collect()
        )

    assert rows(incr) == rows(full)
    comp = statstore.compact_stats(spark, incr, **kw)
    assert comp["compacted_runs"] == 2
    assert rows(incr) == rows(full)  # compaction preserves the report
    # the sweep removed the superseded run dirs through delete_prefix
    names = mockfs.list_names(f"{incr}/{statstore.STATS_TABLE}")
    assert names == [f"run_id={comp['run_id']}"]


def test_sigindex_update_and_probe_on_mock_store(spark, mockfs):
    """The signature index maintains and probes exactly-once on the URI
    store: second update is a no-op, probe reads persisted signatures."""
    from enem_spark import sigindex

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out = "mock://bucket/sigs"
    r1 = sigindex.update_signature_index(
        spark, out, source=docs, perms=8, bands=4
    )
    assert r1["indexed"] == docs.count()
    r2 = sigindex.update_signature_index(
        spark, out, source=docs, perms=8, bands=4
    )
    assert r2["indexed"] == 0 and r2["up_to_date"]
    # re-keyed identical texts: each must hit its original in the store
    # (the estimator deliberately drops doc_id == dup_of self-pairs)
    probe_batch = docs.limit(5).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    probe = sigindex.probe_near_dups(
        spark, out, probe_batch, threshold=0.99, perms=8, bands=4
    )
    assert (
        probe.filter(F.col("doc_id") - 10_000_000 == F.col("dup_of")).count()
        == 5
    )


def test_icetable_on_mock_store(spark, mockfs):
    """The icetable commit protocol on a URI store: the version file
    commits through the conditional-put primitive (op-logged), snapshot
    isolation and time travel hold, a racing commit from the same base
    version loses with CommitConflict, and MOR row deletes apply."""
    from enem_spark.sources.icetable import CommitConflict, IceTable

    path = "mock://bucket/pages_tbl"
    df1 = spark.createDataFrame(
        [(f"u{i}", i) for i in range(10)], "url string, x long"
    )
    t = IceTable.create(spark, path, df1, sequence=100)
    assert t.read().count() == 10
    t.append(
        spark.createDataFrame([("u10", 10)], "url string, x long"),
        sequence=200,
    )
    assert t.read().count() == 11
    assert t.read(as_of=100).count() == 10  # time travel intact

    # version files went through conditional put on the mock control plane
    cond_puts = [
        pth for op, pth in mockfs.ops if op == "conditional_put"
    ]
    assert any("v00000.json" in p for p in cond_puts)
    assert any(
        "metadata/v" in p and p.startswith("mock://") for p in cond_puts
    )

    # racing commit from a stale base: the conditional put loses
    from enem_spark.sources.icetable import current_version

    stale_base = current_version(path)
    t.append(
        spark.createDataFrame([("u11", 11)], "url string, x long"),
        sequence=300,
    )
    with pytest.raises(CommitConflict):
        t._commit("append", [], 400, None, True, base_version=stale_base)

    # MOR equality delete + purge round-trip on the URI store
    t.delete_rows(
        spark.createDataFrame([("u3",)], "url string"), sequence=500
    )
    assert t.read().filter(F.col("url") == "u3").count() == 0
    t.purge_deletes(sequence=600)
    assert t.read().filter(F.col("url") == "u3").count() == 0
    assert t.read().count() == 11  # 12 rows - 1 deleted
