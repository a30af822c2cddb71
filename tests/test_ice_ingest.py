"""Streaming crawl ingestion into an icetable (start_ice_ingest_stream):
per-batch snapshot commits keyed by batch_id, checkpoint-replay
idempotence, and the full loop stream -> table -> incremental extraction."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from enem_spark import icerun
from enem_spark.htmlops import extract_mains
from enem_spark.sources import icetable as it
from enem_spark.streaming import start_ice_ingest_stream

from test_icerun import _frame, _html, _rows


def _write_wave(spark, in_dir: str, rows, name: str) -> None:
    df = spark.createDataFrame(_frame(rows), schema=it.PAGES_ICE_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(in_dir, name))


def _stream(spark, in_dir: str):
    return spark.readStream.schema(it.PAGES_ICE_SCHEMA).parquet(
        os.path.join(in_dir, "*")
    )


def _run_stream(spark, in_dir, tbl, ckpt):
    q = start_ice_ingest_stream(
        _stream(spark, in_dir),
        tbl,
        ckpt,
        partition_by=(it.Transform("b_url", "bucket", "url", 4),),
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_to_table_to_incremental_extraction(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(in_dir)

    _write_wave(spark, in_dir, _rows(range(12), it.EPOCH_S), "wave1")
    _run_stream(spark, in_dir, tbl, ckpt)

    t = it.IceTable(spark, tbl)
    assert t.exists()
    snaps_after_w1 = len(t.snapshots())
    assert t.read().count() == 12

    s1 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s1["input_pages"] == 12

    # wave 2: url 3 changed, url 50 new — lands as an appended snapshot
    _write_wave(
        spark,
        in_dir,
        _rows([3], it.EPOCH_S + 7000, version=2) + _rows([50], it.EPOCH_S + 7000),
        "wave2",
    )
    _run_stream(spark, in_dir, tbl, ckpt)
    t = it.IceTable(spark, tbl)
    assert len(t.snapshots()) == snaps_after_w1 + 1
    assert t.snapshots()[-1]["operation"] == "append"
    assert t.read().count() == 14

    s2 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s2["input_pages"] == 2
    assert s2["scan"]["files_new"] < s2["scan"]["files_total_snapshot"]

    cur = {
        r.url: r.main_text
        for r in icerun.current_main_content(spark, out)
        .select("url", "main_text")
        .collect()
    }
    assert len(cur) == 13
    assert cur["https://ex.org/d/3"] == extract_mains(
        pd.Series([_html(3, version=2)])
    )[0][0]


def test_stream_rerun_with_checkpoint_is_noop(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write_wave(spark, in_dir, _rows(range(6), it.EPOCH_S), "wave1")
    _run_stream(spark, in_dir, tbl, ckpt)
    t = it.IceTable(spark, tbl)
    versions = it.current_version(tbl)
    n = t.read().count()

    # no new files: the restarted query processes nothing and commits nothing
    _run_stream(spark, in_dir, tbl, ckpt)
    assert it.current_version(tbl) == versions
    assert it.IceTable(spark, tbl).read().count() == n


def test_batch_sequences_map_to_snapshots(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write_wave(spark, in_dir, _rows(range(4), it.EPOCH_S), "w1")
    _run_stream(spark, in_dir, tbl, ckpt)
    _write_wave(spark, in_dir, _rows([90], it.EPOCH_S + 50), "w2")
    _run_stream(spark, in_dir, tbl, ckpt)
    t = it.IceTable(spark, tbl)
    seqs = [s["sequence"] for s in t.snapshots() if s["operation"] == "append"]
    # one append per non-empty micro-batch, sequence == batch_id, strictly
    # increasing (create's bootstrap snapshot sits below the first batch)
    assert seqs == sorted(seqs) and len(seqs) == len(set(seqs)) == 2


def test_stream_ingest_to_branch_then_publish(spark, tmp_path):
    """The streaming write half of write-audit-publish: the crawl tail
    accrues micro-batch snapshots on the audit branch — main readers see
    the published base only — until publish fast-forwards."""
    import pandas as pd

    from enem_spark import streaming as st
    from enem_spark.sources import icetable as it

    tbl = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def _pdf(ids):
        rows = [
            {
                "url": f"https://ex.org/d/{i}",
                "warc_ts": pd.Timestamp(it.EPOCH_S + i, unit="s"),
                "html": f"<p>doc {i}</p>".encode(),
                "text": f"doc {i}",
                "lang": "pt",
            }
            for i in ids
        ]
        return pd.DataFrame(
            rows, columns=[f.name for f in it.PAGES_ICE_SCHEMA.fields]
        )

    # published base BELOW the stream's batch-id sequences: snapshots with
    # sequence == a batch id read as that batch's replay (the documented
    # sequence=batch_id contract), so an externally-created base must sit
    # under the first batch id
    it.IceTable.create(
        spark, tbl,
        spark.createDataFrame(_pdf(range(5)), schema=it.PAGES_ICE_SCHEMA),
        (), sequence=-1,
    )
    # tail two shards onto the audit branch (Spark-written so the parquet
    # timestamp physical type matches the stream schema)
    for i, ids in enumerate([range(5, 8), range(8, 10)]):
        spark.createDataFrame(
            _pdf(ids), schema=it.PAGES_ICE_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"b{i}")
        )
    stream = (
        spark.readStream.schema(it.PAGES_ICE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = st.start_ice_ingest_stream(
        stream, tbl, ckpt, available_now=True, branch="audit"
    )
    q.awaitTermination(120)

    t = it.IceTable(spark, tbl)
    assert t.read().count() == 5  # main: published base only
    assert t.read(ref="audit").count() == 10  # audit: base + both batches
    t.publish_branch("audit")
    assert t.read().count() == 10
