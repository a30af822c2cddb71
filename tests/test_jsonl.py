"""JSONL source: encode->parse round trip, corrupt-record quarantine, and
read-plan shape (native source, no Python, no shuffle)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from enem_spark.sources import jsonl

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged():
    return jsonl.stage_jsonl_files(SF_DIR)


@pytest.fixture(scope="module")
def recs(spark, staged):
    return jsonl.read_jsonl(spark, staged["jsonl_dir"]).persist()


def test_round_trip_matches_source(recs, staged):
    good = recs.filter(F.col(jsonl.CORRUPT_COL).isNull())
    got = {
        r.url: (r.fetch_ts, r.text, r.lang, r.source) for r in good.collect()
    }
    exp = duckdb.sql(
        f"SELECT * FROM read_parquet('{staged['expected']}')"
    ).fetchall()
    assert len(got) == len(exp)
    for url, fetch_ts, text, lang, source in exp:
        assert got[url] == (fetch_ts, text, lang, source), url


def test_malformed_lines_quarantined_not_fatal(recs, staged):
    bad = recs.filter(F.col(jsonl.CORRUPT_COL).isNotNull()).collect()
    # one injected malformed line per shard; each carries the raw line and
    # NULL data columns, and displaces no neighbours (round trip above)
    assert len(bad) == int(staged["n_bad"])
    for r in bad:
        assert r[jsonl.CORRUPT_COL]
        assert r.url is None or r.text is None  # never a fully-parsed row


def test_read_plan_native_no_python_no_shuffle(recs):
    plan = recs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_type_mismatch_line_is_corrupt(spark, tmp_path):
    # a syntactically valid object whose fetch_ts cannot be a long must
    # quarantine, not silently null the field (PERMISSIVE marks the row)
    p = tmp_path / "x.jsonl"
    p.write_text(
        '{"url":"https://ok/1","fetch_ts":1,"text":"t","lang":"en","source":"s"}\n'
        '{"url":"https://bad/3","fetch_ts":"NaN-ish"}\n'
    )
    out = jsonl.read_jsonl(spark, str(p)).collect()
    assert len(out) == 2
    by_url = {r.url: r for r in out}
    assert by_url["https://ok/1"][jsonl.CORRUPT_COL] is None
    bad = [r for r in out if r[jsonl.CORRUPT_COL] is not None]
    assert len(bad) == 1


def test_jsonl_stream_matches_batch(spark, staged, recs, tmp_path):
    """availableNow catch-up over the staged shards lands the same rows
    (good AND quarantined) as the batch read; bounded per-trigger batches."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = jsonl.read_jsonl_stream(
        spark, staged["jsonl_dir"], max_files_per_trigger=3
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.schema(jsonl.JSONL_SCHEMA).parquet(out)
    batch = recs
    assert got.count() == batch.count()
    gb = got.filter(F.col(jsonl.CORRUPT_COL).isNotNull()).count()
    bb = batch.filter(F.col(jsonl.CORRUPT_COL).isNotNull()).count()
    assert gb == bb == int(staged["n_bad"])
    # value-level: same good rows by url
    a = {r.url for r in got.filter(F.col(jsonl.CORRUPT_COL).isNull()).collect()}
    b = {r.url for r in batch.filter(F.col(jsonl.CORRUPT_COL).isNull()).collect()}
    assert a == b
