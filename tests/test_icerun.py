"""Incremental extraction over an icetable (icerun.py): content-addressed
exactly-once units, manifest-level delta planning, watermark advancement on
no-op snapshots, overwrite re-scan exactness, and the per-url serving view.
Extraction content is checked against the pure htmlops twin on pandas."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

from enem_spark import icerun, lineage
from enem_spark.htmlops import extract_mains
from enem_spark.sources import icetable as it

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _html(i: int, version: int = 1) -> bytes:
    words = " ".join(f"palavra{(i * 7 + k) % 53}" for k in range(40))
    return (
        f"<html><head><title>doc {i}</title></head><body>"
        f"<p>{words} documento {i} versao {version}.</p>"
        f"<p>Outro paragrafo com conteudo suficiente para o classificador "
        f"do documento {i} na versao {version} considerar texto principal."
        f"</p></body></html>"
    ).encode("utf-8")


def _rows(ids, ts0: int, version: int = 1):
    return [
        {
            "url": f"https://ex.org/d/{i}",
            "warc_ts": pd.Timestamp(ts0 + i, unit="s"),
            "html": _html(i, version),
            "text": f"doc {i}",
            "lang": "pt",
        }
        for i in ids
    ]


def _frame(rows) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=[f.name for f in it.PAGES_ICE_SCHEMA.fields])


def _expected_main(html: bytes) -> str:
    return extract_mains(pd.Series([html]))[0][0]


@pytest.fixture()
def table_and_out(tmp_path):
    return str(tmp_path / "tbl"), str(tmp_path / "out")


def _create(spark, path, rows, seq):
    return it.IceTable.create(
        spark,
        path,
        spark.createDataFrame(_frame(rows), schema=it.PAGES_ICE_SCHEMA),
        partition_by=(it.Transform("b_url", "bucket", "url", 4),),
        sequence=seq,
    )


def _append(spark, t, rows, seq):
    t.append(spark.createDataFrame(_frame(rows), schema=it.PAGES_ICE_SCHEMA), seq)


def _current(spark, out):
    df = icerun.current_main_content(spark, out)
    return {r.url: r.main_text for r in df.select("url", "main_text").collect()}


def test_full_run_then_noop_and_multifetch_url(spark, table_and_out):
    tbl, out = table_and_out
    rows = _rows(range(20), it.EPOCH_S)
    # url 5 fetched twice in the first crawl: later fetch must win
    refetch = _rows([5], it.EPOCH_S + 1000, version=2)
    _create(spark, tbl, rows + refetch, seq=10)

    s1 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s1["input_pages"] == 20  # 21 rows, latest-per-url = 20 units
    assert s1["sequence"] == 10 and not s1["up_to_date"]

    cur = _current(spark, out)
    assert len(cur) == 20
    assert cur["https://ex.org/d/5"] == _expected_main(_html(5, version=2))
    assert cur["https://ex.org/d/3"] == _expected_main(_html(3))

    s2 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s2["up_to_date"] and s2["input_pages"] == 0
    assert icerun.last_extracted_sequence(spark, out) == 10


def test_append_extracts_only_changed_units(spark, table_and_out):
    tbl, out = table_and_out
    t = _create(spark, tbl, _rows(range(20), it.EPOCH_S), seq=10)
    icerun.run_html_extraction_ice(spark, tbl, out)

    # delta: url 3 changed, url 4 re-fetched byte-identical, url 100 new
    delta = (
        _rows([3], it.EPOCH_S + 5000, version=2)
        + _rows([4], it.EPOCH_S + 5000)
        + _rows([100], it.EPOCH_S + 5000)
    )
    _append(spark, t, delta, seq=20)

    s = icerun.run_html_extraction_ice(spark, tbl, out)
    # identical re-fetch of 4 is the same content-addressed unit -> skipped
    assert s["input_pages"] == 2
    assert s["scan"]["files_new"] < s["scan"]["files_total_snapshot"]
    cur = _current(spark, out)
    assert len(cur) == 21
    assert cur["https://ex.org/d/3"] == _expected_main(_html(3, version=2))
    assert cur["https://ex.org/d/4"] == _expected_main(_html(4))
    assert cur["https://ex.org/d/100"] == _expected_main(_html(100))


def test_pure_duplicate_append_advances_watermark(spark, table_and_out):
    tbl, out = table_and_out
    t = _create(spark, tbl, _rows(range(10), it.EPOCH_S), seq=10)
    icerun.run_html_extraction_ice(spark, tbl, out)

    _append(spark, t, _rows([7], it.EPOCH_S + 9000), seq=20)
    s = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s["input_pages"] == 0 and not s["up_to_date"]
    # the marker-only commit advanced the watermark: next run plans nothing
    assert icerun.last_extracted_sequence(spark, out) == 20
    assert icerun.run_html_extraction_ice(spark, tbl, out)["up_to_date"]


def test_overwrite_rescans_but_extracts_only_changes(spark, table_and_out):
    tbl, out = table_and_out
    t = _create(spark, tbl, _rows(range(12), it.EPOCH_S), seq=10)
    icerun.run_html_extraction_ice(spark, tbl, out)

    # compaction-style overwrite: same corpus except url 9 changed
    corpus = _rows(range(9), it.EPOCH_S) + _rows(
        [9], it.EPOCH_S + 9, version=3
    ) + _rows(range(10, 12), it.EPOCH_S)
    t.overwrite(
        spark.createDataFrame(_frame(corpus), schema=it.PAGES_ICE_SCHEMA), 20
    )

    s = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s["scan"]["files_new"] == s["scan"]["files_total_snapshot"]
    assert s["input_pages"] == 1  # only url 9's new unit
    cur = _current(spark, out)
    assert cur["https://ex.org/d/9"] == _expected_main(_html(9, version=3))
    assert cur["https://ex.org/d/2"] == _expected_main(_html(2))


def test_units_are_content_addressed_jvm_side(spark, table_and_out):
    tbl, out = table_and_out
    _create(spark, tbl, _rows(range(5), it.EPOCH_S), seq=10)
    icerun.run_html_extraction_ice(spark, tbl, out)
    mc = lineage.committed_main_content(spark, out)
    got = {r.url: r.doc_id for r in mc.select("url", "doc_id").collect()}
    t = it.IceTable(spark, tbl)
    exp = {
        r.url: r.doc_id
        for r in t.read()
        .select(
            "url", F.xxhash64("url", F.md5("html")).alias("doc_id")
        )
        .collect()
    }
    assert got == exp


def test_job_cli_iceberg_runs_and_resumes(tmp_path, spark):
    tbl, out = str(tmp_path / "tbl"), str(tmp_path / "out")
    wet = str(tmp_path / "wet")
    t = _create(spark, tbl, _rows(range(8), it.EPOCH_S), seq=10)

    def run():
        p = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "jobs", "extract_job.py"),
                "--input", tbl, "--output", out,
                "--html", "--iceberg", "--cores", "2",
                "--wet-out", wet, "--wet-shards", "2",
            ],
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(p.stdout.strip().splitlines()[-1])

    s1 = run()
    assert s1["input_pages"] == 8
    # incremental WET export: run 1's content in its own per-run shard dir
    assert sum(w["n_records"] for w in s1["wet"]) == 8
    assert all(f"/{s1['run_id']}/" in w["file"] for w in s1["wet"])

    s2 = run()
    assert s2["up_to_date"] and s2["input_pages"] == 0
    assert s2["wet"] == []  # nothing new -> nothing exported

    # delta crawl appended: run 3 exports ONLY the delta, beside run 1's dir
    _append(spark, t, _rows(range(8, 11), it.EPOCH_S + 100), seq=11)
    s3 = run()
    assert s3["input_pages"] == 3
    assert sum(w["n_records"] for w in s3["wet"]) == 3
    assert all(f"/{s3['run_id']}/" in w["file"] for w in s3["wet"])
    assert s3["run_id"] != s1["run_id"]
    for w in s1["wet"] + s3["wet"]:
        assert os.path.exists(w["file"])

    # crash-hole self-heal: simulate a run whose export died mid-way (its
    # _manifest.json commit marker missing) — the next up-to-date
    # invocation re-exports exactly that run, byte-identically
    os.unlink(os.path.join(wet, s1["run_id"], "_manifest.json"))
    s4 = run()
    assert s4["up_to_date"] and s4["input_pages"] == 0
    assert sum(w["n_records"] for w in s4["wet"]) == 8
    assert all(f"/{s1['run_id']}/" in w["file"] for w in s4["wet"])
    assert {w["shard_id"]: w["wet_md5"] for w in s4["wet"]} == {
        w["shard_id"]: w["wet_md5"] for w in s1["wet"]
    }


def test_recrawl_priority_buckets(spark):
    from datetime import datetime

    from enem_spark.icerun import recrawl_priority

    T0 = datetime(2024, 1, 1)
    T1 = datetime(2024, 1, 2)
    T2 = datetime(2024, 1, 3)
    hist = spark.createDataFrame(
        [
            # changed on every re-fetch -> hot
            ("u/hot", T0, "d1"), ("u/hot", T1, "d2"), ("u/hot", T2, "d3"),
            # changed once in three fetches -> warm (ratio 0.5 -> hot edge:
            # 1 change / 2 intervals = 0.5 => hot by the >= rule)
            ("u/edge", T0, "d1"), ("u/edge", T1, "d1"), ("u/edge", T2, "d9"),
            # never changed -> cold
            ("u/cold", T0, "d1"), ("u/cold", T1, "d1"),
            # single observation -> unknown, NULL ratio
            ("u/new", T2, "d1"),
        ],
        "url string, warc_ts timestamp, digest string",
    )
    out = {r["url"]: r for r in recrawl_priority(hist).collect()}
    assert out["u/hot"]["priority"] == "hot"
    assert out["u/hot"]["change_ratio"] == 1.0
    assert out["u/edge"]["priority"] == "hot" and out["u/edge"]["change_ratio"] == 0.5
    assert out["u/cold"]["priority"] == "cold" and out["u/cold"]["change_ratio"] == 0.0
    assert out["u/new"]["priority"] == "unknown"
    assert out["u/new"]["change_ratio"] is None
    assert out["u/new"]["last_fetch_s"] == int(T2.timestamp())


def _acc_page(i: int) -> str:
    words = " ".join(f"publicação{(i * 7 + k) % 53}" for k in range(40))
    return (
        f"<html><head><title>doc {i}</title></head><body>"
        f"<p>{words} não é coincidência que o documento {i} exista.</p>"
        f"<p>Outro parágrafo com conteúdo suficiente para o classificador "
        f"do documento {i} considerar como texto principal da página.</p>"
        f"</body></html>"
    )


def test_mixed_encoding_run_normalize_and_crash_safety(spark, tmp_path):
    """A crawl slice with UTF-16 and cp1252 payloads: normalize=True
    recovers the exact text for every page; normalize=False must degrade
    to replacement noise on the non-UTF-8 rows, never crash the run."""
    tbl = str(tmp_path / "tbl")
    payloads = {
        0: _acc_page(0).encode("utf-8"),
        1: b"\xff\xfe" + _acc_page(1).encode("utf-16-le"),
        2: _acc_page(2)
        .replace("<head>", '<head><meta charset="iso-8859-1">', 1)
        .encode("cp1252"),
    }
    rows = [
        {
            "url": f"https://ex.org/d/{i}",
            "warc_ts": pd.Timestamp(it.EPOCH_S + i, unit="s"),
            "html": p,
            "text": f"doc {i}",
            "lang": "pt",
        }
        for i, p in payloads.items()
    ]
    _create(spark, tbl, rows, seq=1)

    out_norm = str(tmp_path / "out_norm")
    s = icerun.run_html_extraction_ice(spark, tbl, out_norm, normalize=True)
    assert s["input_pages"] == 3
    cur = _current(spark, out_norm)
    for i in payloads:
        # expectation from the ORIGINAL string, independent of the sniffer
        exp = _expected_main(
            (_acc_page(i) if i != 2 else _acc_page(2).replace(
                "<head>", '<head><meta charset="iso-8859-1">', 1
            )).encode("utf-8")
        )
        assert cur[f"https://ex.org/d/{i}"] == exp, i

    out_raw = str(tmp_path / "out_raw")
    s2 = icerun.run_html_extraction_ice(spark, tbl, out_raw)  # must not raise
    assert s2["input_pages"] == 3
    cur2 = _current(spark, out_raw)
    assert cur2["https://ex.org/d/0"] == cur["https://ex.org/d/0"]  # utf-8 fine
    assert cur2["https://ex.org/d/1"] != cur["https://ex.org/d/1"]  # mojibake


def test_fetch_politeness(spark):
    from datetime import datetime

    hist = spark.createDataFrame(
        [
            # host a: 3 fetches inside one minute (burst), 2 urls
            ("https://a.ex/p1", datetime(2024, 1, 1, 10, 0, 5)),
            ("https://a.ex/p1", datetime(2024, 1, 1, 10, 0, 25)),
            ("https://a.ex/p2", datetime(2024, 1, 1, 10, 0, 55)),
            # host a: a 4th fetch in another minute
            ("https://a.ex/p3", datetime(2024, 1, 1, 10, 5, 0)),
            # host b: 2 fetches, far apart
            ("https://b.ex/q", datetime(2024, 1, 1, 9, 0, 0)),
            ("https://b.ex/q", datetime(2024, 1, 2, 9, 0, 0)),
            # no-host row must be dropped
            ("not-a-url", datetime(2024, 1, 1, 0, 0, 0)),
        ],
        "url string, warc_ts timestamp",
    )
    from enem_spark.icerun import fetch_politeness

    out = {r["host"]: r for r in fetch_politeness(hist).collect()}
    assert set(out) == {"a.ex", "b.ex"}
    a = out["a.ex"]
    assert a["n_fetches"] == 4 and a["n_urls"] == 3
    assert a["peak_per_minute"] == 3
    assert a["last_s"] - a["first_s"] == 295
    b = out["b.ex"]
    assert b["n_fetches"] == 2 and b["n_urls"] == 1 and b["peak_per_minute"] == 1


def test_mime_filter_drops_binaries(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    rows = _rows(range(4), it.EPOCH_S)
    rows.append(
        {
            "url": "https://ex.org/d/pdf",
            "warc_ts": pd.Timestamp(it.EPOCH_S + 99, unit="s"),
            "html": b"%PDF-1.7\nbinary body here",
            "text": "pdf",
            "lang": "pt",
        }
    )
    _create(spark, tbl, rows, seq=1)
    out = str(tmp_path / "out")
    s = icerun.run_html_extraction_ice(spark, tbl, out, mime_filter=True)
    assert s["input_pages"] == 4  # pdf row filtered below the UDF
    cur = _current(spark, out)
    assert "https://ex.org/d/pdf" not in cur
    assert len(cur) == 4


def test_content_revert_serves_latest_fetch(spark, table_and_out):
    """Regression: url content flip-flops A -> B -> A. The third fetch's
    content is already extracted (same content address), so the run
    commits only a fetch_log row — the serving view must still flip back
    to A (previously it served B forever: run-recency over main_content
    cannot see extraction-skipped re-fetches)."""
    tbl, out = table_and_out
    t = _create(spark, tbl, _rows(range(6), it.EPOCH_S, version=1), seq=10)
    s1 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s1["input_pages"] == 6

    # crawl 2: url 2 re-fetched with NEW content B
    _append(spark, t, _rows([2], it.EPOCH_S + 5000, version=2), seq=20)
    s2 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s2["input_pages"] == 1
    assert _current(spark, out)["https://ex.org/d/2"] == _expected_main(
        _html(2, version=2)
    )

    # crawl 3: url 2 REVERTS to content A (byte-identical to crawl 1)
    _append(spark, t, _rows([2], it.EPOCH_S + 9000, version=1), seq=30)
    s3 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s3["input_pages"] == 0  # content-addressed: nothing re-extracted
    assert icerun.last_extracted_sequence(spark, out) == 30
    cur = _current(spark, out)
    assert cur["https://ex.org/d/2"] == _expected_main(_html(2, version=1))
    assert len(cur) == 6  # every url still served exactly once


def test_full_replan_at_committed_tip_gets_fresh_run_id(spark, tmp_path):
    """The documented mime-filter recovery flow: full=True at an
    already-committed tip must NOT reuse the committed run_id (the
    overwrite-dir protocol would erase that run's committed outputs) — it
    runs under ice{seq}f{n} and the first run's extractions keep serving."""
    tbl = str(tmp_path / "tbl")
    rows = _rows(range(4), it.EPOCH_S)
    rows.append(
        {
            "url": "https://ex.org/d/pdf",
            "warc_ts": pd.Timestamp(it.EPOCH_S + 99, unit="s"),
            "html": b"%PDF-1.7\nbinary body here",
            "text": "pdf",
            "lang": "pt",
        }
    )
    _create(spark, tbl, rows, seq=1)
    out = str(tmp_path / "out")
    s1 = icerun.run_html_extraction_ice(spark, tbl, out, mime_filter=True)
    assert s1["input_pages"] == 4
    base_id = icerun.run_id_for(1)
    assert s1["run_id"] == base_id
    before = _current(spark, out)
    assert len(before) == 4

    s2 = icerun.run_html_extraction_ice(spark, tbl, out, full=True)
    assert s2["run_id"] == f"{base_id}f000001"
    # only the never-processed unit is re-extracted
    assert s2["input_pages"] == 1
    after = _current(spark, out)
    for url, text in before.items():  # run 1's committed outputs intact
        assert after[url] == text
    # a second recovery re-plan gets the NEXT id, not an overwrite of f1
    s3 = icerun.run_html_extraction_ice(spark, tbl, out, full=True)
    assert s3["run_id"] == f"{base_id}f000002"
    assert s3["input_pages"] == 0
    # and the runs table carries no duplicated run_id
    ids = [
        r.run_id
        for r in lineage.committed_run_ids(spark, out).collect()
    ]
    assert len(ids) == len(set(ids))
    # the watermark still reads the tip: a plain tail run is a no-op
    s4 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s4["up_to_date"] is True


def test_serving_view_orders_numeric_batch_runs_correctly(spark, tmp_path):
    """current_main_content's fetch-log-free fallback orders run_id as a
    string; streaming batch ids must therefore be zero-padded — an
    unpadded html_batch_10 sorts BEFORE html_batch_9 and would serve the
    stale batch-9 extraction forever."""
    out = str(tmp_path / "out")
    html_a = _html(0, version=1)
    html_b = _html(0, version=2)

    def batch(html, batch_id):
        pdf = _frame(
            [
                {
                    "url": "https://ex.org/d/0",
                    "warc_ts": pd.Timestamp(it.EPOCH_S + batch_id, unit="s"),
                    "html": html,
                    "text": "doc 0",
                    "lang": "pt",
                }
            ]
        )
        lineage.run_html_extraction(
            spark,
            spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA).select(
                F.xxhash64("url", F.md5("html")).alias("doc_id"), "url", "html"
            ),
            out,
            run_id=f"html_batch_{batch_id:012d}",
        )

    batch(html_a, 9)
    batch(html_b, 10)  # re-fetch with changed content in a LATER batch
    cur = _current(spark, out)
    assert cur["https://ex.org/d/0"] == _expected_main(html_b)


def test_apply_takedown_end_to_end(spark, table_and_out):
    """The takedown feature's stated use case: after apply_takedown, the
    url is gone from the TABLE reads (MOR delete), gone from the SERVING
    view (takedowns log anti-join), never re-extracted by rescans, and a
    later re-crawl of the url is a new document that serves again."""
    tbl, out = table_and_out
    _create(spark, tbl, _rows(range(8), 1_000), seq=10)
    s = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s["main_rows"] == 8
    gone_urls = ["https://ex.org/d/1", "https://ex.org/d/4"]

    td = icerun.apply_takedown(
        spark, tbl, out,
        spark.createDataFrame(pd.DataFrame({"url": gone_urls})), sequence=20,
    )
    assert td["run_id"].startswith("takedown")
    # table read no longer returns the pages
    t = it.IceTable(spark, tbl)
    assert t.read().count() == 6
    # serving view stops serving them
    served = {r["url"] for r in icerun.current_main_content(spark, out).collect()}
    assert set(served) == {f"https://ex.org/d/{i}" for i in (0, 2, 3, 5, 6, 7)}
    # a FULL re-plan does not re-extract (delete-aware read) and the
    # taken-down units never reappear
    s2 = icerun.run_html_extraction_ice(spark, tbl, out, full=True)
    assert s2["input_pages"] == 0
    # idempotent re-apply (crash-recovery shape): same sequence, no second
    # rowdelete snapshot, serving unchanged
    icerun.apply_takedown(
        spark, tbl, out,
        spark.createDataFrame(pd.DataFrame({"url": gone_urls})), sequence=20,
    )
    assert sum(1 for x in t.snapshots() if x["operation"] == "rowdelete") == 1
    assert icerun.current_main_content(spark, out).count() == 6

    # the url comes BACK in a later crawl: new content, extracted and
    # served again (sequence scoping on the table; the serving anti-join
    # is on url, so takedown-then-return needs the content to be a new
    # unit — which a re-crawl always is)
    t.append(
        spark.createDataFrame(
            _frame(_rows([1], 5_000, version=2)), schema=it.PAGES_ICE_SCHEMA
        ),
        sequence=30,
    )
    s3 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s3["main_rows"] == 1
    served3 = {r["url"] for r in icerun.current_main_content(spark, out).collect()}
    # NOTE the semantics choice: the takedown log is by URL, so the
    # returned url stays suppressed until the takedown is lifted — safer
    # for the legal/opt-out case than auto-reinstating on re-crawl
    assert "https://ex.org/d/1" not in served3
    assert "https://ex.org/d/4" not in served3


def test_watermark_ignores_unpublished_branch_sequences(spark, table_and_out):
    """Review finding (r3): the extraction watermark must be the
    MAIN-visible max sequence, never the global max — an unpublished WAP
    branch carries higher sequences whose rows a main incremental plan
    cannot see, and a global-max watermark would mark them extracted
    before publish, silently skipping the published delta forever."""
    tbl, out = table_and_out
    t = _create(spark, tbl, _rows(range(10), it.EPOCH_S), seq=10)
    icerun.run_html_extraction_ice(spark, tbl, out)

    # stage a crawl batch on an audit branch, sequence ABOVE the tip
    t.create_branch("audit")
    _frame_rows = _rows(range(10, 16), it.EPOCH_S + 5000)
    t.append(
        spark.createDataFrame(_frame(_frame_rows), schema=it.PAGES_ICE_SCHEMA),
        sequence=20,
        branch="audit",
    )

    # pre-publish run: main has nothing new, and the watermark must NOT
    # advance to the branch's sequence
    s = icerun.run_html_extraction_ice(spark, tbl, out)
    assert s["up_to_date"] and s["sequence"] == 10
    assert icerun.last_extracted_sequence(spark, out) == 10

    # publish, then the next run extracts exactly the published delta
    t.publish_branch("audit")
    s2 = icerun.run_html_extraction_ice(spark, tbl, out)
    assert not s2["up_to_date"] and s2["input_pages"] == 6
    assert icerun.last_extracted_sequence(spark, out) == 20
    assert len(_current(spark, out)) == 16


def test_serving_survives_temporary_only_fetch_log(spark, table_and_out):
    """Review finding (r3): a crashed attempt can leave fetch_log/ holding
    only Spark _temporary leftovers; the serving view must fall back to
    the run-recency proxy instead of throwing UNABLE_TO_INFER_SCHEMA on
    every call until manual cleanup."""
    import os

    tbl, out = table_and_out
    _create(spark, tbl, _rows(range(8), it.EPOCH_S), seq=10)
    icerun.run_html_extraction_ice(spark, tbl, out)
    # the ice path writes a real fetch_log; simulate the wedge by
    # replacing it with a _temporary-only husk
    import shutil

    fl = f"{out}/fetch_log"
    shutil.rmtree(fl)
    os.makedirs(f"{fl}/run_id=crashed/_temporary/0", exist_ok=True)
    open(f"{fl}/run_id=crashed/_temporary/0/part-x", "wb").write(b"junk")
    cur = _current(spark, out)
    assert len(cur) == 8
