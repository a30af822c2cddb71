"""WARC container source: encode/decode round trip, malformed-record
quarantine + resync, warcinfo skipping, and the no-shuffle ingest plan."""

from __future__ import annotations

import gzip
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from enem_spark.sources import warc

SF_DIR = "/root/testdata/sf0.001"


def _sample_records(n=5):
    recs = []
    for i in range(n):
        url = f"https://ex.com/p/{i}"
        date = warc.iso_date(warc.EPOCH_S + i)
        payload = (f"<html><body>doc {i} " + "x" * (50 + i) + "</body></html>").encode()
        recs.append((url, date, payload))
    return recs


@pytest.mark.parametrize("gz", [True, False])
def test_round_trip_pure(gz):
    recs = _sample_records()
    blob = warc.encode_warc_file(
        [warc.encode_warcinfo("f.warc")]
        + [warc.encode_record(u, d, p) for u, d, p in recs],
        gzip_members=gz,
    )
    rows = warc.parse_warc_bytes(blob, "f.warc")
    assert [r["error"] for r in rows] == [None] * len(recs)  # warcinfo skipped
    assert [(r["url"], r["warc_date"], r["html"]) for r in rows] == recs
    assert all(r["http_status"] == 200 for r in rows)


def test_gzip_encoding_is_deterministic():
    recs = [warc.encode_record(u, d, p) for u, d, p in _sample_records()]
    assert warc.encode_warc_file(recs) == warc.encode_warc_file(recs)


def test_malformed_record_quarantined_and_resynced():
    recs = _sample_records(3)
    good = [warc.encode_record(u, d, p) for u, d, p in recs]
    # garbage between record 0 and record 1: parser must emit an error row
    # and pick up at the next magic
    blob = good[0] + b"JUNK NOT A RECORD\r\n\r\n" + good[1] + good[2]
    rows = warc.parse_warc_bytes(blob, "f.warc")
    errs = [r for r in rows if r["error"]]
    oks = [r for r in rows if not r["error"]]
    assert len(errs) == 1 and errs[0]["error"] == "bad_magic"
    assert [r["url"] for r in oks] == [u for u, _, _ in recs]

    # payload cut short: quarantine, no crash, no partial row
    trunc = good[0][:-20]  # cut inside the HTTP payload, headers intact
    rows = warc.parse_warc_bytes(trunc, "t.warc")
    assert [r["error"] for r in rows] == ["truncated_payload"]

    # content-length header mangled: quarantine that record, resync to next
    bad = good[0].replace(b"Content-Length:", b"Content-Lemgth:", 1)
    rows = warc.parse_warc_bytes(bad + good[1], "c.warc")
    assert [r["error"] for r in rows] == ["bad_content_length", None]
    assert rows[1]["url"] == recs[1][0]


def test_spark_read_matches_staged_expected(spark):
    staged = warc.stage_warc_files(SF_DIR)
    got = (
        warc.read_warc(spark, staged["warc_dir"])
        .filter(F.col("error").isNull())
        .select("url", "warc_date", F.md5("html").alias("html_md5"))
        .collect()
    )
    exp = spark.read.parquet(staged["expected"]).select(
        "url", "warc_date", "html_md5"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert len(got) == 500


def test_warc_pages_shape_and_plan(spark):
    staged = warc.stage_warc_files(SF_DIR)
    pages = warc.warc_pages(warc.read_warc(spark, staged["warc_dir"]))
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    row = pages.orderBy("url").first()
    assert row["warc_ts"] is not None and isinstance(row["html"], (bytes, bytearray))
    plan = pages._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "WARC ingest must not shuffle"
    assert plan.count("ArrowEvalPython") <= 1 or "MapInPandas" in plan


def test_html_payload_composes_with_dom_extraction(spark):
    """WARC ingest -> DOM main-content extraction: the html payloads are
    htmlops pages, so the chain recovers the same mains the html pipeline
    does on its own synthetic pages."""
    from enem_spark import htmlops

    staged = warc.stage_warc_files(SF_DIR)
    pages = warc.warc_pages(warc.read_warc(spark, staged["warc_dir"]))
    # htmlops pages carry binary html payloads keyed by doc_id in the url
    as_html = pages.select(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long").alias("doc_id"),
        "url",
        "html",
    )
    main = htmlops.extract_main_content(as_html)
    n_nonempty = main.filter(F.length("main_text") > 0).count()
    assert n_nonempty == 500


# ---------------------------------------------------------------------------
# WET export (conversion records)


def test_wet_conversion_round_trip_pure():
    """encode_conversion_record -> parse_warc_bytes: text bytes, type, and
    the refers-to link back to the response record id."""
    recs = [
        (u, d, f"texto extraido {i} do doc.".encode())
        for i, (u, d, _) in enumerate(_sample_records(4))
    ]
    blob = warc.encode_warc_file(
        [warc.encode_warcinfo("f.warc.wet.gz")]
        + [warc.encode_conversion_record(u, d, t) for u, d, t in recs],
        gzip_members=True,
    )
    rows = warc.parse_warc_bytes(blob, "f.warc.wet.gz")
    assert [(r["url"], r["warc_date"], r["html"]) for r in rows] == recs
    assert all(r["warc_type"] == "conversion" for r in rows)
    assert all(r["http_status"] is None for r in rows)
    assert all(r["error"] is None for r in rows)
    # the raw record names its WARC original
    raw = warc.encode_conversion_record(*recs[0])
    refers = hashlib.md5(f"{recs[0][0]}|{recs[0][1]}".encode()).hexdigest()
    assert f"WARC-Refers-To: <urn:md5:{refers}>".encode() in raw


def test_wet_shards_round_trip_spark(spark, tmp_path):
    """Distributed export -> files on disk -> read_warc -> wet_texts must
    return the exact (url, wet_date, text) set, and a re-export is
    byte-identical (determinism across runs)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    frame = docs.select(
        F.concat(F.lit("cc://"), F.col("source"), F.lit(".example.com/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit(warc.iso_date(warc.EPOCH_S)).alias("wet_date"),
        "text",
    )
    shards = warc.wet_shards(frame, n_shards=4).collect()
    assert sum(r.n_records for r in shards) == docs.count()
    assert {r.shard_id for r in shards} <= set(range(4))
    md5s = {r.shard_id: r.wet_md5 for r in shards}
    for r in shards:
        assert hashlib.md5(bytes(r.wet)).hexdigest() == r.wet_md5

    # byte determinism: a second export produces the same shard bytes
    again = {r.shard_id: r.wet_md5 for r in warc.wet_shards(frame, n_shards=4).collect()}
    assert again == md5s

    wet_dir = tmp_path / "wet"
    wet_dir.mkdir()
    for r in shards:
        (wet_dir / f"wet-{r.shard_id:05d}.warc.wet.gz").write_bytes(bytes(r.wet))
    back = warc.wet_texts(warc.read_warc(spark, str(wet_dir)))
    got = {(r.url, r.warc_date, r.text) for r in back.collect()}
    want = {(r.url, r.wet_date, r.text) for r in frame.collect()}
    assert got == want


def test_wet_expected_staging_matches_spark(spark):
    """The pure staging twin's shard digests equal the distributed
    export's over the driver-query input (byte-level equivalence of the
    sequential reference and the Spark assembly)."""
    import pandas as pd

    import __spark_entry__ as entry

    spdf = entry.queries()["wet_export"](spark, SF_DIR).toPandas()
    exp = pd.read_parquet(warc.stage_wet_expected(SF_DIR, n_shards=8))
    s = spdf.sort_values("shard_id").reset_index(drop=True)
    e = exp.sort_values("shard_id").reset_index(drop=True)
    assert list(s["shard_id"]) == list(e["shard_id"])
    assert list(s["wet_md5"]) == list(e["wet_md5"])
    assert list(s["n_records"]) == list(e["n_records"])


# ---------------------------------------------------------------------------
# WAT export (metadata records: JSON envelopes)


def test_wat_envelope_contents():
    """The envelope is canonical JSON carrying title, links, and content
    length — and its link set agrees with the htmlops _HREF_RE operator
    contract (same regex constant)."""
    import json

    url, date = "https://ex.com/p/0", warc.iso_date(warc.EPOCH_S)
    payload = (
        b"<html><head><title> Meu  Titulo \n</title></head><body>"
        b'<a href="https://a.com/x">a</a> texto '
        b'<a href="/rel">rel</a></body></html>'
    )
    body = warc.wat_envelope(url, date, payload)
    env = json.loads(body)["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == url
    pm = env["Payload-Metadata"]
    assert pm["Actual-Content-Length"] == len(payload)
    hm = pm["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == "Meu Titulo"  # whitespace-collapsed
    assert [l["url"] for l in hm["Links"]] == ["https://a.com/x", "/rel"]
    # canonical bytes: sorted keys, compact separators — re-serialization
    # of the parsed object reproduces the exact bytes
    assert (
        json.dumps(json.loads(body), sort_keys=True, separators=(",", ":"))
        .encode()
        == body
    )


def test_wat_metadata_round_trip_pure():
    """encode_metadata_record -> parse_warc_bytes: JSON bytes, type, and
    the refers-to link back to the response record id."""
    recs = [
        (u, d, warc.wat_envelope(u, d, p)) for u, d, p in _sample_records(4)
    ]
    blob = warc.encode_warc_file(
        [warc.encode_warcinfo("f.warc.wat.gz")]
        + [warc.encode_metadata_record(u, d, b) for u, d, b in recs],
        gzip_members=True,
    )
    rows = warc.parse_warc_bytes(blob, "f.warc.wat.gz")
    assert [(r["url"], r["warc_date"], r["html"]) for r in rows] == recs
    assert all(r["warc_type"] == "metadata" for r in rows)
    assert all(r["http_status"] is None for r in rows)
    assert all(r["error"] is None for r in rows)
    raw = warc.encode_metadata_record(*recs[0])
    refers = hashlib.md5(f"{recs[0][0]}|{recs[0][1]}".encode()).hexdigest()
    assert f"WARC-Refers-To: <urn:md5:{refers}>".encode() in raw


def test_wat_shards_round_trip_spark(spark, tmp_path):
    """Distributed WAT export -> files on disk -> read_warc: every metadata
    record comes back with its envelope bytes intact, link counts add up,
    and a re-export is byte-identical."""
    import json

    from enem_spark import htmlops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text", "lang"
    )
    pages = htmlops.synth_html_pages(docs).select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("wat_date"),
        "html",
    )
    shards = warc.wat_shards(pages, n_shards=4).collect()
    assert sum(r.n_records for r in shards) == docs.count()
    for r in shards:
        assert hashlib.md5(bytes(r.wat)).hexdigest() == r.wat_md5

    again = {r.shard_id: r.wat_md5 for r in warc.wat_shards(pages, n_shards=4).collect()}
    assert again == {r.shard_id: r.wat_md5 for r in shards}

    wat_dir = tmp_path / "wat"
    wat_dir.mkdir()
    for r in shards:
        (wat_dir / f"wat-{r.shard_id:05d}.warc.wat.gz").write_bytes(bytes(r.wat))
    back = (
        warc.read_warc(spark, str(wat_dir))
        .filter(F.col("warc_type") == "metadata")
        .collect()
    )
    assert len(back) == docs.count()
    # parsed-back envelopes: valid JSON, link total matches the shard stats
    n_links = sum(
        len(
            json.loads(bytes(r.html))["Envelope"]["Payload-Metadata"][
                "HTTP-Response-Metadata"
            ]["HTML-Metadata"]["Links"]
        )
        for r in back
    )
    assert n_links == sum(r.n_links for r in shards)


def test_wat_expected_staging_matches_spark(spark):
    """The pure staging twin's shard digests equal the distributed WAT
    export's over the driver-query input."""
    import pandas as pd

    import __spark_entry__ as entry

    spdf = entry.queries()["wat_export"](spark, SF_DIR).toPandas()
    exp = pd.read_parquet(warc.stage_wat_expected(SF_DIR, n_shards=8))
    s = spdf.sort_values("shard_id").reset_index(drop=True)
    e = exp.sort_values("shard_id").reset_index(drop=True)
    assert list(s["shard_id"]) == list(e["shard_id"])
    assert list(s["wat_md5"]) == list(e["wat_md5"])
    assert list(s["n_records"]) == list(e["n_records"])
    assert list(s["n_links"]) == list(e["n_links"])
    assert int(s["n_links"].sum()) > 0


# ---------------------------------------------------------------------------
# streaming WARC tail (live crawl archives -> exactly-once extraction)


def test_warc_stream_tail_extracts_exactly_once(spark, tmp_path):
    """Containers dropped into a directory are parsed as they land
    (binaryFile file-stream source, same kernel as the batch reader) and
    extracted exactly-once: a second invocation picks up only NEW
    archives, and a replayed page inside a new container is absorbed by
    the content-addressed resume anti-join."""
    from enem_spark.lineage import committed_main_content
    from enem_spark.streaming import read_warc_pages_stream, start_html_stream

    drop = tmp_path / "drop"
    drop.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def page(i):
        url = f"https://ex.com/p/{i}"
        date = warc.iso_date(warc.EPOCH_S + i)
        payload = (
            f"<html><body><p>paragraph body {i} with enough prose to be "
            f"main content for the densitometric classifier</p>"
            f"</body></html>"
        ).encode()
        return url, date, payload

    def write_archive(name, recs):
        blob = warc.encode_warc_file(
            [warc.encode_warcinfo(name)]
            + [warc.encode_record(u, d, p) for u, d, p in recs],
            gzip_members=True,
        )
        (drop / name).write_bytes(blob)

    write_archive("c0.warc.gz", [page(0), page(1), page(2)])
    write_archive("c1.warc.gz", [page(3), page(4)])

    def run():
        q = start_html_stream(
            read_warc_pages_stream(spark, str(drop), watermark="10 seconds"),
            out,
            ckpt,
            available_now=True,
        )
        q.awaitTermination(300)

    run()
    got = committed_main_content(spark, out)
    assert got.count() == 5
    assert got.select("doc_id").distinct().count() == 5

    # the tail: one new container with 2 new pages + 1 byte-identical
    # replay of p/0 (recrawl) — only the new pages are extracted
    write_archive("c2.warc.gz", [page(5), page(6), page(0)])
    run()
    got2 = committed_main_content(spark, out)
    assert got2.count() == 7
    urls = {r.url for r in got2.select("url").collect()}
    assert urls == {f"https://ex.com/p/{i}" for i in range(7)}

    # a third invocation with nothing new commits no new runs
    runs_before = spark.read.parquet(f"{out}/runs").count()
    run()
    assert spark.read.parquet(f"{out}/runs").count() == runs_before


def test_wat_export_deterministic_under_duplicate_urls(spark):
    """A url fetched twice (same shard by construction) must export
    byte-identically across runs regardless of incoming row order — the
    full-tuple sort tiebreak."""
    import pandas as pd

    rows = []
    for i in range(6):
        url = f"https://ex.com/p/{i % 3}"  # every url appears twice
        date = warc.iso_date(warc.EPOCH_S + i)
        rows.append((url, date, f"<html><body>v{i}</body></html>".encode()))
    pdf = pd.DataFrame(rows, columns=["url", "wat_date", "html"])
    frames = [pdf, pdf.iloc[::-1].reset_index(drop=True)]  # reversed order
    digests = []
    for f in frames:
        df = spark.createDataFrame(f).repartition(4)
        out = warc.wat_shards(df, n_shards=2).collect()
        digests.append({r.shard_id: r.wat_md5 for r in out})
        assert sum(r.n_records for r in out) == 6
    assert digests[0] == digests[1]


def test_warc_pages_malformed_date_degrades_to_null_ts(spark):
    """A WARC-Date the pattern cannot parse (WARC 1.1 fractional seconds,
    or garbage) must yield a NULL warc_ts row — under Spark 4 ANSI a
    strict to_timestamp would abort the whole ingest on one bad header,
    violating the quarantine philosophy."""
    from pyspark.sql import Row

    recs = spark.createDataFrame(
        [
            Row(url="a", warc_date="2024-01-01T00:00:00Z",
                http_status=200, html=b"<p>x</p>", error=None),
            Row(url="b", warc_date="2024-01-01T00:00:00.123Z",
                http_status=200, html=b"<p>y</p>", error=None),
            Row(url="c", warc_date="not-a-date",
                http_status=200, html=b"<p>z</p>", error=None),
        ],
        "url string, warc_date string, http_status int, html binary, error string",
    )
    got = {r.url: r.warc_ts for r in warc.warc_pages(recs).collect()}
    assert got["a"] is not None
    assert got["b"] is None and got["c"] is None  # degraded, job alive
