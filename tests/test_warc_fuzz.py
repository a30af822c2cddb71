"""Hypothesis battery for the WARC record parser (sources/warc.py).

The parser runs inside the ingest Arrow crossing on whatever bytes a crawl
archive contains — it must never raise, must terminate, must frame records
by Content-Length alone (payloads legally contain b'WARC/1.0' and
b'\\r\\n\\r\\n'), and must resync after garbage without fabricating rows.
Pure function, so these run without Spark."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from enem_spark.sources import warc

# header-safe field text: no CR/LF (header injection is the encoder
# caller's contract, not the parser's)
_URLS = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=40,
).map(lambda s: f"https://ex.com/{s}")
_DATES = st.integers(min_value=0, max_value=10**9).map(
    lambda s: warc.iso_date(warc.EPOCH_S + s)
)
# payloads that try to break the framing: embedded record magic, header
# separators, gzip magic, NULs
_NASTY = st.sampled_from(
    [b"WARC/1.0\r\n", b"\r\n\r\n", b"\x1f\x8b", b"\x00", b"Content-Length: 5\r\n"]
)
_PAYLOADS = st.lists(
    st.one_of(st.binary(min_size=0, max_size=30), _NASTY), max_size=6
).map(b"".join)

_RECORDS = st.lists(
    st.tuples(_URLS, _DATES, _PAYLOADS, st.booleans()), min_size=0, max_size=6
)


def _encode(records, gz):
    blobs = [warc.encode_warcinfo("f.warc")]
    for url, date, payload, conv in records:
        blobs.append(
            warc.encode_conversion_record(url, date, payload)
            if conv
            else warc.encode_record(url, date, payload)
        )
    return warc.encode_warc_file(blobs, gzip_members=gz)


@given(records=_RECORDS, gz=st.booleans())
@settings(max_examples=150, deadline=None)
def test_roundtrip_with_adversarial_payloads(records, gz):
    """Content-Length framing must recover every record exactly even when
    payloads embed the record magic or header separators."""
    rows = warc.parse_warc_bytes(_encode(records, gz), "f.warc")
    assert [r["error"] for r in rows] == [None] * len(records)
    got = [(r["url"], r["warc_date"], r["html"]) for r in rows]
    assert got == [(u, d, p) for u, d, p, _ in records]
    assert [r["warc_type"] for r in rows] == [
        "conversion" if c else "response" for _, _, _, c in records
    ]


@given(data=st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_arbitrary_bytes_never_raise(data):
    rows = warc.parse_warc_bytes(data, "junk")
    for r in rows:
        assert set(r) == {f.name for f in warc.READ_SCHEMA.fields}
    offsets = [r["record_offset"] for r in rows]
    assert offsets == sorted(offsets)
    # determinism
    assert warc.parse_warc_bytes(data, "junk") == rows


@given(
    records=_RECORDS.filter(lambda rs: len(rs) >= 1),
    garbage=st.binary(min_size=1, max_size=60).filter(
        lambda b: warc.WARC_MAGIC not in b
    ),
)
@settings(max_examples=150, deadline=None)
def test_leading_garbage_quarantined_then_resynced(records, garbage):
    """Magic-free garbage before the first record costs exactly one error
    row; every real record is still recovered (resync at the next magic)."""
    blob = garbage + _encode(records, gz=False)
    rows = warc.parse_warc_bytes(blob, "f.warc")
    errs = [r for r in rows if r["error"] is not None]
    good = [(r["url"], r["warc_date"], r["html"]) for r in rows if r["error"] is None]
    assert len(errs) == 1 and errs[0]["error"] == "bad_magic"
    assert good == [(u, d, p) for u, d, p, _ in records]


@given(records=_RECORDS, cut=st.integers(min_value=1, max_value=10**6))
@settings(max_examples=150, deadline=None)
def test_truncation_never_fabricates_records(records, cut):
    """A truncated file yields a prefix of the true records plus at most
    one error row — never an invented record or payload."""
    blob = _encode(records, gz=False)
    rows = warc.parse_warc_bytes(blob[: len(blob) - min(cut, len(blob))], "f.warc")
    true = [(u, d, p) for u, d, p, _ in records]
    good = [(r["url"], r["warc_date"], r["html"]) for r in rows if r["error"] is None]
    assert good == true[: len(good)]
    assert len([r for r in rows if r["error"] is not None]) <= 1


def test_corrupt_gzip_is_quarantined_not_fatal():
    """Corrupt/truncated gzip containers must produce an error row, never
    an exception (one bad shard tail must not kill the ingest task)."""
    for bad, want in (
        (b"\x1f\x8b", "truncated_gzip_member"),
        (b"\x1f\x8bjunkjunk", "bad_gzip_member"),
        (b"\x1f\x8b\x08\x00" + b"\x00" * 10, "truncated_gzip_member"),
    ):
        rows = warc.parse_warc_bytes(bad, "f.warc.gz")
        assert [r["error"] for r in rows] == [want]


@given(records=_RECORDS.filter(lambda rs: len(rs) >= 2), cut=st.integers(1, 200))
@settings(max_examples=100, deadline=None)
def test_truncated_gzip_salvages_leading_members(records, cut):
    """Per-record gzip members: cutting the file tail loses at most the
    trailing records; every fully retained member still parses, and exactly
    one gzip error row marks the damage."""
    blob = _encode(records, gz=True)
    cut = min(cut, len(blob) - 1)
    rows = warc.parse_warc_bytes(blob[:-cut], "f.warc.gz")
    good = [(r["url"], r["warc_date"], r["html"]) for r in rows if r["error"] is None]
    true = [(u, d, p) for u, d, p, _ in records]
    assert good == true[: len(good)]
    gz_errs = [r["error"] for r in rows if r["error"] in
               ("truncated_gzip_member", "bad_gzip_member", "gzip_trailing_garbage")]
    assert len(gz_errs) == 1


def test_negative_content_length_terminates():
    """Review finding (r3): a record claiming a negative Content-Length
    put body_end at/before the record start, so the parse loop re-parsed
    the same record forever, appending error rows unboundedly — one
    hostile record wedged the executor. Must terminate with one error row
    and keep parsing whatever follows."""
    import time

    from enem_spark.sources.warc import parse_warc_bytes

    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -82\r\n\r\nx"
    t0 = time.perf_counter()
    rows = parse_warc_bytes(bad, "f")
    assert time.perf_counter() - t0 < 5
    assert [r["error"] for r in rows] == ["bad_content_length"]
