"""Charset sniffing + encoding normalization (enem_spark/charset.py).

The recovery tests build their expectations from the INPUT html string and
stdlib codecs — independent of the detector — so a detection bug cannot
hide behind a shared function (same anchoring discipline as the DOM
classifier's recovery test)."""

from __future__ import annotations

import codecs

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from enem_spark import charset, htmlops

DOCS = [
    # (doc_id, text, source, lang) — doc_id chosen per encoding class;
    # accented text exercises the non-ASCII byte paths
    (6, "questão de ciências humanas e suas tecnologias " * 8, "src1", "pt"),
    (7, "à prova de matemática aplicada à educação básica " * 8, "src2", "pt"),
    (8, "redação nota mil exige coesão e coerência textual " * 8, "src3", "pt"),
    (9, "linguagens códigos e suas tecnologias no exame " * 8, "src4", "pt"),
    (10, "energia renovável e impacto ambiental no brasil " * 8, "src5", "pt"),
    (11, "função quadrática e progressão aritmética básica " * 8, "src6", "pt"),
    (12, "plain ascii words only for the pure ascii class " * 8, "src7", "en"),
]


def test_sniff_bom_variants():
    assert charset.sniff_bytes(codecs.BOM_UTF8 + b"<html>") == ("utf-8", "bom", 3)
    assert charset.sniff_bytes(b"\xff\xfe<\x00") == ("utf-16-le", "bom", 2)
    assert charset.sniff_bytes(b"\xfe\xff\x00<") == ("utf-16-be", "bom", 2)
    # UTF-32LE BOM is a prefix-superset of UTF-16LE's — must win
    assert charset.sniff_bytes(b"\xff\xfe\x00\x00rest") == ("utf-32-le", "bom", 4)
    assert charset.sniff_bytes(b"\x00\x00\xfe\xffrest") == ("utf-32-be", "bom", 4)


def test_sniff_meta_labels():
    page = b'<html><head><meta charset="ISO-8859-1"></head>x'
    assert charset.sniff_bytes(page) == ("cp1252", "meta", 0)
    page = b"<meta http-equiv=Content-Type content=\"text/html; charset=utf-8\">"
    assert charset.sniff_bytes(page) == ("utf-8", "meta", 0)
    # WHATWG: a utf-16 label found by ASCII prescan decodes as utf-8
    page = b'<meta charset="utf-16le">'
    assert charset.sniff_bytes(page) == ("utf-8", "meta", 0)
    # unknown label is ignored -> content detection (valid utf-8 here)
    page = b'<meta charset="klingon-8">ok'
    assert charset.sniff_bytes(page) == ("utf-8", "utf8", 0)
    # declaration outside the prescan window is not seen -> fallback fires
    page = b" " * charset.PRESCAN + b'<meta charset="utf-8">\xe9'
    assert charset.sniff_bytes(page) == ("cp1252", "fallback", 0)


def test_sniff_content_paths():
    assert charset.sniff_bytes("ação".encode("utf-8")) == ("utf-8", "utf8", 0)
    assert charset.sniff_bytes("ação".encode("cp1252")) == (
        "cp1252",
        "fallback",
        0,
    )


def test_decode_empty_and_none():
    assert charset.decode_bytes(None) == ("", "utf-8", "empty", 0.0)
    assert charset.decode_bytes(b"") == ("", "utf-8", "empty", 0.0)


def test_decode_replacement_ratio():
    # 0x81 is undefined in cp1252 -> U+FFFD under errors='replace'
    text, codec, method, ratio = charset.decode_bytes(b"ab\x81\xe9")
    assert codec == "cp1252" and method == "fallback"
    assert text == "ab�é"
    assert ratio == pytest.approx(0.25)


def test_recovery_roundtrip_all_classes():
    """Decoded text matches an expectation built independently of the
    detector, for every encoding class."""
    for doc_id, text, source, lang in DOCS:
        html = htmlops.html_for(doc_id, text, source, lang)
        payload = charset.encoded_page_for(doc_id, text, source, lang)
        got, codec, method, ratio = charset.decode_bytes(payload)
        k = doc_id % charset.ENC_CLASSES
        if k in (0, 1, 4):  # lossless classes: exact round-trip
            assert got == html, (doc_id, k)
            assert ratio == 0.0
            assert method == ("utf8" if k == 0 else "bom")
        elif k in (2, 3):  # declared cp1252: stdlib round-trip expectation
            declared = "windows-1252" if k == 2 else "iso-8859-1"
            exp = (
                html.replace("<head>", f'<head><meta charset="{declared}">', 1)
                .encode("cp1252", "replace")
                .decode("cp1252")
            )
            assert got == exp, (doc_id, k)
            assert codec == "cp1252" and method == "meta"
        else:  # k == 5: undeclared cp1252
            exp = html.encode("cp1252", "replace").decode("cp1252")
            assert got == exp, (doc_id, k)
            # pure-ASCII pages legitimately take the utf8 path
            assert method == ("utf8" if exp.isascii() else "fallback")


def test_class5_ascii_vs_accented():
    """The fallback/utf8 split on undeclared cp1252 bytes is real in both
    directions. html_for's chrome always contains non-ASCII ('©', '·'),
    so every class-5 page is fallback; the utf8 side of the split is
    probed with raw bytes."""
    by_id = {d[0]: d for d in DOCS}
    _, _, m_acc, _ = charset.decode_bytes(
        charset.encoded_page_for(*by_id[11])
    )
    assert m_acc == "fallback"  # accented Portuguese -> invalid UTF-8
    _, _, m_ascii, _ = charset.decode_bytes(
        "plain ascii page".encode("cp1252")
    )
    assert m_ascii == "utf8"


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_decode_total_on_arbitrary_bytes(payload):
    text, codec, method, ratio = charset.decode_bytes(payload)
    assert isinstance(text, str)
    assert 0.0 <= ratio <= 1.0
    assert method in ("bom", "meta", "utf8", "fallback", "empty")


def _docs_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text", "source", "lang"])
    )


def test_decode_stats_matches_pure_python(spark):
    pages = charset.synth_encoded_pages(_docs_df(spark))
    got = (
        charset.decode_stats(pages)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    payloads = [charset.encoded_page_for(*d) for d in DOCS]
    urls = [htmlops.page_url(d[0], d[2]) for d in DOCS]
    exp = charset.decoded_frame([d[0] for d in DOCS], urls, payloads)
    pd.testing.assert_frame_equal(got, exp.sort_values("doc_id").reset_index(drop=True))


def test_normalize_encoding_feeds_utf8_pipeline(spark):
    """After normalization every payload is clean UTF-8 and the DOM
    extractor recovers the article paragraphs for lossless classes —
    the operator really does make downstream .decode('utf-8') safe."""
    pages = charset.normalize_encoding(charset.synth_encoded_pages(_docs_df(spark)))
    rows = {r["doc_id"]: r for r in pages.collect()}
    assert set(rows) == {d[0] for d in DOCS}
    for doc_id, text, source, lang in DOCS:
        r = rows[doc_id]
        decoded = bytes(r["html"]).decode("utf-8")  # strict: must not raise
        if doc_id % charset.ENC_CLASSES in (0, 1, 4):
            assert decoded == htmlops.html_for(doc_id, text, source, lang)
    mains = {
        r["doc_id"]: r["main_text"]
        for r in htmlops.extract_main_content(pages).collect()
    }
    for doc_id, text, source, lang in DOCS:
        if doc_id % charset.ENC_CLASSES in (0, 1, 4):
            assert mains[doc_id] == "\n".join(htmlops._paragraphs(text))


def test_decode_plan_no_shuffle(spark):
    pages = charset.synth_encoded_pages(_docs_df(spark))
    plan = charset.decode_stats(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# MIME magic-byte triage
# ---------------------------------------------------------------------------

MIME_CASES = [
    (b"%PDF-1.7\nxx", "application/pdf"),
    (b"\x1f\x8b\x08\x00zz", "application/gzip"),
    (b"PK\x03\x04zz", "application/zip"),
    (b"\x89PNG\r\n\x1a\nrest", "image/png"),
    (b"\xff\xd8\xff\xe0jfif", "image/jpeg"),
    (b"GIF89a....", "image/gif"),
    (b"<!DOCTYPE html><html>", "text/html"),
    (b"\n  \t <html>", "text/html"),
    (b"plain ascii text only\n", "text/plain"),
    (b"", "application/octet-stream"),
    (None, "application/octet-stream"),
    (b"\x00\x01\x02junk", "application/octet-stream"),
    ("acentuação".encode("utf-8"), "application/octet-stream"),  # not ascii
    (b"\x7f", "application/octet-stream"),  # DEL is not printable
    # BOM-aware markup detection (WHATWG mime sniffing step 2)
    (codecs.BOM_UTF8 + b"<html>", "text/html"),
    (codecs.BOM_UTF8 + b"  <html>", "text/html"),
    (codecs.BOM_UTF8 + b"plain text", "text/plain"),
    (b"\xff\xfe" + "<html>".encode("utf-16-le"), "text/html"),
    (b"\xff\xfe" + " \n<p>".encode("utf-16-le"), "text/html"),
    (b"\xfe\xff" + "<html>".encode("utf-16-be"), "text/html"),
    (b"\xff\xfe" + "texto".encode("utf-16-le"), "text/plain"),
    (b"\xff\xfe\x00\x00" + "x".encode("utf-32-le"), "text/plain"),
]


def test_mime_of_cases():
    for payload, want in MIME_CASES:
        assert charset.mime_of(payload) == want, payload


def test_mime_spark_matches_pure(spark):
    import pyspark.sql.types as T

    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(MIME_CASES)],
        T.StructType(
            [
                T.StructField("i", T.IntegerType()),
                T.StructField("html", T.BinaryType()),
            ]
        ),
    )
    got = {r["i"]: r["mime"] for r in charset.mime_sniff(df).collect()}
    for i, (_, want) in enumerate(MIME_CASES):
        assert got[i] == want, MIME_CASES[i]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=80))
def test_mime_of_total(payload):
    assert charset.mime_of(payload) in {
        m for _, m in charset.MIME_RULES
    } | {charset.MIME_OTHER}


def test_mime_synth_byte_identity_with_staging(spark):
    """The Spark synth stage and the DuckDB staging emit the SAME bytes —
    the computing twin protocol's precondition."""
    sf = "/root/testdata/sf0.001"
    staged = charset.stage_charset_tables(sf)
    exp = pd.read_parquet(staged["mime_payloads"]).sort_values("doc_id")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = (
        charset.synth_payload_pages(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["url"]) == list(exp["url"])
    assert [bytes(a) for a in got["html"]] == [bytes(a) for a in exp["html"]]


def test_mime_sniff_plan_jvm_only(spark):
    """Classification is whole-stage-codegen: no Python crossing, no
    shuffle on a plain parquet scan input."""
    sf = "/root/testdata/sf0.001"
    staged = charset.stage_charset_tables(sf)
    df = charset.mime_sniff(spark.read.parquet(staged["mime_payloads"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan
