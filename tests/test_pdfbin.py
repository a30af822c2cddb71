"""Real binary-PDF decode (S1): the stdlib decoder against the reference's
own shipped exam PDFs and golden outputs.

The bar: for every exam with BOTH the questions (PV) and answer-key (GB)
PDFs shipped, our extraction must (a) recover EVERY question the reference's
golden output has, (b) match every golden answer letter exactly, and (c)
cover >= 93% of the goldens' decodable tokens per question. Byte-identity
against the goldens is NOT the gate on this path, deliberately: the shipped
goldens contain ~21k U+FFFD where fitz had no ToUnicode entry for the
subset fonts — this decoder recovers the actual text the reference lost
(pdfbin.py module docstring), so it extracts strictly MORE questions than
the goldens hold.
"""

from __future__ import annotations

import glob
import json
import re

import pytest

from enem_spark import oracle, pdfbin
from enem_spark.layout import IMG_MARKER, reconstruct_page

PDF_DIR = "/root/reference/pdfs_enem"
GOLD_DIR = "/root/reference/test_output"
# exams with PV+GB both shipped: (year, day, caderno)
FULL_EXAMS = [(2021, 1, 1), (2021, 2, 7), (2023, 2, 7)]

_decode_cache: dict[str, list[bytes]] = {}


def payloads(path: str) -> list[bytes]:
    if path not in _decode_cache:
        with open(path, "rb") as f:
            _decode_cache[path] = pdfbin.pdf_to_span_payloads(f.read())
    return _decode_cache[path]


def extract_exam(year: int, day: int, cd: int):
    d = f"D{day}"
    pv = payloads(f"{PDF_DIR}/{year}/{year}_PV_impresso_{d}_CD{cd}.pdf")
    gb = payloads(f"{PDF_DIR}/{year}/{year}_GB_impresso_{d}_CD{cd}.pdf")
    texts, imgs = [], []
    for p in pv:
        t, n = reconstruct_page(p)
        texts.append(t)
        imgs.append(n > 0)
    gb_text = "\n".join(reconstruct_page(p)[0] for p in gb)
    rows = oracle.extract_document(
        texts, imgs, gb_text, year, day_one=(day == 1)
    )
    return {(r.subject, r.payload["question_num"]): r.payload for r in rows}


def golden_rows(year: int, day: int):
    out = {}
    for f in glob.glob(f"{GOLD_DIR}/{year}_D{day}_/*_questions.json"):
        subj = f.split("/")[-1].split("_")[1]
        for q in json.load(open(f)):
            out[(subj, q["question_num"])] = q
    return out


def test_all_reference_pdfs_decode():
    """Every shipped PDF parses: pages, text volume, markers, bounded
    replacement chars (only glyphs beyond the 258-name standard order)."""
    for path in sorted(glob.glob(f"{PDF_DIR}/*/*.pdf")):
        pls = payloads(path)
        assert pls, path
        total = sum(len(reconstruct_page(p)[0]) for p in pls)
        is_pv = "_PV_" in path
        assert total > (20_000 if is_pv else 400), (path, total)
        if is_pv:
            assert len(pls) == 32, (path, len(pls))
            joined = "\n".join(reconstruct_page(p)[0] for p in pls)
            n_marks = len(re.findall(r"QUESTÃO|Questão", joined))
            assert n_marks >= 90, (path, n_marks)
            assert joined.count("�") / max(total, 1) < 0.01, path


@pytest.mark.parametrize("year,day,cd", FULL_EXAMS)
def test_golden_superset_answers_and_token_recall(year, day, cd):
    ours = extract_exam(year, day, cd)
    gold = golden_rows(year, day)
    assert gold, "goldens missing"
    missing = [k for k in gold if k not in ours]
    assert missing == [], f"{year} D{day}: golden questions lost: {missing}"
    tok_tot = tok_hit = 0
    for k, g in gold.items():
        o = ours[k]
        assert o["correct_answer"] == g["correct_answer"], (
            f"{year} D{day} {k}: answer {o['correct_answer']!r} "
            f"vs golden {g['correct_answer']!r}"
        )
        gtoks = [
            t
            for t in re.split(r"\s+", g["question_text"])
            if t and "�" not in t
        ]
        otoks = set(re.split(r"\s+", o["question_text"]))
        tok_tot += len(gtoks)
        tok_hit += sum(1 for t in gtoks if t in otoks)
    assert tok_hit / max(tok_tot, 1) >= 0.93, (
        f"{year} D{day}: token recall {tok_hit}/{tok_tot}"
    )
    # we must recover at least as many questions as the reference did
    assert len(ours) >= len(gold)


def test_gb_grid_is_cell_per_line():
    """The decoded answer key must survive the reference's >=4-char line
    blanking (enem_pdf_extractor.py:951-952) — numbers and letters on
    separate short lines, row-major."""
    gb = payloads(f"{PDF_DIR}/2020/2020_GB_impresso_D1_CD1.pdf")
    text = "\n".join(reconstruct_page(p)[0] for p in gb)
    filt = oracle.filter_answer_key_text(text)
    for n in (1, 23, 45, 46, 67, 90):
        assert re.search(rf"\b{n}\b", filt), n
    # probe three known rows end-to-end through the oracle's offset logic
    # (exam number n > 5 maps to key row n-5: exam 11 -> key 6 -> 'C')
    assert oracle.find_correct_answer(filt, 11, day_one=True) == "C"
    assert oracle.find_correct_answer(filt, 50, day_one=True) == "B"
    assert oracle.find_correct_answer(filt, 1, day_one=True, is_spanish=True) == "A"


def test_seq_mode_preserves_document_order():
    spans = [
        {"text": "right col", "x0": 320.0, "y0": 50.0, "x1": 560.0, "y1": 60.0, "seq": 1},
        {"text": "left col", "x0": 40.0, "y0": 50.0, "x1": 280.0, "y1": 60.0, "seq": 0},
        {"text": IMG_MARKER, "x0": 10.0, "y0": 10.0, "x1": 20.0, "y1": 20.0, "seq": 2},
    ]
    payload = json.dumps(spans).encode()
    text, n_img = reconstruct_page(payload)
    assert text == "left col\nright col"
    assert n_img == 1
    # without seq the geometric clustering applies (synthetic corpus path)
    for s in spans:
        del s["seq"]
    text2, _ = reconstruct_page(json.dumps(spans).encode())
    assert text2 == "left col\nright col"  # same here: distinct columns


def test_pdf_to_pages_text_equals_reconstruct():
    """pdf_to_pages derives text in the decode pass; it must equal
    reconstruct_page over its own payload byte-for-byte — on synthetic
    PDFs AND every page of a real reference exam."""
    pages = [["linha um", "linha dois"], ["QUESTÃO 1", "corpo A) x B) y"]]
    for payload, text in pdfbin.pdf_to_pages(pdfbin.synth_pdf(pages)):
        assert text == reconstruct_page(payload)[0]
    with open(f"{PDF_DIR}/2022/2022_GB_impresso_D1_CD1.pdf", "rb") as f:
        data = f.read()
    out = pdfbin.pdf_to_pages(data)
    assert out  # real document decoded
    for payload, text in out:
        assert text == reconstruct_page(payload)[0]


def test_corrupt_pdf_degrades_to_empty():
    assert pdfbin.decode_pdf_pages(b"not a pdf at all") == []
    assert pdfbin.pdf_to_span_payloads(b"%PDF-1.4\ngarbage\n%%EOF") == []
    # truncated real PDF: must not raise
    with open(f"{PDF_DIR}/2022/2022_GB_impresso_D1_CD1.pdf", "rb") as f:
        head = f.read(40_000)
    pdfbin.decode_pdf_pages(head)


def test_glyph_name_decoding():
    g = pdfbin.glyph_name_to_unicode
    assert g("g70") == "c" and g("g3") == " " and g("g89") == "v"
    # Arial subsets skip mac-order nonbreakingspace: >=172 shifts by one
    assert g("g191") == "ﬁ" and g("g179") == "“" and g("g182") == "’"
    assert g("g125") == "õ" and g("g111") == "ç" and g("g116") == "í"
    assert g("ccedilla") == "ç" and g("Eacute") == "É"
    assert g("uni0041") == "A"
    assert g("g9999") == "�"  # beyond the table: replacement, not crash
    assert g("notaglyphname") is None


def test_cmap_bfrange_forms():
    cm = pdfbin.parse_cmap(
        b"beginbfchar <41> <0042> endbfchar\n"
        b"beginbfrange <50> <52> <0061> <60> <61> [<0058> <0059>] endbfrange"
    )
    assert cm[0x41] == "B"
    assert cm[0x50] == "a" and cm[0x52] == "c"
    assert cm[0x60] == "X" and cm[0x61] == "Y"


def test_spark_source_matches_pure_oracle(spark):
    """The distributed path (binaryFile -> mapInPandas decode -> the full
    extraction pipeline) must equal the pure per-document oracle run on
    the same PDFs — same questions, same text, same answers."""
    from enem_spark.extract import ExtractorConfig, extract_questions
    from enem_spark.sources.pdfsource import pdf_pages_frame

    pages = pdf_pages_frame(spark, f"{PDF_DIR}/2021")
    cfg = ExtractorConfig(output_type="json", process_images=False)
    got = {
        (r.subject, r.question_num): r
        for r in extract_questions(pages, cfg).collect()
        if r.day == "D1"
    }
    pure = extract_exam(2021, 1, 1)
    assert set(got) == set(pure)
    for k, row in got.items():
        assert row.correct_answer == pure[k]["correct_answer"], k
        assert row.question_text == pure[k]["question_text"], k
    assert len(got) == 60  # the reference's goldens hold only 9 of these


def test_truncated_literal_string_terminates():
    """A literal string cut off at a backslash (or mid-octal) must parse to
    its prefix, not spin — truncated streams are exactly what the zlib
    prefix-salvage produces."""
    assert pdfbin.parse_litstring(pdfbin.Lexer(b"(abc\\")) == b"abc"
    assert pdfbin.parse_litstring(pdfbin.Lexer(b"(abc\\4")) == b"abc\x04"


def test_surrogate_code_points_never_reach_payloads():
    cm = pdfbin.parse_cmap(b"beginbfrange <00> <02> <d800> endbfrange")
    assert cm[0] == "\N{REPLACEMENT CHARACTER}"
    assert pdfbin.glyph_name_to_unicode("uniD800") == "\N{REPLACEMENT CHARACTER}"


def test_in_stream_obj_header_cannot_shadow_objects():
    """'N 0 obj' byte patterns inside a stream body must not shadow real
    objects: the sequential walk parses past whole objects instead of
    regex-scanning the raw file."""
    pages = pdfbin.doc_pdf_lines("decoy test 1 0 obj shadow attempt " * 6)
    decoded = pdfbin.pdf_to_span_payloads(pdfbin.synth_pdf(pages))
    assert len(decoded) == 2 and decoded[0] != b"[]"
    texts = [reconstruct_page(p)[0] for p in decoded]
    assert "1 0 obj" in texts[0]  # the decoy really was in page text


def test_q_Q_restores_text_state():
    """Tf inside q..Q must not leak (ISO 32000-1 §8.4.2: text state is part
    of the saved graphics state)."""
    content = (
        b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (base) Tj "
        b"q /F1 40 Tf 1 0 0 1 50 600 Tm (big) Tj Q "
        b"1 0 0 1 50 500 Tm (after) Tj ET"
    )
    # interpret the custom stream directly against a synth PDF's font
    f = pdfbin.PDFFile(pdfbin.synth_pdf([["x"]]))
    page, inh = f.pages()[0]
    runs: list = []
    pdfbin._interpret(f, content, inh.get(b"/Resources"), pdfbin._ID, runs)
    sizes = {t: s for _, _, t, s, _ in runs}
    assert sizes["base"] == 10 and sizes["big"] == 40
    assert sizes["after"] == 10, "text state leaked out of q..Q"


def test_images_mode_over_real_pdfs(spark):
    """S3 on real bytes: the binary images table materializes one row per
    image marker the decoder emitted on valid PV pages (page >= 1), and
    every ref joins back to its page url."""
    from enem_spark.extract import materialize_images
    from enem_spark.sources.pdfsource import pdf_pages_frame

    pages = pdf_pages_frame(spark, f"{PDF_DIR}/2021")
    imgs = materialize_images(pages).collect()
    # pure-side expectation: marker counts over the same decoded payloads
    import enem_spark.layout as layout

    expected = 0
    for year_pdf in ("2021_PV_impresso_D1_CD1", "2021_PV_impresso_D2_CD7"):
        for idx, p in enumerate(payloads(f"{PDF_DIR}/2021/{year_pdf}.pdf")):
            if idx >= 1:  # cover page excluded (F2)
                expected += layout.count_image_spans(p)
    assert len(imgs) == expected > 0
    for row in imgs[:20]:
        assert row.image_ref.rsplit("#img", 1)[0].endswith(
            tuple(f"/page/{i}" for i in range(33))
        )
        assert row.png.startswith(b"\x89PNG")


def test_fuzz_decode_never_raises():
    """Arbitrary byte soup — including mutated valid PDFs, the nastier
    case — must decode to a (possibly empty) page list, never raise or
    spin. Mirrors the WARC fuzz gate: one bad document cannot kill a job."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = pdfbin.synth_pdf(pdfbin.doc_pdf_lines("fuzz seed text " * 20))

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=400), st.data())
    def run(blob, data):
        # raw soup
        pdfbin.decode_pdf_pages(blob)
        # splice the soup into a valid PDF at a random offset
        cut = data.draw(st.integers(0, len(base)))
        pdfbin.decode_pdf_pages(base[:cut] + blob + base[cut:])
        # truncation
        pdfbin.decode_pdf_pages(base[: data.draw(st.integers(0, len(base)))])

    run()


def test_extract_images_matches_golden_names_2023_d2():
    """The one complete golden/PDF pairing: every page_images basename the
    reference emitted for 2023 D2 (``2023_D2_page{P}_{K}.png``,
    enem_pdf_extractor.py:328 — P is the 0-based fitz page index, K the
    1-based per-page image index) must be exactly the (page, index) set
    extract_images recovers from the same PDF."""
    golden = set()
    for f in glob.glob(f"{GOLD_DIR}/2023_D2_img/*_questions.json"):
        for q in json.load(open(f)):
            for img in q.get("page_images", []):
                m = re.match(
                    r"2023_D2_page(\d+)_(\d+)\.png", img.rsplit("/", 1)[-1]
                )
                assert m, img
                golden.add((int(m.group(1)), int(m.group(2))))
    imgs = pdfbin.extract_images(
        open(f"{PDF_DIR}/2023/2023_PV_impresso_D2_CD7.pdf", "rb").read()
    )
    assert {(i["page_idx"], i["img_index"]) for i in imgs} == golden
    assert len(golden) == 6


def test_extract_images_real_pdfs_decode_clean():
    """Every page-referenced image across the shipped corpus decodes
    without the error fallback, and every Flate AND baseline-JPEG source
    becomes a REAL PNG (the reference converts everything to PNG via
    fitz.Pixmap) that our own header parse + zlib round-trip validates;
    only the 2 CCITT masks remain a tagged passthrough."""
    import struct
    import zlib as _z

    from enem_spark import imaging

    totals = {}
    for path in sorted(glob.glob(f"{PDF_DIR}/*/*.pdf")):
        for i in pdfbin.extract_images(open(path, "rb").read()):
            assert i["fmt"] != "error", (path, i["page_idx"])
            key = (i["fmt"], i["codec"])
            totals[key] = totals.get(key, 0) + 1
            if i["fmt"] == "png":
                hdr = imaging.png_parse(i["image"])
                assert hdr and hdr["width"] == i["width"] > 0
                assert hdr["height"] == i["height"] > 0
                # inflate the IDAT stream and check exact pixel volume
                pos, idat = 8, b""
                data = i["image"]
                while pos < len(data):
                    ln, tag = struct.unpack(">I4s", data[pos : pos + 8])
                    if tag == b"IDAT":
                        idat += data[pos + 8 : pos + 8 + ln]
                    pos += 12 + ln
                raw = _z.decompress(idat)
                assert len(raw) == i["height"] * (
                    i["width"] * i["channels"] + 1
                )
    # the corpus-wide inventory is stable, and EVERY image is now a real
    # PNG: 47 Flate + 1 unfiltered raw + 224 baseline JPEG (pixel-decoded)
    # + 2 CCITT Group 4 (MMR-decoded)
    assert totals == {
        ("png", "flate"): 47,
        ("png", "raw"): 1,
        ("png", "jpeg"): 224,
        ("png", "ccitt"): 2,
    }


def test_synth_image_round_trip_all_branches():
    """synth_pdf-embedded specs -> extract_images must reproduce the
    direct kernel composition (expected_image_rows) bit-for-bit, covering
    gray / predictor / indexed / CMYK / SMask across rotations."""
    import hashlib

    for doc_id in range(10):
        data = pdfbin.synth_pdf(
            pdfbin.doc_pdf_lines("corpo do texto " * 30),
            pdfbin.synth_doc_images(doc_id),
        )
        got = [
            {
                "doc_id": doc_id,
                "page_idx": r["page_idx"],
                "img_index": r["img_index"],
                "width": r["width"],
                "height": r["height"],
                "fmt": r["fmt"],
                "codec": r["codec"],
                "channels": r["channels"],
                "had_alpha": r["had_alpha"],
                "was_cmyk": r["was_cmyk"],
                "png_md5": hashlib.md5(r["image"]).hexdigest(),
            }
            for r in pdfbin.extract_images(data)
        ]
        assert got == pdfbin.expected_image_rows(doc_id)
        # the text path is unchanged by embedded images
        assert len(pdfbin.pdf_to_span_payloads(data)) == 2


def test_pdf_images_frame_matches_pure_extraction(spark):
    """The distributed images table (binaryFile -> one Arrow crossing)
    over real reference PDFs equals the pure extract_images run per
    file — same rows, same hashes, no shuffle in the plan."""
    import hashlib

    from enem_spark.sources.pdfsource import pdf_images_frame

    df = pdf_images_frame(spark, f"{PDF_DIR}/2023")
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()
    got = {
        (r.url.rsplit("/", 1)[-1], r.page_idx, r.img_index): (
            r.width, r.height, r.fmt, r.png_md5
        )
        for r in df.collect()
    }
    expected = {}
    for path in glob.glob(f"{PDF_DIR}/2023/*.pdf"):
        stem = path.rsplit("/", 1)[-1][: -len(".pdf")]
        for rec in pdfbin.extract_images(open(path, "rb").read()):
            expected[(stem, rec["page_idx"], rec["img_index"])] = (
                rec["width"], rec["height"], rec["fmt"],
                hashlib.md5(rec["image"]).hexdigest(),
            )
    assert got == expected and len(got) == 6
