"""Raster-kernel unit tests (enem_spark.imaging) — the from-scratch
Pixmap/PNG layer behind the S3 image path (reference
enem_pdf_extractor.py:306-331). Pure Python, no Spark."""

from __future__ import annotations

import glob
import struct
import zlib

import numpy as np
import pytest

from enem_spark import imaging, pdfbin
from enem_spark.layout import deterministic_pixels


def _rng_bytes(seed: bytes, n: int) -> bytes:
    return deterministic_pixels(seed, n)


def _png_idat(png: bytes) -> bytes:
    pos, idat = 8, b""
    while pos < len(png):
        ln, tag = struct.unpack(">I4s", png[pos : pos + 8])
        if tag == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    return zlib.decompress(idat)


def test_png_encode_round_trips_through_own_parse():
    for channels in (1, 2, 3, 4):
        w, h = 7, 5
        samples = _rng_bytes(b"png%d" % channels, w * h * channels)
        png = imaging.png_encode(w, h, samples, channels)
        hdr = imaging.png_parse(png)
        assert hdr == {
            "width": w,
            "height": h,
            "bit_depth": 8,
            "color_type": {1: 0, 2: 4, 3: 2, 4: 6}[channels],
            "channels": channels,
            "format": "png",
        }
        raw = _png_idat(png)
        stride = w * channels
        assert len(raw) == h * (stride + 1)
        body = b"".join(
            raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
            for r in range(h)
        )
        assert body == samples
        assert all(raw[r * (stride + 1)] == 0 for r in range(h))


def test_png_encode_pads_and_truncates():
    png = imaging.png_encode(4, 4, b"\x01" * 10, 1)  # short -> zero pad
    raw = _png_idat(png)
    body = b"".join(raw[r * 5 + 1 : (r + 1) * 5] for r in range(4))
    assert body == b"\x01" * 10 + b"\x00" * 6
    with pytest.raises(ValueError):
        imaging.png_encode(0, 4, b"", 1)
    with pytest.raises(ValueError):
        imaging.png_encode(2, 2, b"\x00" * 20, 5)


def test_strip_alpha_and_cmyk():
    rgba = bytes([10, 20, 30, 200, 40, 50, 60, 100])
    assert imaging.strip_alpha(rgba, 4) == bytes([10, 20, 30, 40, 50, 60])
    ga = bytes([7, 255, 9, 0])
    assert imaging.strip_alpha(ga, 2) == bytes([7, 9])
    # pure K=255 -> black; zero ink -> white; formula is (255-C)(255-K)/255
    cmyk = bytes([0, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 0])
    assert imaging.cmyk_to_rgb(cmyk) == bytes([0, 0, 0, 255, 255, 255, 0, 255, 255])


def test_expand_bits_gray_1_2_4():
    # 1-bit, width 10 (stride 2 bytes, 6 pad bits/row)
    row = 0b1010101010
    samples = bytes([row >> 2 & 0xFF, (row & 0b11) << 6] * 2)
    out = imaging.expand_bits_gray(samples, 10, 2, 1)
    assert len(out) == 20
    assert out[:4] == bytes([255, 0, 255, 0])
    inv = imaging.expand_bits_gray(samples, 10, 2, 1, invert=True)
    assert inv[:4] == bytes([0, 255, 0, 255])
    # 4-bit scales by 17 (255 // 15)
    out4 = imaging.expand_bits_gray(bytes([0x1F, 0x80]), 3, 1, 4)
    assert out4 == bytes([17, 255, 8 * 17])
    # 2-bit scales by 85
    out2 = imaging.expand_bits_gray(bytes([0b00011011]), 4, 1, 2)
    assert out2 == bytes([0, 85, 170, 255])


def test_expand_indexed_clamps():
    palette = bytes([255, 0, 0, 0, 255, 0])  # 2 RGB entries
    out = imaging.expand_indexed(bytes([0, 1, 9]), palette, 3, 1)
    assert out == bytes([255, 0, 0, 0, 255, 0, 0, 255, 0])  # 9 clamps to 1


def _png_filter_encode(samples: bytes, stride: int, ftypes: list[int]) -> bytes:
    """Forward-apply PNG filters (the encoder side unpredict must undo)."""
    rows = [samples[r * stride : (r + 1) * stride] for r in range(len(ftypes))]
    prev = b"\x00" * stride
    out = bytearray()
    fpp = 3
    for row, ft in zip(rows, ftypes):
        out.append(ft)
        for i in range(stride):
            a = row[i - fpp] if i >= fpp else 0
            b = prev[i]
            c = prev[i - fpp] if i >= fpp else 0
            if ft == 0:
                enc = row[i]
            elif ft == 1:
                enc = (row[i] - a) & 0xFF
            elif ft == 2:
                enc = (row[i] - b) & 0xFF
            elif ft == 3:
                enc = (row[i] - (a + b) // 2) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else c
                enc = (row[i] - pred) & 0xFF
            out.append(enc)
        prev = row
    return bytes(out)


def test_unpredict_png_all_filters():
    w, h, colors = 6, 5, 3
    stride = w * colors
    samples = _rng_bytes(b"pred", stride * h)
    enc = _png_filter_encode(samples, stride, [0, 1, 2, 3, 4])
    assert imaging.unpredict(enc, 15, colors, 8, w) == samples


def test_unpredict_tiff():
    w, h, colors = 5, 3, 2
    stride = w * colors
    samples = _rng_bytes(b"tiff", stride * h)
    arr = np.frombuffer(samples, np.uint8).reshape(h, w, colors).astype(np.int16)
    diff = arr.copy()
    diff[:, 1:, :] = (arr[:, 1:, :] - arr[:, :-1, :]) % 256
    assert (
        imaging.unpredict(diff.astype(np.uint8).tobytes(), 2, colors, 8, w)
        == samples
    )


def test_unpredict_passthrough_and_errors():
    assert imaging.unpredict(b"abc", 1, 3, 8, 1) == b"abc"
    with pytest.raises(ValueError):
        imaging.unpredict(b"\x00" * 8, 15, 1, 4, 8)
    with pytest.raises(ValueError):
        imaging.unpredict(b"\x09" + b"\x00" * 3, 15, 3, 8, 1)


def test_jpeg_decode_on_real_pdf_jpegs():
    """Real DCTDecode streams pixel-decode to PNGs whose IHDR dims equal
    the SOF dims, with non-degenerate pixel statistics (a broken IDCT or
    Huffman walk collapses to flat/garbage planes)."""
    pdfs = sorted(glob.glob("/root/reference/pdfs_enem/2023/*PV*.pdf"))
    if not pdfs:  # pragma: no cover - reference not mounted
        pytest.skip("reference PDFs unavailable")
    imgs = pdfbin.extract_images(open(pdfs[0], "rb").read())
    decoded = [i for i in imgs if i["codec"] == "jpeg"]
    assert decoded and all(i["fmt"] == "png" for i in decoded)
    for i in decoded:
        hdr = imaging.png_parse(i["image"])
        assert hdr["width"] == i["width"] > 0
        assert hdr["height"] == i["height"] > 0
        raw = _png_idat(i["image"])
        stride = i["width"] * i["channels"] + 1
        body = np.frombuffer(
            b"".join(
                raw[r * stride + 1 : (r + 1) * stride]
                for r in range(i["height"])
            ),
            np.uint8,
        )
        assert body.std() > 10  # real picture content, not a flat plane


def test_jpeg_parse_rejects_non_jpeg():
    assert imaging.jpeg_parse(b"") is None
    assert imaging.jpeg_parse(b"\x89PNG\r\n\x1a\n") is None
    assert imaging.jpeg_parse(b"\xff\xd8\xff\xe0\x00\x02") is None
    assert imaging.png_parse(b"\xff\xd8") is None


def test_png_decode_roundtrips_png_encode():
    # decode is the exact inverse of the repo's own writer for every
    # channel count the writer emits (gray, gray+A, RGB, RGBA)
    for ch in (1, 2, 3, 4):
        w, h = 11, 7
        src = _rng_bytes(f"rt{ch}".encode(), w * h * ch)
        got = imaging.png_decode(imaging.png_encode(w, h, src, ch))
        assert got is not None
        gw, gh, gch, samples = got
        assert (gw, gh, gch) == (w, h, ch)
        assert samples == src


def test_png_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        ch=st.integers(1, 4),
        seed=st.binary(min_size=1, max_size=8),
    )
    def check(w, h, ch, seed):
        src = _rng_bytes(seed, w * h * ch)
        got = imaging.png_decode(imaging.png_encode(w, h, src, ch))
        assert got == (w, h, ch, src)

    check()


def test_png_decode_palette_and_rejects():
    import struct as st
    import zlib

    # hand-built 3x2 palette PNG (color type 3): indices 0..5 -> palette
    pal = bytes(range(18))  # 6 RGB entries
    ihdr = st.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    rows = b"\x00\x00\x01\x02" + b"\x00\x03\x04\x05"  # filter-0 rows
    png = (
        b"\x89PNG\r\n\x1a\n"
        + imaging._chunk(b"IHDR", ihdr)
        + imaging._chunk(b"PLTE", pal)
        + imaging._chunk(b"IDAT", zlib.compress(rows))
        + imaging._chunk(b"IEND", b"")
    )
    got = imaging.png_decode(png)
    assert got == (3, 2, 3, pal)  # indices 0..5 expand to the palette
    # 16-bit and interlaced are out of scope -> None, never a crash
    ihdr16 = st.pack(">IIBBBBB", 3, 2, 16, 2, 0, 0, 0)
    assert imaging.png_decode(
        b"\x89PNG\r\n\x1a\n" + imaging._chunk(b"IHDR", ihdr16)
    ) is None
    assert imaging.png_decode(b"\x89PNG\r\n\x1a\ntrunc") is None
    # quarantine contract: corrupt streams return None, never raise —
    # a bad filter byte (5) and an undersized palette both previously
    # threw out of the mapInPandas task and would kill the whole job
    ihdr_g = st.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bad_filter = (
        b"\x89PNG\r\n\x1a\n"
        + imaging._chunk(b"IHDR", ihdr_g)
        + imaging._chunk(b"IDAT", zlib.compress(b"\x05\x00"))
        + imaging._chunk(b"IEND", b"")
    )
    assert imaging.png_decode(bad_filter) is None
    tiny_plte = (
        b"\x89PNG\r\n\x1a\n"
        + imaging._chunk(b"IHDR", st.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + imaging._chunk(b"PLTE", b"\x01\x02")  # <1 full RGB entry
        + imaging._chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + imaging._chunk(b"IEND", b"")
    )
    assert imaging.png_decode(tiny_plte) is None
    from enem_spark import multimodal

    assert multimodal.media_feature_vector(bad_filter, False) is None
    assert multimodal.resize_image(bad_filter, 2, 2) is None


def test_media_feature_vector_real_pixels_for_png():
    from enem_spark import multimodal

    w, h, ch = 9, 5, 3
    src = _rng_bytes(b"feat", w * h * ch)
    png = imaging.png_encode(w, h, src, ch)
    feats = multimodal.media_feature_vector(png)
    # identical to featurizing the source pixels directly: the vector is
    # pixel-derived, not a digest fake
    assert feats == multimodal.pixel_features(w, h, ch, src)
    assert feats != multimodal.decode_stub(png, True)
    import numpy as np

    arr = np.frombuffer(src, np.uint8)
    assert feats[0] == round(float(arr.mean()) / 255.0, 6)
    assert feats[2] == round(float(arr.min()) / 255.0, 6)
    assert feats[3] == round(float(arr.max()) / 255.0, 6)
    assert 0.0 < feats[4] <= 1.0  # histogram entropy, bits/8
    # non-decodable payloads: digest fake when allowed, None otherwise
    txt = b"plain text payload"
    assert multimodal.media_feature_vector(txt) == multimodal.decode_stub(txt, True)
    assert multimodal.media_feature_vector(txt, deterministic_fake=False) is None


def test_resize_image_nearest_neighbor_exact():
    from enem_spark import multimodal
    import numpy as np

    # 4x2 RGB with distinct per-pixel values: downsample to 2x1 must pick
    # the center-sampled pixels exactly (ys=[1], xs=[1,3] for h 2->1, w 4->2)
    src = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    png = imaging.png_encode(4, 2, src.tobytes(), 3)
    out = multimodal.resize_image(png, 2, 1)
    w, h, ch, samples = imaging.png_decode(out)
    assert (w, h, ch) == (2, 1, 3)
    got = np.frombuffer(samples, np.uint8).reshape(1, 2, 3)
    assert (got[0, 0] == src[1, 1]).all() and (got[0, 1] == src[1, 3]).all()
    # upscale round-trips through the same integer map (no crash, exact dims)
    up = multimodal.resize_image(png, 9, 5)
    assert imaging.png_parse(up)["width"] == 9
    assert imaging.png_parse(up)["height"] == 5
    # undecodable -> None (quarantine), bad target -> error
    assert multimodal.resize_image(b"not an image", 2, 2) is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.resize_image(png, 0, 2)


def test_jpeg_parse_stops_at_sos_without_sof():
    # SOS before any SOF: the walk must NOT continue into entropy-coded
    # data (stuffed 0xFF bytes look like segments and once yielded garbage
    # dims); dims are unknowable -> None. Same for a stray EOI.
    sos_first = (
        b"\xff\xd8"
        + b"\xff\xda\x00\x08" + b"\x01\x01\x00\x00\x3f\x00"  # SOS segment
        # entropy data containing a fake "SOF" pattern with a bogus size
        + b"\x12\xff\xc0\x00\x11\x08\x30\x39\x30\x39\x03"
    )
    assert imaging.jpeg_parse(sos_first) is None
    eoi_first = b"\xff\xd8" + b"\xff\xd9" + b"\xff\xc0\x00\x11\x08\x00\x09\x00\x09\x03"
    assert imaging.jpeg_parse(eoi_first) is None


def test_sniff_media_real_headers():
    from enem_spark import multimodal

    png = imaging.png_encode(9, 4, _rng_bytes(b"s", 9 * 4 * 3), 3)
    assert multimodal.sniff_media(png) == {
        "format": "png", "width": 9, "height": 4, "channels": 3,
        "bit_depth": 8,
    }
    jpg = multimodal.minimal_jpeg(33, 21, 3)
    assert multimodal.sniff_media(jpg) == {
        "format": "jpeg", "width": 33, "height": 21, "channels": 3,
        "bit_depth": 8,
    }
    assert multimodal.sniff_media(b"plain text")["format"] == "unknown"


def test_synth_media_payload_cycles_formats():
    from enem_spark import multimodal

    seen = set()
    for doc_id in range(9):
        s = multimodal.sniff_media(
            multimodal.synth_media_payload(doc_id, "texto")
        )
        seen.add(s["format"])
        if doc_id % 3 == 0:
            assert s["format"] == "png" and s["width"] == 4 + doc_id % 7
        elif doc_id % 3 == 1:
            assert s["format"] == "jpeg" and s["height"] == 10 + doc_id % 4
    assert seen == {"png", "jpeg", "unknown"}


def test_jpeg_decode_hand_assembled_dc_only():
    """Huffman + dequant + IDCT ground truth without any external encoder:
    a hand-assembled single-MCU grayscale JPEG whose block is DC-only.
    With quant=16 and DC diff +8 the dequantized DC is 128, and the IDCT
    of a DC-only block is flat: 128/8 + 128 = 144 everywhere."""
    import struct as _s

    # Huffman DC table: one 2-bit code -> symbol 4 (category 4)
    counts = bytes([0, 1] + [0] * 14)
    dht_dc = b"\x00" + counts + bytes([4])
    # AC table: one 2-bit code -> symbol 0 (EOB)
    dht_ac = b"\x10" + counts + bytes([0])
    dqt = b"\x00" + bytes([16] * 64)
    sof = _s.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # entropy: DC huff code '00' + 4 magnitude bits '1000' (=+8),
    # then AC EOB '00' -> 0b0010000000 padded with 1s to 2 bytes
    entropy = bytes([0b00100000, 0b00111111])

    def seg(marker, payload):
        return bytes([0xFF, marker]) + _s.pack(">H", len(payload) + 2) + payload

    jpg = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xC0, sof)
        + seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )
    out = imaging.jpeg_decode(jpg)
    assert out is not None
    w, h, ch, samples = out
    assert (w, h, ch) == (8, 8, 1)
    expect = round(128 / 8 + 128)  # c(0)^2/4 * DC = DC/8, level-shifted
    assert set(samples) == {expect}


def test_media_feature_vector_real_pixels_for_jpeg():
    """decode_pixels' JPEG branch: the hand-assembled DC-only JPEG above
    decodes to a flat 144 plane, so the feature vector must be the exact
    pixel stats (mean 144/255, std 0, entropy 0) — not the digest fake."""
    import struct as _s

    from enem_spark import multimodal

    counts = bytes([0, 1] + [0] * 14)
    dht_dc = b"\x00" + counts + bytes([4])
    dht_ac = b"\x10" + counts + bytes([0])
    dqt = b"\x00" + bytes([16] * 64)
    sof = _s.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    entropy = bytes([0b00100000, 0b00111111])

    def seg(marker, payload):
        return bytes([0xFF, marker]) + _s.pack(">H", len(payload) + 2) + payload

    jpg = (
        b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC4, dht_dc) + seg(0xC4, dht_ac)
        + seg(0xC0, sof) + seg(0xDA, sos) + entropy + b"\xff\xd9"
    )
    feats = multimodal.media_feature_vector(jpg)
    assert feats == multimodal.pixel_features(8, 8, 1, bytes([144]) * 64)
    assert feats[0] == round(144 / 255.0, 6)
    assert feats[1] == 0.0 and feats[4] == 0.0
    assert feats != multimodal.decode_stub(jpg, True)
    # resize rides the same decode: 8x8 gray -> 2x2 flat PNG
    rz = multimodal.resize_image(jpg, 2, 2)
    assert imaging.png_decode(rz) == (2, 2, 1, bytes([144]) * 4)


def test_idct_basis_inverts_forward_dct():
    """The separable IDCT used per block is the exact inverse of the
    textbook forward DCT-II (computed longhand here) on random blocks."""
    rng = np.random.RandomState(7)
    block = rng.randint(0, 256, (8, 8)).astype(np.float64) - 128.0
    fwd = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            fwd[u, v] = cu * cv / 4.0 * s
    back = imaging._IDCT_A.T @ fwd @ imaging._IDCT_A
    assert np.abs(back - block).max() < 1e-9


def test_ccitt_g4_round_trip_and_real_streams():
    """The from-scratch T.6 codec: bit-exact round trip on random
    bitmaps (encoder and decoder share the MH tables, so the REAL
    evidence is structural) and full-row decode of the corpus' two real
    K=-1 streams with plausible ink coverage."""
    rng = np.random.RandomState(11)
    for w, h, p in [(64, 40, 0.3), (501, 20, 0.5), (17, 9, 0.02), (30, 5, 1.0)]:
        gray = np.where(rng.rand(h, w) < p, 0, 255).astype(np.uint8).tobytes()
        enc = imaging.ccitt_g4_encode(gray, w, h)
        assert imaging.ccitt_g4_decode(enc, w, h) == gray
    from enem_spark.pdfbin import PDFFile, Ref

    path = sorted(glob.glob("/root/reference/pdfs_enem/2021/*PV*D1*.pdf"))
    if not path:  # pragma: no cover - reference not mounted
        pytest.skip("reference PDFs unavailable")
    pdf = PDFFile(open(path[0], "rb").read())
    checked = 0
    for num in list(pdf.objs):
        o = pdf.get(Ref(num))
        if (
            isinstance(o, dict)
            and o.get(b"/Subtype") == b"/Image"
            and pdf.get(o.get(b"/Filter")) == b"/CCITTFaxDecode"
        ):
            cols = pdf.get(o.get(b"/Width"))
            rows = pdf.get(o.get(b"/Height"))
            out = np.frombuffer(
                imaging.ccitt_g4_decode(o[b"__stream__"], cols, rows),
                np.uint8,
            )
            frac = float(np.mean(out == 0))
            assert 0.05 < frac < 0.8  # a real figure mask, not noise
            checked += 1
    assert checked == 2


def test_jpeg_decode_with_restart_markers():
    """DRI/RSTn handling: a hand-assembled two-MCU grayscale JPEG with a
    restart interval of 1 — the RST0 marker between the MCUs must be
    consumed and the DC predictor reset, or every post-restart MCU decodes
    from stuck zero bits (the bug this test pins)."""
    import struct as _s

    counts = bytes([0, 1] + [0] * 14)
    dht_dc = b"\x00" + counts + bytes([4])  # one 2-bit code -> category 4
    dht_ac = b"\x10" + counts + bytes([0])  # one 2-bit code -> EOB
    dqt = b"\x00" + bytes([16] * 64)
    sof = _s.pack(">BHHB", 8, 16, 8, 1) + bytes([1, 0x11, 0])  # 8x16 = 2 MCUs
    sos = bytes([1, 1, 0x00, 0, 63, 0])

    def seg(marker, payload):
        return bytes([0xFF, marker]) + _s.pack(">H", len(payload) + 2) + payload

    # MCU1: DC '00'+'1000' (+8 -> DC 128 -> pixel 144), EOB '00' = 0x20
    # MCU2 (after RST0, predictor reset): '00'+'1111' (+15 -> DC 240 ->
    # pixel 158), EOB '00' = 0x3C
    jpg = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDD, b"\x00\x01")  # DRI = 1 MCU
        + seg(0xC0, sof)
        + seg(0xDA, sos)
        + bytes([0b00100000])
        + b"\xff\xd0"  # RST0
        + bytes([0b00111100])
        + b"\xff\xd9"
    )
    out = imaging.jpeg_decode(jpg)
    assert out is not None
    w, h, ch, samples = out
    assert (w, h, ch) == (8, 16, 1)
    assert set(samples[: 8 * 8]) == {144}
    assert set(samples[8 * 8 :]) == {158}


def test_expand_bits_raw_indices_for_palettes():
    """scale=False keeps raw sub-8-bpc values (palette indices);
    scale=True gray-scales them — mixing the two clamps nearly every
    indexed pixel to the last palette row (the bug this pins)."""
    # 4-bit samples 1,2 packed into one byte
    assert imaging.expand_bits(b"\x12", 2, 1, 4, scale=False) == bytes([1, 2])
    assert imaging.expand_bits(b"\x12", 2, 1, 4, scale=True) == bytes([17, 34])
    # interleaved 4-bit RGB-ish: 6 values per row = 3 bytes, not width-stride
    vals = imaging.expand_bits(b"\x12\x34\x56", 6, 1, 4, scale=False)
    assert vals == bytes([1, 2, 3, 4, 5, 6])


# --- progressive JPEG (SOF2) certification -----------------------------------


def _test_image(w, h, channels, seed=0):
    """Deterministic busy test image: gradients + md5-derived noise so
    every spectral band carries energy (flat images would leave the AC
    refinement paths vacuous)."""
    import hashlib

    rng = np.frombuffer(
        hashlib.md5(f"{w}x{h}x{channels}x{seed}".encode()).digest() * (
            (w * h * channels) // 16 + 1
        ),
        dtype=np.uint8,
    )[: w * h * channels].reshape(h, w, channels).astype(np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx * 255) // max(w - 1, 1) + (yy * 128) // max(h - 1, 1)) % 256
    out = (grad[:, :, None] * 3 + rng) // 4
    return np.clip(out, 0, 255).astype(np.uint8).tobytes()


@pytest.mark.parametrize(
    "w,h,ch",
    [(8, 8, 1), (16, 16, 3), (13, 9, 1), (35, 22, 3), (64, 48, 3), (7, 7, 3)],
)
def test_progressive_decodes_identical_to_baseline(w, h, ch):
    """THE certification: a baseline and a progressive encode of the SAME
    quantized coefficients must decode byte-identically — the scan order
    differs, the data does not. Exercises spectral selection, successive
    approximation (DC and AC first + refinement), and EOB runs."""
    px = _test_image(w, h, ch)
    base = imaging.jpeg_encode_baseline(w, h, ch, px)
    prog = imaging.jpeg_encode_progressive(w, h, ch, px)
    # stream-level markers: really SOF0 vs SOF2, multiple scans
    assert b"\xff\xc0" in base and b"\xff\xc2" not in base
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
    assert prog.count(b"\xff\xda") > base.count(b"\xff\xda")
    out_b = imaging.jpeg_decode(base)
    out_p = imaging.jpeg_decode(prog)
    assert out_b is not None and out_p is not None
    assert out_b[:3] == (w, h, ch) and out_p[:3] == (w, h, ch)
    assert out_b[3] == out_p[3]  # byte-identical pixels
    # and the encode is a faithful (lossy-bounded) image: quantization
    # error at _CERT_Q magnitudes stays far from garbage
    a = np.frombuffer(px, dtype=np.uint8).astype(np.int32)
    b = np.frombuffer(out_b[3], dtype=np.uint8).astype(np.int32)
    assert float(np.mean(np.abs(a - b))) < 12.0


def test_progressive_flat_image_eob_runs():
    """A flat image drives maximal EOB-run accumulation (every AC block
    empty across many blocks): the decoder's eobrun skip path must
    reconstruct it exactly."""
    w, h = 80, 40  # 50 blocks per component
    px = bytes([77]) * (w * h * 3)
    prog = imaging.jpeg_encode_progressive(w, h, 3, px)
    out = imaging.jpeg_decode(prog)
    assert out is not None
    base = imaging.jpeg_decode(imaging.jpeg_encode_baseline(w, h, 3, px))
    assert out[3] == base[3]
    vals = set(out[3])
    assert all(abs(v - 77) <= 2 for v in vals)


def test_progressive_corpus_jpegs_roundtrip():
    """Real corpus JPEGs (baseline streams extracted from the reference
    PDFs): re-encode their decoded pixels progressively; the progressive
    decode must equal the baseline re-encode's decode byte-for-byte."""
    corpus = sorted(glob.glob("/root/reference/**/*.pdf", recursive=True))
    checked = 0
    for path in corpus:
        if checked >= 3:
            break
        with open(path, "rb") as fh:
            data = fh.read()
        for img in pdfbin.extract_images(data):
            if checked >= 3:
                break
            raw = img.get("image")
            if not raw or img.get("fmt") != "png":
                continue
            decoded = imaging.png_decode(bytes(raw))
            if decoded is None:
                continue
            w, h, ch, px = decoded
            if ch not in (1, 3) or w * h < 64 or w * h > 40000:
                continue
            base = imaging.jpeg_decode(
                imaging.jpeg_encode_baseline(w, h, ch, px)
            )
            prog = imaging.jpeg_decode(
                imaging.jpeg_encode_progressive(w, h, ch, px)
            )
            assert base is not None and prog is not None
            assert base[3] == prog[3]
            checked += 1
    assert checked == 3


def test_jpeg_parse_reads_progressive_dims():
    prog = imaging.jpeg_encode_progressive(24, 17, 3, _test_image(24, 17, 3))
    meta = imaging.jpeg_parse(prog)
    assert meta == {
        "width": 24,
        "height": 17,
        "bit_depth": 8,
        "channels": 3,
        "format": "jpeg",
    }
