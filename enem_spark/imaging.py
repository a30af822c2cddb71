"""Raster kernels for the image extraction path (S3) — pure stdlib + numpy.

The reference's image pipeline (enem_pdf_extractor.py:306-331) is:
``extract_image(xref)`` -> ``fitz.Pixmap(image_bytes)`` -> strip the alpha
channel if present (:315-321) -> convert CMYK (n==4) to RGB (:323-326) ->
``pix.save(...png)`` (:328-329).  The sandbox has no fitz/PIL, so this
module reimplements the raster half from scratch on stdlib ``zlib`` +
``struct`` + numpy:

* :func:`png_encode` — a real PNG writer (IHDR/IDAT/IEND, filter-0 rows,
  zlib, CRC32): the ``pix.save`` analogue.
* :func:`strip_alpha` / :func:`cmyk_to_rgb` — the two Pixmap conversions.
  fitz delegates CMYK to MuPDF's color engine; ours is the standard naive
  ``(1-C)(1-K)`` formula — deterministic and documented, since the golden
  contract covers image NAMES/dims, never PNG bytes.
* :func:`unpredict` — PNG/TIFF predictor removal for FlateDecode sample
  streams (/DecodeParms /Predictor).
* :func:`expand_bits_gray` / :func:`expand_indexed` — 1/2/4-bit and
  palette images to 8-bit samples.
* :func:`png_parse` / :func:`jpeg_parse` — header-only metadata reads
  (width/height/channels/bit depth) for media featurization: real fields
  without a pixel decoder.

Every function is pure bytes-in/bytes-out so the kernels run identically
inside pandas UDFs, the pure-Python expected staging, and unit tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --- PNG writing -------------------------------------------------------------

_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(
    width: int, height: int, samples: bytes, channels: int
) -> bytes:
    """8-bit samples (row-major, interleaved channels) -> a valid PNG.

    Rows get filter type 0 (None); short sample buffers are zero-padded
    and long ones truncated (defensive — a malformed PDF image must yield
    a structurally valid PNG, not a crash)."""
    if width <= 0 or height <= 0:
        raise ValueError("png_encode: empty image")
    if channels not in _COLOR_TYPE:
        raise ValueError(f"png_encode: unsupported channel count {channels}")
    stride = width * channels
    need = stride * height
    buf = samples[:need]
    if len(buf) < need:
        buf = buf + b"\x00" * (need - len(buf))
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(height, stride)
    rows = np.zeros((height, stride + 1), dtype=np.uint8)
    rows[:, 1:] = arr
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(rows.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


# --- header parses (real metadata without a pixel decoder) -------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_parse(data: bytes) -> dict | None:
    """IHDR fields of a PNG, or None if not a PNG."""
    if len(data) < 33 or not data.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    if data[12:16] != b"IHDR":
        return None
    w, h, depth, color_type = struct.unpack(">IIBB", data[16:26])
    return {
        "width": int(w),
        "height": int(h),
        "bit_depth": int(depth),
        "color_type": int(color_type),
        "channels": _PNG_CHANNELS.get(color_type, 0),
        "format": "png",
    }


def jpeg_parse(data: bytes) -> dict | None:
    """Width/height/channels from the first JPEG SOF marker, or None."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 2 + seglen > n or seglen < 8:
                return None
            depth, h, w, comps = struct.unpack(
                ">BHHB", data[i + 4 : i + 10]
            )
            return {
                "width": int(w),
                "height": int(h),
                "bit_depth": int(depth),
                "channels": int(comps),
                "format": "jpeg",
            }
        i += 2 + seglen
    return None


# --- Pixmap-equivalent conversions ------------------------------------------


def strip_alpha(samples: bytes, channels: int) -> bytes:
    """Drop the trailing alpha channel (fitz ``Pixmap(pix, 0)``,
    reference :315-321). ``channels`` INCLUDES the alpha."""
    if channels < 2:
        raise ValueError("strip_alpha: no alpha channel to strip")
    arr = np.frombuffer(samples, dtype=np.uint8)
    n = (len(arr) // channels) * channels
    return arr[:n].reshape(-1, channels)[:, : channels - 1].tobytes()


def cmyk_to_rgb(samples: bytes) -> bytes:
    """Interleaved 8-bit CMYK -> RGB (fitz ``Pixmap(fitz.csRGB, pix)``,
    reference :323-326; formula is the standard naive conversion
    R=(255-C)(255-K)/255 — deterministic, not color-managed)."""
    arr = np.frombuffer(samples, dtype=np.uint8)
    n = (len(arr) // 4) * 4
    cmyk = arr[:n].reshape(-1, 4).astype(np.uint16)
    inv_k = 255 - cmyk[:, 3]
    rgb = ((255 - cmyk[:, :3]) * inv_k[:, None]) // 255
    return rgb.astype(np.uint8).tobytes()


def expand_bits_gray(
    samples: bytes, width: int, height: int, bpc: int, invert: bool = False
) -> bytes:
    """1/2/4-bit-per-component gray (or image mask) -> 8-bit gray.
    Rows are byte-aligned per the PDF spec (§7.4, stride rounds up)."""
    if bpc == 8:
        return samples
    if bpc not in (1, 2, 4):
        raise ValueError(f"expand_bits_gray: unsupported bpc {bpc}")
    stride = (width * bpc + 7) // 8
    need = stride * height
    buf = samples[:need]
    if len(buf) < need:
        buf = buf + b"\x00" * (need - len(buf))
    rows = np.frombuffer(buf, dtype=np.uint8).reshape(height, stride)
    bits = np.unpackbits(rows, axis=1)
    per = 8 // bpc
    vals = bits.reshape(height, stride * per, bpc)
    weights = (1 << np.arange(bpc - 1, -1, -1)).astype(np.uint16)
    lvl = (vals.astype(np.uint16) * weights).sum(axis=2)[:, :width]
    scale = 255 // ((1 << bpc) - 1)
    out = (lvl * scale).astype(np.uint8)
    if invert:
        out = 255 - out
    return out.tobytes()


def expand_indexed(
    samples: bytes, palette: bytes, base_channels: int, hival: int
) -> bytes:
    """Palette-indexed 8-bit samples -> interleaved base-colorspace
    samples. Out-of-range indices clamp to ``hival`` (PDF §8.6.6.3)."""
    pal = np.frombuffer(palette, dtype=np.uint8)
    need = (hival + 1) * base_channels
    if len(pal) < need:
        pal = np.concatenate([pal, np.zeros(need - len(pal), dtype=np.uint8)])
    pal = pal[:need].reshape(hival + 1, base_channels)
    idx = np.minimum(
        np.frombuffer(samples, dtype=np.uint8).astype(np.intp), hival
    )
    return pal[idx].reshape(-1).tobytes()


# --- predictor removal (FlateDecode /DecodeParms) ---------------------------


def unpredict(
    data: bytes, predictor: int, colors: int, bpc: int, columns: int
) -> bytes:
    """Undo the /Predictor pre-filter on decompressed sample data.

    predictor 1 = none, 2 = TIFF horizontal differencing, >=10 = PNG
    filters (each row carries a filter-type byte). Only 8-bit components
    are supported for TIFF/PNG paths (every predictor stream in scope is
    8-bit; others raise)."""
    if predictor <= 1:
        return data
    if bpc != 8:
        raise ValueError(f"unpredict: unsupported bpc {bpc} with predictor")
    stride = colors * columns
    if predictor == 2:
        arr = np.frombuffer(data, dtype=np.uint8).copy()
        n_rows = len(arr) // stride
        rows = arr[: n_rows * stride].reshape(n_rows, columns, colors)
        np.cumsum(rows, axis=1, dtype=np.uint8, out=rows)
        return rows.tobytes()
    # PNG predictors: rows of (filter_byte + stride samples)
    row_len = stride + 1
    n_rows = len(data) // row_len
    raw = np.frombuffer(data[: n_rows * row_len], dtype=np.uint8).reshape(
        n_rows, row_len
    )
    out = np.zeros((n_rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    fpp = colors  # bytes per pixel at 8 bpc
    for r in range(n_rows):
        ft = int(raw[r, 0])
        cur = raw[r, 1:].astype(np.intp)
        if ft == 0:
            rec = cur
        elif ft == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:
            rec = np.zeros(stride, dtype=np.intp)
            for i in range(stride):
                a = rec[i - fpp] if i >= fpp else 0
                b = prev[i]
                if ft == 1:  # Sub
                    rec[i] = (cur[i] + a) & 0xFF
                elif ft == 3:  # Average
                    rec[i] = (cur[i] + (a + b) // 2) & 0xFF
                elif ft == 4:  # Paeth
                    c = prev[i - fpp] if i >= fpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else c
                    rec[i] = (cur[i] + pred) & 0xFF
                else:
                    raise ValueError(f"unpredict: bad PNG filter {ft}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out.tobytes()


# --- baseline JPEG pixel decode ---------------------------------------------
#
# The reference converts EVERY extracted image to PNG via fitz.Pixmap —
# including DCTDecode streams (enem_pdf_extractor.py:312,329). A JPEG
# passthrough covers the metadata contract but not the pixel one, so this
# is a from-scratch baseline (SOF0) sequential-Huffman decoder on stdlib +
# numpy: segment walk, canonical Huffman tables, byte-stuffed bit reader
# with restart markers, dequant + zigzag + separable IDCT, chroma
# upsampling, JFIF YCbCr->RGB. Every DCTDecode stream in the shipped
# reference corpus is SOF0; progressive/arithmetic streams return None and
# the caller keeps the passthrough.

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.intp,
)


def _idct_basis() -> np.ndarray:
    """8x8 DCT-III basis A with A[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
    spatial = A.T @ coefs @ A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = (c / 2.0) * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_IDCT_A = _idct_basis()


class _HuffTable:
    """Canonical JPEG Huffman table: (code length, code) -> symbol."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data: 0xFF00 byte
    stuffing unstuffed, restart markers surfaced via `marker`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:  # restart / EOI marker: stop until acknowledged
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # spec: pad past marker with zero bits
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def restart(self) -> None:
        """Acknowledge an RSTn marker: byte-align and consume it."""
        self.bits = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.read_bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes):
    """Baseline (SOF0) JPEG -> (width, height, channels, 8-bit samples),
    or None when the stream is not decodable here (progressive SOF2,
    arithmetic coding, 4-component Adobe, malformed)."""
    try:
        return _jpeg_decode(data)
    except Exception:
        return None


def _jpeg_decode(data: bytes):
    if data[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    dri = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            return None  # EOI before SOS
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seglen]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:  # 16-bit table
                    tbl = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    ).astype(np.int32)
                    j += 128
                else:
                    tbl = np.frombuffer(
                        seg[j : j + 64], dtype=np.uint8
                    ).astype(np.int32)
                    j += 64
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1 : j + 17]
                nsym = sum(counts)
                symbols = seg[j + 17 : j + 17 + nsym]
                huff[(tc, th)] = _HuffTable(counts, symbols)
                j += 17 + nsym
        elif m == 0xC0:  # SOF0 baseline
            prec, h_img, w_img, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or ncomp not in (1, 3):
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq_id}
                )
            sof = (w_img, h_img, comps)
        elif 0xC1 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return None  # progressive/extended/arithmetic: not baseline
        elif m == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS — entropy data follows
            if sof is None:
                return None
            w_img, h_img, comps = sof
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tt >> 4, tt & 15)
            return _jpeg_scan(
                data, i + 2 + seglen, w_img, h_img, comps, scan, qt, huff,
                dri,
            )
        i += 2 + seglen
    return None


def _jpeg_scan(data, pos, w_img, h_img, comps, scan, qt, huff, dri):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h_img + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                r.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_t, ac_t = huff[(0, td)], huff[(1, ta)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.float64)
                        s = r.decode_huff(dc_t)
                        pred[ci] += _receive_extend(r, s)
                        coefs[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = r.decode_huff(ac_t)
                            rr, s = rs >> 4, rs & 15
                            if rs == 0:
                                break  # EOB
                            if s == 0:
                                if rr != 15:
                                    break
                                k += 16
                                continue
                            k += rr
                            if k > 63:
                                break
                            coefs[k] = _receive_extend(r, s) * q[k]
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coefs
                        spatial = (
                            _IDCT_A.T @ block.reshape(8, 8) @ _IDCT_A
                        ) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            n_mcu += 1
    # upsample subsampled planes to full resolution, crop to image size
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h_img, :w_img])
    if len(full) == 1:
        out = np.clip(full[0], 0, 255).astype(np.uint8)
        return w_img, h_img, 1, out.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    out = np.clip(rgb, 0, 255).astype(np.uint8)
    return w_img, h_img, 3, out.tobytes()
