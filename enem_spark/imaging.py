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
