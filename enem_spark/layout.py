"""Two-column layout reconstruction from bounding-box spans.

The reference delegates reading-order reconstruction to PyMuPDF's
``page.get_text()`` (enem_pdf_extractor.py:235,276). Our pages carry the raw
layout as ``html``: UTF-8 JSON of spans ``[{"text","x0","y0","x1","y1"}]``.
The reconstruction rule (SURVEY.md §7, deliberately simple + deterministic):

    1. drop image-marker spans (``⟦IMG⟧``), counting them;
    2. cluster spans into columns by x-midpoint vs the page midline;
    3. sort by (column, y0, x0);
    4. join span texts with newlines.

This is a pure function so it can run inside the page pandas UDF (no extra
Arrow crossing) and be unit-tested without Spark.
"""

from __future__ import annotations

import json
import math

IMG_MARKER = "⟦IMG⟧"
PAGE_WIDTH = 612.0
MIDLINE = PAGE_WIDTH / 2.0


def count_image_spans(html: bytes | bytearray | None) -> int:
    """Image-span count: a raw byte scan screens marker-free pages (the
    overwhelming majority) for free; marker-bearing pages pay the exact
    parsed count. The byte count alone disagreed with the parsed paths on
    corrupt payloads (invalid JSON containing the marker bytes counted
    >0 while image_spans/reconstruct_page degraded to zero), producing
    dangling image_refs and a has_images flag that depended on which code
    path looked."""
    if html is None:
        return 0
    raw = bytes(html)
    # the screen must also pass JSON-ESCAPED markers (ensure_ascii=True
    # producers emit \u27e6IMG\u27e7): a byte screen blind to the escape
    # form disagreed with the parsed paths on such payloads — has_images
    # False here while reconstruct_page counted 1 (dangling image_refs,
    # the exact divergence this function exists to prevent)
    if (
        raw.count(IMG_MARKER.encode("utf-8")) == 0
        and rb"\u27e6" not in raw.lower()
    ):
        return 0
    return sum(1 for s in _parse_spans(html) if s["text"] == IMG_MARKER)


def deterministic_pixels(seed: bytes, n: int) -> bytes:
    """n deterministic pseudo-pixel bytes from an md5 counter stream."""
    import hashlib

    out = bytearray()
    ctr = 0
    while len(out) < n:
        out += hashlib.md5(seed + str(ctr).encode()).digest()
        ctr += 1
    return bytes(out[:n])


# per-PAGE pixel budget for the stand-in decode: the per-span 4096 clamp
# bounds one allocation, but hundreds of marker spans each claiming
# 4096x4096 would still materialize tens of GB in one task — spans past
# the budget degrade to 1x1 (ref mapping stays 1:1 with the text path's
# image_refs; only the corrupt page's pixel content degrades)
PAGE_PIXEL_BUDGET = 4096 * 4096


def decode_image_span(span: dict, ref: str, max_pixels: int | None = None) -> dict:
    """The reference's xref->PNG pipeline (enem_pdf_extractor.py:306-331:
    extract_image(xref) -> Pixmap -> strip alpha if present -> CMYK(n==4)
    to RGB -> save PNG) with REAL raster math (enem_spark.imaging —
    actual alpha-channel drop, actual CMYK->RGB arithmetic, actual PNG
    encoding with zlib+CRC) in the reference's exact branch order.

    The synthetic span corpus carries no embedded pixel data (real PDFs
    go through pdfbin.extract_images, which feeds the same kernels real
    samples), so the SOURCE pixels here are a deterministic md5 stream
    seeded by the span payload, with the alpha/CMYK branch selectors
    derived from the same digest — every byte downstream of the source
    pixels is produced by the production kernels."""
    import hashlib

    from . import imaging

    payload = json.dumps(span, sort_keys=True).encode("utf-8")
    digest = hashlib.md5(payload).digest()
    has_alpha = bool(digest[0] & 1)  # ref: `if pix.alpha`
    was_cmyk = bool(digest[1] & 1)  # ref: `if pix.n == 4` (CMYK)
    # clamp to a sane page-scale bound: span coordinates are untrusted
    # payload data, and one corrupt x1=1e9 would make the deterministic
    # pixel stream try to materialize gigabytes inside the UDF
    def _dim(a: str, b: str) -> int:
        d = abs(span.get(b, 0.0) - span.get(a, 0.0))
        # non-finite deltas (inf coords pass json.loads; inf-inf is NaN)
        # would raise on int() — degrade to the 1px floor instead of
        # killing the task (_ok also rejects them upstream; this is the
        # direct-call guard)
        if d != d or d == float("inf"):
            return 1
        return min(4096, max(1, int(d)))

    w = _dim("x0", "x1")
    h = _dim("y0", "y1")
    if max_pixels is not None and w * h > max_pixels:
        w = h = 1
    channels = 4 if was_cmyk else 3
    src = channels + (1 if has_alpha else 0)
    img = deterministic_pixels(payload, w * h * src)
    if has_alpha:
        img = imaging.strip_alpha(img, src)  # ref:314-321 Pixmap(pix, 0)
    if was_cmyk:
        img = imaging.cmyk_to_rgb(img)  # ref:323-326 Pixmap(fitz.csRGB, pix)
    return {
        "image_ref": ref,
        "png": imaging.png_encode(w, h, img, 3),  # ref:328-329 pix.save
        "width": w,
        "height": h,
        "had_alpha": has_alpha,
        "was_cmyk": was_cmyk,
    }


def image_spans(html: bytes | bytearray | None, url: str) -> list[dict]:
    """All image spans of a page, decoded via the stand-in pipeline.
    ``image_ref`` matches the text path's ``image_refs`` naming exactly
    (url#imgK, K in span order) so the two tables join."""
    if html is None:
        return []
    spans = _parse_spans(html)
    out = []
    k = 0
    budget = PAGE_PIXEL_BUDGET
    for s in spans:
        if s["text"] == IMG_MARKER:
            rec = decode_image_span(s, f"{url}#img{k}", max_pixels=budget)
            budget -= rec["width"] * rec["height"]
            out.append(rec)
            k += 1
    return out


def _parse_spans(html: bytes | bytearray) -> list[dict]:
    """Span payload decode for the page UDF — lenient, never raising: the
    charset invariant (one bad page must not kill a job) applies inside
    ArrowEvalPython too, where an exception aborts the whole extraction.
    Invalid UTF-8 decodes with U+FFFD; a payload that is not the span-JSON
    contract degrades to zero spans, so the page flows through as empty
    (same downstream behavior as the F4 image-page skip) instead of
    crashing the stage."""
    try:
        spans = json.loads(bytes(html).decode("utf-8", "replace"))
    except (ValueError, RecursionError):
        # RecursionError: deeply-nested valid JSON (b'['*3000...) blows
        # the parser's stack — a RuntimeError subclass the bare
        # ValueError catch let through to kill the stage
        return []
    if not isinstance(spans, list):
        return []

    def _ok(s) -> bool:
        # VALUE types too, not just key presence: a span with text=null,
        # a string coordinate, or a mixed-type seq would raise TypeError
        # deep inside the UDF's join/sort/arithmetic — the exact
        # job-killing leniency gap this function exists to close. NaN
        # coordinates (json.loads accepts bare NaN) are rejected with the
        # x != x test: they poison midpoint comparisons and the image
        # dimension math.
        if not (isinstance(s, dict) and isinstance(s.get("text"), str)):
            return False
        for k in ("x0", "y0", "x1", "y1", "seq"):
            if k in s:
                v = s[k]
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    return False
                if isinstance(v, float) and not math.isfinite(v):
                    # NaN poisons comparisons; +-inf overflows the image
                    # dimension int() — both are valid strict/lenient
                    # JSON values, both job-killing downstream
                    return False
        return True

    return [s for s in spans if _ok(s)]


def reconstruct_page(html: bytes | bytearray | None) -> tuple[str, int]:
    """(reading-order text, number of image spans) from the span payload."""
    if html is None:
        return "", 0
    spans = _parse_spans(html)
    # Document-order mode: spans carrying a "seq" field (the real-PDF
    # decoder, pdfbin.py) are already in reading order — PDF content
    # streams emit one text frame (column) at a time, which is exactly
    # the order PyMuPDF's get_text() gave the reference
    # (enem_pdf_extractor.py:235,276: fitz blocks are emission-ordered,
    # not geometrically re-sorted). Geometric re-clustering of such
    # pages is strictly worse: an in-column table fills the x histogram
    # and defeats any column-split heuristic. Spans without "seq" (the
    # synthetic corpus, which shuffles spans precisely to exercise this
    # path) reconstruct by column clustering as before.
    if spans and all("seq" in s for s in spans):
        ordered = sorted(spans, key=lambda s: s["seq"])
        n_images = sum(1 for s in ordered if s["text"] == IMG_MARKER)
        return (
            "\n".join(s["text"] for s in ordered if s["text"] != IMG_MARKER),
            n_images,
        )
    n_images = 0
    keep = []
    for s in spans:
        if s["text"] == IMG_MARKER:
            n_images += 1
            continue
        # .get with defaults: a corrupt span missing coordinates must
        # degrade (sorts first), not KeyError inside the UDF
        x0, x1, y0 = s.get("x0", 0.0), s.get("x1", 0.0), s.get("y0", 0.0)
        mid = (x0 + x1) / 2.0
        col = 0 if mid < MIDLINE else 1
        keep.append((col, y0, x0, s["text"]))
    keep.sort(key=lambda t: (t[0], t[1], t[2]))
    return "\n".join(t[3] for t in keep), n_images
