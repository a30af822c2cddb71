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

IMG_MARKER = "⟦IMG⟧"
PAGE_WIDTH = 612.0
MIDLINE = PAGE_WIDTH / 2.0


def count_image_spans(html: bytes | bytearray | None) -> int:
    """Image-span count without reconstruction: a raw byte scan for the
    marker. Exact because the marker glyphs are a synthetic sentinel that
    appears in the span payload only as an image span's text."""
    if html is None:
        return 0
    return bytes(html).count(IMG_MARKER.encode("utf-8"))


def reconstruct_page(html: bytes | bytearray | None) -> tuple[str, int]:
    """(reading-order text, number of image spans) from the span payload."""
    if html is None:
        return "", 0
    spans = json.loads(bytes(html).decode("utf-8"))
    n_images = 0
    keep = []
    for s in spans:
        if s["text"] == IMG_MARKER:
            n_images += 1
            continue
        mid = (s["x0"] + s["x1"]) / 2.0
        col = 0 if mid < MIDLINE else 1
        keep.append((col, s["y0"], s["x0"], s["text"]))
    keep.sort(key=lambda t: (t[0], t[1], t[2]))
    return "\n".join(t[3] for t in keep), n_images
