"""Binary-PDF source: real PDF files -> the engine's pages table (S1).

The reference's entry point is a pair of PDF paths opened with fitz
(enem_pdf_extractor.py:940-969); this source is the distributed analogue:
``spark.read.format("binaryFile")`` over a directory of exam PDFs, then ONE
Arrow ``mapInPandas`` crossing that runs the stdlib decoder
(enem_spark.pdfbin) per document and explodes it to per-page rows in the
exact pages-table shape the whole engine consumes — url carrying the INEP
filename contract (with_url_metadata parses year/day/kind/color from it,
F1 quarantine applies to non-conforming names), ``html`` carrying the
span-JSON payload (with "seq": document-order mode in layout.py).

Scale shape: no shuffle — scan + flatMap. One PDF is one Arrow batch row
until the page explode inside the UDF, after which pages repartition
freely downstream (AQE rebalance; the numbering window auto-salts). A
corrupt PDF yields zero pages instead of failing the stage (the decoder
swallows structural errors per the one-bad-document invariant); pages
whose FILENAME breaks the contract still flow to quarantine, which is the
reference's IOError path (:81-100) as data, not as a crash.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..pdfbin import pdf_to_pages
from .documents_bridge import PAGES_SCHEMA


def pdf_pages_frame(spark: SparkSession, path: str) -> DataFrame:
    """All ``*.pdf`` under ``path`` (recursively) as a pages DataFrame.

    url = ``file://<abspath>/page/<idx>`` — the PDF stem carries the INEP
    naming contract exactly as the reference's filename checks expect;
    page 0 is the cover (F2 drops it downstream); ``warc_ts`` is the
    file's modification time (the crawl-fetch stand-in).
    """
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "modificationTime", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for path_, mtime, content in pdf_batch.itertuples(index=False):
                stem = path_[: -len(".pdf")] if path_.endswith(".pdf") else path_
                for idx, (payload, text) in enumerate(
                    pdf_to_pages(bytes(content))
                ):
                    rows.append(
                        {
                            "url": f"{stem}/page/{idx}",
                            "warc_ts": mtime,
                            "html": payload,
                            # the pages contract's pre-extracted text field
                            # (build_answer_keys reads it for GB pages) —
                            # derived in the same decode pass, equal to
                            # reconstruct_page(payload)[0] by construction
                            "text": text,
                            "lang": "pt",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGES_SCHEMA.fields]
            )

    return binary.mapInPandas(decode, PAGES_SCHEMA)


def reference_pdf_dir() -> str | None:
    """The reference repo's shipped exam PDFs, when present (tests only)."""
    d = "/root/reference/pdfs_enem"
    return d if os.path.isdir(d) else None


IMAGES_SCHEMA = (
    "url string, page_idx int, img_index int, width int, height int, "
    "fmt string, codec string, channels int, had_alpha boolean, "
    "was_cmyk boolean, n_png_bytes long, png_md5 string"
)


def pdf_images_frame(spark: SparkSession, path: str) -> DataFrame:
    """All page-referenced images of every ``*.pdf`` under ``path`` as a
    table — the distributed analogue of the reference's images output dir
    (enem_pdf_extractor.py:306-331: one PNG file per (page, index)).

    Same scale shape as pdf_pages_frame: binaryFile scan -> ONE Arrow
    mapInPandas crossing running pdfbin.extract_images + the imaging
    kernels per document, exploding to per-image rows. No shuffle; a
    corrupt PDF yields zero rows (extract_images swallows structural
    errors) and a bad individual image degrades to fmt='error' instead of
    failing the task. Pixel bytes are hashed rather than carried so the
    frame stays narrow; a sink that wants the PNGs re-runs the same
    kernels inside its own writer (deterministic bytes)."""
    import hashlib

    from ..pdfbin import extract_images

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "url", "page_idx", "img_index", "width", "height", "fmt",
            "codec", "channels", "had_alpha", "was_cmyk", "n_png_bytes",
            "png_md5",
        ]
        for pdf_batch in batches:
            rows = []
            for path_, content in pdf_batch.itertuples(index=False):
                stem = path_[: -len(".pdf")] if path_.endswith(".pdf") else path_
                for rec in extract_images(bytes(content)):
                    rows.append(
                        {
                            "url": stem,
                            "page_idx": rec["page_idx"],
                            "img_index": rec["img_index"],
                            "width": rec["width"],
                            "height": rec["height"],
                            "fmt": rec["fmt"],
                            "codec": rec["codec"],
                            "channels": rec["channels"],
                            "had_alpha": rec["had_alpha"],
                            "was_cmyk": rec["was_cmyk"],
                            "n_png_bytes": len(rec["image"]),
                            "png_md5": hashlib.md5(rec["image"]).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return binary.mapInPandas(decode, IMAGES_SCHEMA)
