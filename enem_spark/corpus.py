"""Deterministic synthetic corpus of Common-Crawl-style exam pages.

Generates the `pages` table per BASELINE.json ``input_hint``:

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

One row = one page of one document. A document is an ENEM-style exam (kind
``PV``) or an answer key (kind ``GB``), with INEP-convention metadata encoded
in the url (``cc://enem/{year}_{PV|GB}_impresso_D{d}_CD{c}/page/{idx}`` —
mirrors the filename contract at enem_pdf_extractor.py:40-50).

``html`` is UTF-8 JSON of layout spans ``[{"text","x0","y0","x1","y1"}]`` in a
two-column layout, span order shuffled, so the engine's bbox-clustering
reading-order reconstruction is actually exercised; ``text`` is the
ground-truth reading-order text the reconstruction must reproduce byte-
identically. Image presence is flagged with a ``⟦IMG⟧`` marker span.

Everything is seeded — no wall clock, no external data. Page-content cases
generated (FIXTURES.md §1): cover page, essay page (no marker), normal
doubled-letter pages, 2020 single-letter pages, lowercase ``Questão`` pages,
image pages, image-alternative questions (dropped with numbering gap),
mojibake pages, missing answer-key entries, and an optional skew document.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from .layout import IMG_MARKER, MIDLINE  # one convention, one definition
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

WORDS = (
    "o processo de formação cultural do território brasileiro envolve dinâmicas "
    "sociais históricas que transformam o espaço urbano e rural em diferentes "
    "escalas regionais segundo autores contemporâneos da geografia crítica"
).split()

ALT_WORDS = (
    "recuperação estímulo reforço resgate crítica valorização negação expansão "
    "transformação permanência ruptura continuidade"
).split()


@dataclass(frozen=True)
class CorpusConfig:
    seed: int = 42
    n_exams: int = 8
    pages_per_exam: int = 10
    questions_per_page: int = 3
    years: tuple[int, ...] = (2020, 2021, 2022, 2023)
    skew_doc_pages: int = 0  # >0 adds one huge document with this many pages
    lang_noise_docs: int = 1  # non-"pt" documents that must be filtered out


@dataclass
class ExamDoc:
    """Materialized document: rows for Spark plus oracle-ready inputs."""

    url_prefix: str
    year: int
    day: str
    color: str
    kind: str  # PV | GB
    page_texts: list[str] = field(default_factory=list)
    page_has_images: list[bool] = field(default_factory=list)
    lang: str = "pt"

    @property
    def day_one(self) -> bool:
        return self.day == "D1"


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _mojibake(rng: random.Random) -> str:
    return "�" * rng.randint(3, 9)


def _question_text(
    rng: random.Random,
    printed_num: int,
    style: str,
) -> str:
    """One raw question segment, starting at its marker.

    style: 'doubled'   — "A\\nA body" alternatives (enem_pdf_extractor.py:111)
           'single'    — "A␣␣body" 2020 format (:113)
           'image_alt' — empty alternative body => dropped by the parser (:138)
           'mojibake'  — doubled with U+FFFD runs in the body
           'lowercase' — marker spelled "Questão" (normalized at :236)
    """
    marker = "Questão" if style == "lowercase" else "QUESTÃO"
    body = _sentence(rng, rng.randint(8, 20))
    if style == "mojibake":
        body = f"{body} {_mojibake(rng)} {_sentence(rng, 4)}"
    lines = [f"{marker} {printed_num} ", body + "?"]
    if style == "image_alt":
        # five doubled letters but one empty body -> NON_STANDARD sentinel
        for letter in "ABCD":
            lines.append(f"{letter}\n{letter}{rng.choice(ALT_WORDS)} do conceito.")
        lines.append("E\nE")  # empty body, next match is end-of-string
        return "\n".join(lines) + "\n"
    for letter in "ABCDE":
        alt = f"{rng.choice(ALT_WORDS)} {rng.choice(ALT_WORDS)} na sociedade."
        if style == "single":
            lines.append(f"{letter}  {alt}")
        else:
            lines.append(f"{letter}\n{letter}{alt}")
    return "\n".join(lines) + "\n"


def _page_text(
    rng: random.Random,
    first_printed: int,
    n_questions: int,
    year: int,
    style: str,
    barcode: bool = True,
) -> str:
    parts = [f"ENEM {year} CADERNO AMARELO\n"]
    for k in range(n_questions):
        qstyle = style
        if style == "mixed":
            qstyle = rng.choice(["doubled", "doubled", "mojibake", "lowercase"])
        parts.append(_question_text(rng, first_printed + k, qstyle))
        if barcode and k == 0:
            # mid-page barcode artifact, stripped at enem_pdf_extractor.py:244-245
            code = "".join(rng.choice("ABCDEFGHIJ0123456789") for _ in range(9))
            parts.append(f"*{code}*\n")
    return "".join(parts)


def _essay_page(rng: random.Random, year: int) -> str:
    return f"ENEM {year} PROPOSTA DE REDACAO\n{_sentence(rng, 30)}.\n"


def build_exam(
    rng: random.Random,
    year: int,
    day: str,
    color: str,
    n_pages: int,
    questions_per_page: int,
    lang: str = "pt",
    uniq: str = "",
) -> ExamDoc:
    doc = ExamDoc(
        url_prefix=f"cc://enem/{year}_PV_impresso_{day}_CD{color}{uniq}",
        year=year,
        day=day,
        color=color,
        kind="PV",
        lang=lang,
    )
    doc.page_texts.append(f"CAPA ENEM {year} {day} (cover, no marker)")
    doc.page_has_images.append(False)
    printed = 1
    # deterministic per-page style schedule with all cases represented
    for p in range(1, n_pages):
        roll = rng.random()
        if roll < 0.08:
            doc.page_texts.append(_essay_page(rng, year))
            doc.page_has_images.append(False)
            continue
        has_images = roll > 0.80
        if year == 2020:
            style = "single"
        elif year == 2021:
            style = "mixed"
        else:
            style = "doubled"
        nq = questions_per_page
        text = _page_text(rng, printed, nq, year, style)
        if 0.08 <= roll < 0.16:
            # image-alternative question: emitted pages get a dropped question
            text += _question_text(rng, printed + nq, "image_alt")
            nq += 1
        doc.page_texts.append(text)
        doc.page_has_images.append(has_images)
        printed += nq
    return doc


def build_answer_key(
    rng: random.Random, year: int, day: str, color: str
) -> tuple[ExamDoc, str]:
    """GB document whose page-0 text satisfies the reference's line filter +
    positional probe (enem_pdf_extractor.py:189-226, 951-952). A few keys are
    deliberately missing to exercise the 'não achou a questão' path."""
    lines = [
        f"GABARITO OFICIAL ENEM {year} {day} LINHA DE RUIDO",
        "APLICACAO IMPRESSA RUIDO LONGO",
    ]
    missing = {rng.randint(11, 40), rng.randint(41, 80)}
    if day == "D1":
        for k in range(1, 91):
            if k in missing:
                continue
            lines.append(str(k))
            lines.append(rng.choice("ABCDE"))  # EN (or the single answer)
            if k <= 5:
                lines.append(rng.choice("ABCDE"))  # ES variant row
    else:
        for k in range(91, 182):  # D2 probes keys up to 91+90=181 inclusive
            if (k - 90) in missing:
                continue
            lines.append(str(k))
            lines.append(rng.choice("ABCDE"))
    raw = "\n".join(lines) + "\n"
    doc = ExamDoc(
        url_prefix=f"cc://enem/{year}_GB_impresso_{day}_CD{color}",
        year=year,
        day=day,
        color=color,
        kind="GB",
        page_texts=[raw],
        page_has_images=[False],
    )
    return doc, raw


def _spans_for_page(rng: random.Random, text: str, has_images: bool) -> list[dict]:
    """Two-column layout spans whose clustering-reconstruction yields ``text``.

    Lines are split at the page midline into left/right columns with
    increasing y; span order is shuffled so reconstruction must re-sort."""
    lines = text.split("\n")
    half = (len(lines) + 1) // 2
    spans = []
    # derive column geometry from the ONE midline definition so a layout
    # constant change moves the corpus with it: left column starts at
    # MIDLINE-266 (=40), right at MIDLINE+24 (=330); width 240 keeps both
    # columns' midpoints strictly on their own side of MIDLINE
    left_x0, right_x0, span_w = MIDLINE - 266.0, MIDLINE + 24.0, 240.0
    for i, line in enumerate(lines):
        col = 0 if i < half else 1
        x0 = left_x0 if col == 0 else right_x0
        y0 = 40.0 + 12.0 * (i if col == 0 else i - half)
        spans.append(
            {"text": line, "x0": x0, "y0": y0, "x1": x0 + span_w, "y1": y0 + 10.0}
        )
    if has_images:
        spans.append(
            {"text": IMG_MARKER, "x0": 100.0, "y0": 400.0, "x1": 200.0, "y1": 500.0}
        )
    rng.shuffle(spans)
    return spans


def generate(cfg: CorpusConfig) -> list[ExamDoc]:
    """All documents (PV + GB pairs, optional skew + noise docs), deterministic."""
    rng = random.Random(cfg.seed)
    docs: list[ExamDoc] = []
    seen_gb: set[tuple[int, str, str]] = set()
    for i in range(cfg.n_exams):
        year = cfg.years[i % len(cfg.years)]
        day = "D1" if (i // len(cfg.years)) % 2 == 0 else "D2"
        # like the real INEP corpus, D2 booklets never use color 1: the
        # reference's day dispatch is `"D1" in path` (enem_pdf_extractor.py:969)
        # and a D2_CD1 name would false-match via "CD1"
        color = str(1 + i % 4) if day == "D1" else str(5 + i % 4)
        # the (year, day, color) tuple cycles every 8 exams; the -x{i}
        # suffix keeps urls and doc_ids distinct at any n_exams (several
        # booklets can legitimately share one answer key)
        docs.append(
            build_exam(
                rng, year, day, color, cfg.pages_per_exam,
                cfg.questions_per_page, uniq=f"-x{i}",
            )
        )
        if (year, day, color) not in seen_gb:
            seen_gb.add((year, day, color))
            docs.append(build_answer_key(rng, year, day, color)[0])
    if cfg.skew_doc_pages > 0:
        docs.append(
            build_exam(rng, 2019, "D1", "9", cfg.skew_doc_pages, cfg.questions_per_page)
        )
        docs.append(build_answer_key(rng, 2019, "D1", "9")[0])
    for j in range(cfg.lang_noise_docs):
        noise = build_exam(rng, 2018, "D2", "8", 3, 2, lang="en")
        noise.url_prefix += f"-noise{j}"
        docs.append(noise)
    return docs


def to_rows(docs: list[ExamDoc], seed: int = 42) -> list[dict]:
    """Flatten documents into `pages` rows (one per page)."""
    rng = random.Random(seed ^ 0x5EED)
    rows = []
    for d_idx, doc in enumerate(docs):
        for p_idx, (text, has_img) in enumerate(
            zip(doc.page_texts, doc.page_has_images)
        ):
            spans = _spans_for_page(rng, text, has_img)
            rows.append(
                {
                    "url": f"{doc.url_prefix}/page/{p_idx}",
                    "warc_ts": EPOCH + timedelta(hours=d_idx, seconds=p_idx),
                    "html": json.dumps(spans, ensure_ascii=False).encode("utf-8"),
                    "text": text,
                    "lang": doc.lang,
                }
            )
    return rows


def to_pandas(cfg: CorpusConfig):
    import pandas as pd

    return pd.DataFrame(to_rows(generate(cfg), cfg.seed))


def pages_dataframe(spark, cfg: CorpusConfig):
    """The synthetic `pages` table as a Spark DataFrame (Arrow path)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(to_pandas(cfg), schema=schema)
