"""Bridge: driver-provided `documents` table -> synthetic `pages` table.

The driver's relational testdata (/root/testdata/sf*/documents.parquet) is the
required input for the flagship query; this module deterministically reshapes
each document row into an ENEM-shaped exam page (and synthesizes the matching
GB answer-key documents), so the full extraction pipeline runs end-to-end on
driver data with no RNG and no driver-side collect of the PV side.

Mapping (pure functions of doc_id):
  exam index  = doc_id // EXAM_PAGES   (24 pages x 2 questions = 48 <= the
                routable range, so every question lands in a subject bucket)
  exam slot   = exam index % 32 -> (year, day, color); the url carries the
                exam index so documents stay distinct even when slots repeat
  page_idx    = doc_id % EXAM_PAGES + 1  (page 0 = cover is simply absent)
  2 questions per page, bodies/alternatives drawn from the row's own tokens
  answers     = deterministic letter from md5(year:day:key)
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

EXAM_PAGES = 24
N_SLOTS = 32
EPOCH_S = 1704067200  # 2024-01-01 UTC

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def slot_meta(slot: int) -> tuple[int, str, str]:
    s = slot % N_SLOTS
    year = 2020 + s % 4
    day = "D1" if s < N_SLOTS // 2 else "D2"
    color = str(1 + (s // 4) % 4) if day == "D1" else str(5 + (s // 4) % 4)
    return year, day, color


def answer_letter(year: int, day: str, key: int) -> str:
    digest = hashlib.md5(f"{year}:{day}:{key}".encode()).digest()
    return "ABCDE"[digest[0] % 5]


BODY_TOKENS = 60  # ~1 KB of question body per page: realistic regex load


def page_text_for(doc_id: int, text: str, year: int) -> str:
    toks = text.split()
    if len(toks) < 12:
        toks = (toks + ["conteudo"] * 12)[:12]
    page_idx = doc_id % EXAM_PAGES + 1
    first_q = (page_idx - 1) * 2 + 1
    parts = [f"ENEM {year} CADERNO\n"]
    for k in range(2):
        body = " ".join(
            toks[(k * 6 + j) % len(toks)] for j in range(BODY_TOKENS)
        )
        lines = [f"QUESTÃO {first_q + k} ", f"{body}?"]
        for j, letter in enumerate("ABCDE"):
            alt = " ".join(toks[(k * 6 + j + m) % len(toks)] for m in range(4))
            lines.append(f"{letter}\n{letter}{alt} na escala.")
        parts.append("\n".join(lines) + "\n")
    return "".join(parts)


def gb_text_for(year: int, day: str) -> str:
    # D2 exam numbers run 1..91 and probe keys n+90 = 91..181 inclusive
    # (oracle.DAY2_RANGES caps math at 91), so the key list must reach 181
    lines = [f"GABARITO OFICIAL {year} {day} LINHA DE RUIDO"]
    keys = range(1, 91) if day == "D1" else range(91, 182)
    for k in keys:
        lines.append(str(k))
        lines.append(answer_letter(year, day, k))
        if day == "D1" and k <= 5:
            lines.append(answer_letter(year, day, 100 + k))  # ES variant row
    return "\n".join(lines) + "\n"


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> pages rows (PV exam pages + GB keys)."""

    def pv_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            doc_id = int(doc_id)
            exam = doc_id // EXAM_PAGES
            year, day, color = slot_meta(exam)
            page_idx = doc_id % EXAM_PAGES + 1
            rows.append(
                {
                    "url": f"cc://enem/{year}_PV_impresso_{day}_CD{color}-x{exam}/page/{page_idx}",
                    "warc_ts": pd.Timestamp(EPOCH_S + doc_id, unit="s"),
                    "html": None,
                    "text": page_text_for(doc_id, str(text), year),
                    "lang": "pt",
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    def pv_iter(batches):
        for pdf in batches:
            yield pv_batch(pdf)

    pv = documents.select("doc_id", "text").mapInPandas(pv_iter, PAGES_SCHEMA)

    gb_rows = []
    for s in range(N_SLOTS):
        year, day, color = slot_meta(s)
        gb_rows.append(
            {
                "url": f"cc://enem/{year}_GB_impresso_{day}_CD{color}/page/0",
                "warc_ts": pd.Timestamp(EPOCH_S - 1, unit="s"),
                "html": None,
                "text": gb_text_for(year, day),
                "lang": "pt",
            }
        )
    gb = pv.sparkSession.createDataFrame(pd.DataFrame(gb_rows), schema=PAGES_SCHEMA)
    return pv.unionByName(gb)
