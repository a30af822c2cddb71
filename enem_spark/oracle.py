"""Pure-Python oracle: reference-faithful extraction semantics.

This module is the *correctness anchor* for the Spark engine. It re-derives,
operator by operator, the semantics of the reference implementation
(``/root/reference/enem_pdf_extractor.py``) at the page-text level — i.e. it
starts where ``fitz.Page.get_text()`` ends, so it runs in environments without
PyMuPDF and over synthetic corpora.

It is deliberately NOT a copy: the reference is a 980-line class with four
near-duplicate per-day handlers; this module is ~250 lines of pure functions
with one generic document handler. Behavior (including every quirk the golden
fixtures depend on) is matched exactly; each function cites the reference
lines it reproduces so parity can be audited.

Quirks reproduced on purpose (all observable in /root/reference/test_output):
  * header text before the first "QUESTÃO" marker is dropped
    (enem_pdf_extractor.py:242)
  * barcode artifacts ``*\\w{9}*`` / ``*\\w{10}*`` removed *after* the header
    strip (enem_pdf_extractor.py:244-245)
  * question numbering advances across skipped pages and unparseable
    questions, leaving gaps in the output (enem_pdf_extractor.py:253-257,
    459-462)
  * answer lookup by word-boundary probe + fixed character offset into the
    line-filtered answer-key text; a miss yields the literal string
    "não achou a questão" (enem_pdf_extractor.py:189-226)
  * four JSON shape variants, keyed on the ``[None]`` image-list sentinel
    (enem_pdf_extractor.py:338-388)
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Iterator

QUESTION_MARKER = "QUESTÃO"
MISSING_ANSWER = "não achou a questão"
NON_STANDARD = "non-standard alternatives"

# filename-convention templates (enem_pdf_extractor.py:47-48)
TXT_TEMPLATE = "(Enem/{year})  {text}\n(RESPOSTA CORRETA): {answer}\n\n"
MD_TEMPLATE = (
    "# Ano: (Enem/{year}) \n# texto da questão: \n {text} \n"
    " # (RESPOSTA CORRETA): {answer}\n\n"
)

BARCODE_9 = re.compile(r"\*\w{9}\*")  # enem_pdf_extractor.py:44
BARCODE_10 = re.compile(r"\*\w{10}\*")  # enem_pdf_extractor.py:45
DOUBLED_LETTER = re.compile(r"([A-E])\s*\n\1\s*")  # enem_pdf_extractor.py:111
SINGLE_LETTER = re.compile(r"([A-E])\s{2}")  # enem_pdf_extractor.py:113 (2020 format)
ALT_MARK = re.compile(r"([A-E])\)")  # enem_pdf_extractor.py:128
ANSWER_NOISE_LINE = re.compile(r"^.{4,}$", flags=re.MULTILINE)  # :951

# subject routing ranges (enem_pdf_extractor.py:407, 556)
DAY1_RANGES = (("eng", 1, 5), ("spani", 6, 10), ("lang", 11, 50), ("huma", 51, 95))
DAY2_RANGES = (("natu", 1, 45), ("math", 46, 91))


def iter_marker_positions(text: str, marker: str = QUESTION_MARKER) -> Iterator[int]:
    """Non-overlapping occurrence offsets (enem_pdf_extractor.py:178-185).

    The reference guards the empty marker (`sub_str = sub_str or "*"`,
    :179) — without it `find("", start)` returns `start` with step 0 and
    the generator yields the same offset forever (an executor hang, not
    an error)."""
    marker = marker or "*"
    start = 0
    step = len(marker)
    while True:
        start = text.find(marker, start)
        if start == -1:
            return
        yield start
        start += step


def count_markers(text: str, marker: str = QUESTION_MARKER) -> int:
    return sum(1 for _ in iter_marker_positions(text, marker))


def filter_answer_key_text(raw_answer_text: str) -> str:
    """Blank every line with >=4 chars, keeping newlines (:951-952)."""
    return ANSWER_NOISE_LINE.sub("", raw_answer_text)


def find_correct_answer(
    answer_text: str, question_number: int, day_one: bool, is_spanish: bool = False
) -> str:
    """Positional probe into the filtered answer-key text (:189-226).

    D1 exam numbers > 5 map to key number n-5 (EN/ES share key rows 1-5);
    D2 exam numbers map to n+90.  The answer letter sits at a fixed character
    offset from the matched number: 1-digit D1 -> +2 (EN) / +4 (ES);
    2-digit D1 -> +3; D2 < 100 -> +3, >= 100 -> +4.
    """
    if day_one:
        n = question_number - 5 if question_number > 5 else question_number
        m = re.search(r"\b" + str(n) + r"\b", answer_text)
        if not m:
            return MISSING_ANSWER
        offset = (4 if is_spanish else 2) if n < 10 else 3
        idx = m.start() + offset
    else:
        n = question_number + 90
        m = re.search(r"\b" + str(n) + r"\b", answer_text)
        if not m:
            return MISSING_ANSWER
        offset = 3 if n < 100 else 4
        idx = m.start() + offset
    # deliberate divergence from the reference: a truncated key text whose
    # last probed number sits at end-of-string would IndexError there
    # (enem_pdf_extractor.py:201-222 indexes unconditionally); we degrade to
    # the miss literal so malformed CC pages cannot kill a task
    return answer_text[idx] if idx < len(answer_text) else MISSING_ANSWER


@dataclass
class PageRecord:
    """Per-page preprocessing result (the reference's only row type, :230-265)."""

    text: str
    page_first_question: int
    total_question_number: int
    image_names: list[str] = field(default_factory=list)


def preprocess_page(
    page_text: str,
    has_images: bool,
    total_question_number: int,
    process_images: bool,
    image_names: list[str] | None = None,
) -> PageRecord | None:
    """Marker normalization, header strip, barcode strip, marker count (:230-334).

    Returns None for pages with no marker (essay/cover material, :239-240).
    In no-images mode a page carrying images yields empty text but still
    advances the question counter (:253-257); in images mode the text is kept
    and the page's image names flow through (:294-333).
    """
    text = page_text.replace("Questão", QUESTION_MARKER)  # :236
    first_idx = text.find(QUESTION_MARKER)
    if first_idx == -1:
        return None
    text = text[first_idx:]  # :242 header strip
    text = BARCODE_9.sub("", text)  # :244
    text = BARCODE_10.sub("", text)  # :245
    page_first = total_question_number + 1  # :247
    total = total_question_number + count_markers(text)  # :249-251
    if not process_images and has_images:
        return PageRecord("", page_first, total)  # :255-257
    text += f" {QUESTION_MARKER}"  # :262 end sentinel
    return PageRecord(text, page_first, total, list(image_names or []))


def parse_alternatives(
    question: str, output_type: str
) -> str | tuple[str, list[str]]:
    """Alternative-letter state machine (:106-148).

    PDF extraction doubles each alternative letter ("A\\nA body"); collapse to
    "A)body".  If fewer than 5 substitutions, retry with the 2020 single-letter
    format ("A␣␣body"); still fewer than 5 -> non-standard (image alternatives)
    sentinel.  An empty alternative body also means image alternatives ->
    sentinel.  txt mode returns a string; json/markdown return
    (question, alternative_list).
    """
    as_string = output_type == "txt"
    failed: str | tuple[str, list[str]] = (
        NON_STANDARD if as_string else (NON_STANDARD, [])
    )
    question, n_subs = DOUBLED_LETTER.subn(lambda m: f"{m.group(1)})", question)
    if n_subs < 5:
        question, n_subs = SINGLE_LETTER.subn(lambda m: f"{m.group(1)})", question)
        if n_subs < 5:
            return failed
    marks = list(ALT_MARK.finditer(question))
    for i, m in enumerate(marks):
        end = marks[i + 1].start() if i + 1 < len(marks) else len(question)
        if not question[m.end() : end]:
            return failed  # empty body => image alternative (:138-139)
    if as_string:
        return question
    return question, alternative_list(question)


def alternative_list(question: str) -> list[str]:
    """Spans from each "X)" to the next (:161-174); keeps the "X)" prefix."""
    starts = [m.start() for m in ALT_MARK.finditer(question)]
    bounds = starts + [len(question)]
    return [question[bounds[i] : bounds[i + 1]] for i in range(len(starts))]


def md_insert_alternatives_header(question: str) -> str:
    """Inject the markdown alternatives header before the first "X)" (:152-159)."""
    m = re.search(r"[A-E]\).*?", question)
    if not m:
        return question
    i = m.start()
    return question[:i] + "\n# alternativas: \n" + question[i:]


def remap_number(number: int, day_one: bool) -> int:
    """THE output-number remap (enem_pdf_extractor.py:443-454): D1 keeps
    1-5 (EN/ES share them) and shifts the rest down 5; D2 adds 90.
    Single-sourced — extract.questions_from_counted's Catalyst expression
    mirrors this and is pinned equal over the full range by
    tests/test_oracle_properties.py; change BOTH or the questions table's
    question_num/ID desyncs from the rendered JSON payloads."""
    return (number if number < 6 else number - 5) if day_one else number + 90


def question_json(
    question: str,
    day_one: bool,
    year: int,
    correct_answer: str,
    number: int,
    alternatives: list[str],
    image_list: list | None = None,
) -> dict:
    """JSON record with the reference's four shape variants (:338-388).

    ``image_list`` defaults to the ``[None]`` sentinel that *suppresses* the
    ``page_images`` key (no-images mode); an images-mode caller passes a real
    (possibly empty) list, which *includes* the key.
    """
    if image_list is None:
        image_list = [None]
    day = "D1" if day_one else "D2"
    number = remap_number(number, day_one)
    head = {"question_text": question, "correct_answer": correct_answer}
    tail = {
        "ID": f"{year}_{day}_N{number}",
        "year": year,
        "day": day,
        "question_num": number,
    }
    if alternatives:
        if len(image_list) == 0 or image_list[0] is not None:
            return {**head, "alternatives": alternatives, "page_images": image_list, **tail}
        return {**head, "alternatives": alternatives, **tail}
    if image_list:
        return {**head, **tail}
    return {**head, "page_images": image_list, **tail}


@dataclass
class QuestionRow:
    """One emitted question — the engine's `questions` table row."""

    seq: int  # absolute in-document question number (pre-remap)
    subject: str
    payload: str | dict  # rendered string (txt/md) or JSON record


def extract_document(
    page_texts: list[str],
    page_has_images: list[bool],
    raw_answer_text: str,
    year: int,
    day_one: bool,
    output_type: str = "json",
    process_images: bool = False,
    page_image_names: list[list[str]] | None = None,
) -> list[QuestionRow]:
    """Full-document extraction: the generic form of the reference's four
    handlers (:392-929). ``page_texts[0]`` is the cover page and is skipped
    (:409,558,677,831)."""
    answer_text = filter_answer_key_text(raw_answer_text)
    ranges = DAY1_RANGES if day_one else DAY2_RANGES
    rows: list[QuestionRow] = []
    total = 0
    names = page_image_names or [[] for _ in page_texts]
    for page_idx in range(1, len(page_texts)):
        rec = preprocess_page(
            page_texts[page_idx],
            page_has_images[page_idx],
            total,
            process_images,
            names[page_idx],
        )
        if rec is None:
            continue
        total = rec.total_question_number
        if not rec.text:
            continue  # image page in no-images mode (:691-692)
        seg_start = 0
        number = rec.page_first_question
        for pos in iter_marker_positions(rec.text):
            if pos == 0:
                seg_start = 0
                continue  # no segment before the first marker (:433-434)
            is_spanish = day_one and 5 < number < 11  # :436-439
            answer = find_correct_answer(answer_text, number, day_one, is_spanish)
            raw_segment = rec.text[seg_start:pos]
            parsed = parse_alternatives(raw_segment, output_type)
            if isinstance(parsed, tuple):
                question, alts = parsed
            else:
                question, alts = parsed, []
            if output_type == "markdown":
                question = md_insert_alternatives_header(question)
            if question == NON_STANDARD:  # dropped, counter still advances (:459-462)
                seg_start = pos
                number += 1
                continue
            if output_type == "txt":
                payload: str | dict = TXT_TEMPLATE.format(
                    year=year, text=question, answer=answer
                )
            elif output_type == "markdown":
                payload = MD_TEMPLATE.format(year=year, text=question, answer=answer)
            else:
                payload = question_json(
                    question,
                    day_one,
                    year,
                    answer,
                    number,
                    alts,
                    rec.image_names if process_images else None,
                )
            for subject, lo, hi in ranges:
                if lo <= number <= hi:
                    rows.append(QuestionRow(number, subject, payload))
                    break
            seg_start = pos
            number += 1
    return rows


# single-sourced sink filename convention (reference :511-544): the Spark
# sink (extract.render_sink_files) references THESE, never re-spells them —
# a convention change landing in one renderer but not the other would
# silently desync the byte-identity oracle
SINK_EXTENSIONS = {"txt": "txt", "markdown": "md", "json": "json"}


def sink_filename(year: int, subject: str, ext: str) -> str:
    return f"{year}_{subject}_questions.{ext}"


def render_sink_files(
    rows: list[QuestionRow], year: int, day_one: bool, output_type: str
) -> dict[str, str]:
    """Per-(year, subject) file contents, byte-identical to the reference sinks
    (:511-544 etc.): txt/md = in-order concat; json = indent-4 array dump."""
    ext = SINK_EXTENSIONS[output_type]
    subjects = [s for s, _, _ in (DAY1_RANGES if day_one else DAY2_RANGES)]
    out: dict[str, str] = {}
    for subject in subjects:
        payloads = [r.payload for r in rows if r.subject == subject]
        name = sink_filename(year, subject, ext)
        if output_type == "json":
            out[name] = json.dumps(payloads, indent=4, ensure_ascii=False)
        else:
            out[name] = "".join(payloads)  # type: ignore[arg-type]
    return out
