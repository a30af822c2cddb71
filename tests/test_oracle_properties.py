"""Property-based tests (Hypothesis) for the oracle's segmentation invariants.

SURVEY.md §5.3(4): random page texts -> invariants that must hold for ANY
input, independent of the golden fixtures:

  I1  question count == marker count (numbering advances per marker, even for
      dropped/unparseable segments — enem_pdf_extractor.py:459-462)
  I2  emitted numbers form a strictly increasing subsequence of
      [page_first_question, ...]; gaps appear only at unparseable segments
  I3  segments concatenate back to the preprocessed page text (no bytes lost
      or duplicated by the span arithmetic)
  I4  preprocessing is idempotent on its own output modulo the appended
      sentinel, and never yields text before the first marker
  I5  the Spark per-page function (_process_one_page) agrees with the oracle
      page loop for every generated page
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from enem_spark import oracle
from enem_spark.extract import ExtractorConfig, _process_one_page

MARKER = oracle.QUESTION_MARKER

# text fragments that stress the state machines: marker variants, alternative
# letters in both formats, barcodes, mojibake, whitespace runs
FRAGMENTS = st.sampled_from(
    [
        "QUESTÃO 12 ",
        "Questão 3 ",
        "corpo da questão sobre geografia ",
        "A\nAalternativa um\n",
        "B\nBalternativa dois\n",
        "C\nCalternativa três\n",
        "D\nDalternativa quatro\n",
        "E\nEalternativa cinco\n",
        "A  texto 2020\n",
        "B  outro 2020\n",
        "C  mais 2020\n",
        "D  quarto 2020\n",
        "E  quinto 2020\n",
        "*ABCDEFGHI*",
        "*ABCDEFGHIJ*",
        "�����",
        "\n\n",
        "  ",
        "E\nE",  # empty alternative body (image alternative)
        "cabeçalho ENEM 2099 ",
    ]
)

page_texts = st.lists(FRAGMENTS, min_size=0, max_size=30).map("".join)


@given(page_texts)
@settings(max_examples=300, deadline=None)
def test_preprocess_invariants(text):
    rec = oracle.preprocess_page(text, has_images=False, total_question_number=7,
                                 process_images=False)
    norm = text.replace("Questão", MARKER)
    if MARKER not in norm:
        assert rec is None  # F3
        return
    assert rec.page_first_question == 8
    # I4: output starts at the first marker, sentinel appended
    assert rec.text.startswith(MARKER)
    assert rec.text.endswith(f" {MARKER}")
    # I1: total advance == number of markers in the stripped text (the
    # sentinel adds one find-hit but no counted marker)
    stripped = norm[norm.find(MARKER):]
    stripped = oracle.BARCODE_9.sub("", stripped)
    stripped = oracle.BARCODE_10.sub("", stripped)
    assert rec.total_question_number - 7 == oracle.count_markers(stripped)
    # I3: dropping the sentinel recovers the stripped text exactly
    assert rec.text[: -len(f" {MARKER}")] == stripped


def test_empty_marker_never_hangs():
    # the reference's own guard (enem_pdf_extractor.py:179: sub_str or "*"):
    # find("", i) == i with step 0 previously looped forever in an executor
    assert list(oracle.iter_marker_positions("abc", "")) == []
    assert oracle.count_markers("a*b*c", "") == 2  # "" degrades to "*"
    assert oracle.count_markers("", "")== 0


@given(page_texts)
@settings(max_examples=300, deadline=None)
def test_segments_partition_page_text(text):
    rec = oracle.preprocess_page(text, False, 0, False)
    if rec is None or not rec.text:
        return
    positions = list(oracle.iter_marker_positions(rec.text))
    # segments = slices between consecutive markers; they tile [0, last_pos)
    segs, start = [], 0
    for pos in positions:
        if pos == 0:
            continue
        segs.append(rec.text[start:pos])
        start = pos
    assert "".join(segs) == rec.text[: positions[-1] if len(positions) > 1 else 0]


@given(page_texts)
@settings(max_examples=200, deadline=None)
def test_spark_page_function_agrees_with_oracle(text):
    cfg = ExtractorConfig(output_type="json")
    got = _process_one_page("cc://x/page/1", None, text, cfg)
    rec = oracle.preprocess_page(text, False, 0, False)
    if rec is None:
        assert got["q_count"] == 0 and got["questions"] == []
        return
    assert got["q_count"] == rec.total_question_number
    # I5: per-question parse identical to the oracle loop
    exp = []
    seg_start, seq = 0, 0
    for pos in oracle.iter_marker_positions(rec.text):
        if pos == 0:
            continue
        parsed = oracle.parse_alternatives(rec.text[seg_start:pos], "json")
        q, alts = parsed if isinstance(parsed, tuple) else (parsed, [])
        ok = q != oracle.NON_STANDARD
        exp.append((seq, q if ok else None, alts if ok else [], ok))
        seg_start, seq = pos, seq + 1
    assert [
        (g["seq"], g["question_text"], g["alternatives"], g["ok"])
        for g in got["questions"]
    ] == exp


@given(st.integers(min_value=1, max_value=180), st.booleans())
@settings(max_examples=100, deadline=None)
def test_answer_probe_total(number, day_one):
    """The probe never raises and returns a 1-char letter or the miss string."""
    key_text = oracle.filter_answer_key_text(
        "RUIDO LONGO ACIMA DE QUATRO\n5\nA\n42\nB\n95\nC\n105\nD\n"
    )
    if day_one and number > 95:
        number -= 90
    ans = oracle.find_correct_answer(key_text, number, day_one, is_spanish=False)
    assert ans == oracle.MISSING_ANSWER or len(ans) == 1


def test_remap_expression_matches_oracle(spark):
    """extract.questions_from_counted's Catalyst remap expression must
    equal oracle.remap_number over the whole number range — the remap is
    single-sourced in the oracle and mirrored as an expression (review
    finding r3: a hand-copied fork would silently desync question_num/ID
    between the questions table and the rendered JSON payloads)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from enem_spark import oracle

    rows = [(n, d) for n in range(1, 200) for d in ("D1", "D2")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["abs_num", "day"]))
    n = F.col("abs_num")
    day_one = F.col("day") == "D1"
    out_num = F.when(day_one, F.when(n < 6, n).otherwise(n - 5)).otherwise(
        n + 90
    )
    got = {
        (r["abs_num"], r["day"]): r["m"]
        for r in df.withColumn("m", out_num).collect()
    }
    for num, day in rows:
        assert got[(num, day)] == oracle.remap_number(num, day == "D1")
