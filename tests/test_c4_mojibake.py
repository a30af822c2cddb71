"""C4 heuristic filters + mojibake repair: kernel unit tests, operator
behavior on planted rows, and plan-shape guards (c4 must stay pure codegen;
mojibake must cross Arrow exactly once)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from enem_spark import textops


# --- mojibake kernel (pure) -------------------------------------------------


def test_mojibake_kernel_roundtrips():
    m = textops.MOJIBAKE_MARK
    once = textops.mojibake_plant_py(m)
    twice = textops.mojibake_plant_py(once)
    assert once != m and twice != once
    assert textops.mojibake_repair_py(once) == m
    assert textops.mojibake_repair_py(twice) == m


def test_mojibake_kernel_leaves_clean_text_alone():
    # pure ASCII: cp1252 -> utf-8 round-trip is the identity, loop breaks
    assert textops.mojibake_repair_py("plain ascii.") == "plain ascii."
    # clean accented text: its cp1252 bytes are NOT valid utf-8, so the
    # first decode attempt fails and the text is untouched
    assert textops.mojibake_repair_py(textops.MOJIBAKE_MARK) == (
        textops.MOJIBAKE_MARK
    )


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
    )
)
def test_mojibake_repair_inverts_plant_on_marked_text(ascii_tail):
    """plant is invertible whenever the text carries a non-ASCII marker:
    repair(plant(marker + ascii)) == marker + ascii, including double
    encoding. (Pure-ASCII text is a fixpoint of plant, trivially fine.)"""
    s = textops.MOJIBAKE_MARK + " " + ascii_tail
    once = textops.mojibake_plant_py(s)
    assert textops.mojibake_repair_py(once) == s
    assert textops.mojibake_repair_py(textops.mojibake_plant_py(once)) == s


# --- Spark operators ---------------------------------------------------------


@pytest.fixture(scope="module")
def c4_docs(spark):
    rows = [
        # all-pass page: 1 keepable content line + 3 terminal sentences
        Row(doc_id=1, text="Welcome\nThis line has five good words.\n"
                           "One. Two here now go. Three!"),
        # javascript + short lines dropped; only 1 sentence -> min-sent fail
        Row(doc_id=2, text="enable JavaScript to see this page now.\n"
                           "Buy now!\nA good long sentence sits here."),
        # lorem page flag
        Row(doc_id=3, text="lorem ipsum dolor sit amet.\n"
                           "One. Two here we go. Three!"),
        # brace page flag
        Row(doc_id=4, text="var x = { a: 1 };\nOne. Two here we go. Three!"),
        # badword page flag (word-boundary)
        Row(doc_id=5, text="win big at the casino tonight!\n"
                           "One. Two here we go. Three!"),
        # 'casinos' must NOT match the word-boundary blocklist
        Row(doc_id=6, text="there are no casinos mentioned here at all.\n"
                           "One. Two here we go. Three!"),
    ]
    return spark.createDataFrame(rows)


def test_c4_rules_on_planted_rows(spark, c4_docs):
    got = {r["doc_id"]: r for r in textops.c4_filters(c4_docs).collect()}
    assert got[1]["c4_pass"] and got[1]["n_kept_lines"] == 2
    # doc 2: the javascript line is dropped even though it ends in '.'
    assert got[2]["n_kept_lines"] == 1 and not got[2]["r_min_sentences"]
    assert not got[2]["c4_pass"]
    assert not got[3]["r_lorem"] and not got[3]["c4_pass"]
    assert not got[4]["r_brace"] and not got[4]["c4_pass"]
    assert not got[5]["r_badword"] and not got[5]["c4_pass"]
    assert got[6]["r_badword"] and got[6]["c4_pass"]


def test_c4_plan_is_pure_codegen(spark, c4_docs):
    plan = (
        textops.c4_filters(c4_docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan
    assert "Exchange" not in plan, plan


def test_mojibake_operator_matches_kernel(spark):
    m = textops.MOJIBAKE_MARK
    once = textops.mojibake_plant_py(m)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=once), Row(doc_id=2, text="clean ascii text.")]
    )
    got = {r["doc_id"]: r for r in textops.mojibake_repair(docs).collect()}
    assert got[1]["changed"] and not got[2]["changed"]
    assert got[1]["n_after"] == len(m) and got[1]["n_before"] == len(once)
    import hashlib

    assert got[1]["repaired_md5"] == hashlib.md5(m.encode()).hexdigest()


def test_mojibake_plan_single_arrow_crossing(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="x.")])
    plan = (
        textops.mojibake_repair(textops.plant_mojibake(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "Exchange" not in plan, plan


def test_plant_mojibake_residue_split(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="t") for i in (0, 3, 9, 1)]
    )
    texts = {
        r["doc_id"]: r["text"]
        for r in textops.plant_mojibake(docs).collect()
    }
    once = textops.mojibake_plant_py(textops.MOJIBAKE_MARK)
    twice = textops.mojibake_plant_py(once)
    assert texts[9].startswith(twice) and texts[0].startswith(twice)
    assert texts[3].startswith(once) and not texts[3].startswith(twice)
    assert texts[1] == "t"


# --- pure mirror differential (edge battery) ---------------------------------


def _c4_py(text: str) -> dict:
    """Pure mirror of textops.c4_filters' regex semantics (the engine is
    the spec): the word split is the EXPLICIT TOKEN_WS_RE class (no \\x0B
    — Java's \\s has it, RE2's does not, and the engine now spells the
    class so both twins agree), trim strips 0x20 only."""
    import hashlib
    import re

    ws = re.compile(r"[ \t\n\f\r]+")
    # Java's unanchored `$` matches BEFORE a final line terminator, so a
    # line like 'done.\r' (from \r\n input split on \n) still matches —
    # mirror that here explicitly
    term = re.compile('[.!?"](?:\\r\\n|[\\n\\r\\u0085\\u2028\\u2029])?$')
    bad = re.compile(r"\b(casino|viagra|xxx)\b", re.IGNORECASE | re.ASCII)
    lines = text.split("\n")
    kept = [
        l
        for l in lines
        if term.search(l.strip(" "))
        and len(ws.split(l.strip(" "))) >= 5
        and "javascript" not in l.lower()
    ]
    kept_text = "\n".join(kept)
    n_sent = sum(kept_text.count(c) for c in ".!?")
    r_lorem = "lorem ipsum" not in text.lower()
    r_brace = "{" not in text
    r_badword = not bad.search(text)
    return {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "n_sentences": n_sent,
        "r_lorem": r_lorem,
        "r_brace": r_brace,
        "r_badword": bool(r_badword),
        "r_min_sentences": n_sent >= 3,
        "c4_pass": r_lorem and r_brace and bool(r_badword) and n_sent >= 3,
        "kept_md5": hashlib.md5(kept_text.encode()).hexdigest(),
    }


EDGE_TEXTS = [
    "",                                # empty -> 1 line, 0 kept
    "\n\n\n",                          # blank lines only
    "word " * 5 + ".",                 # trailing space before the period
    "one two three four five.",        # exactly 5 words
    "one two three four.",             # 4 words -> dropped
    'he said "stop".',                 # quote inside, period ends
    'a full quoted line with ending "',  # ends on closing quote
    "tab\tseparated words make a line.",  # tab is a word separator
    "line with carriage return.\r\nnext line here with five words.",
    "nbsp is not a java word separator here okay.",  # \xa0 NOT \s in Java
    "ALL CAPS JAVASCRIPT WARNING LINE HERE.",  # javascript, case-insensitive
    "Lorem IPSUM dolor sit amet appears mid page.",
    "casino",                          # badword alone (short line though)
    "casinos are not blocked here because word boundary.",
    "multi. sentence. line. counts. them. all.",
    "   leading spaces then five proper words here.",
    "unicode é ação com cinco palavras aqui presentes.",
    "vertical\x0btab separated maybe four words.",  # \x0B NOT ws (RE2 class)
]


def test_c4_pure_mirror_edge_battery(spark):
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(EDGE_TEXTS)]
    got = {
        r["doc_id"]: r.asDict()
        for r in textops.c4_filters(spark.createDataFrame(rows)).collect()
    }
    for i, t in enumerate(EDGE_TEXTS):
        exp = _c4_py(t)
        actual = {k: got[i][k] for k in exp}
        assert actual == exp, f"doc {i} ({t!r}):\n spark={actual}\n py   ={exp}"
