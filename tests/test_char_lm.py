"""Char-bigram LM + entropy quality signals (CCNet-style perplexity filter).

Parity with the DuckDB twin is covered by test_entry_parity; here we pin the
*signal* (junk scores worse than in-distribution text) and the plan shape
(model join broadcast, no cartesian)."""

import pytest

from enem_spark import textops


@pytest.fixture(scope="module")
def docs(spark):
    clean = "a clean sentence about data tables and spark jobs"
    rows = [
        (0, f"{clean} number {i} runs fast and joins data tables")
        for i in range(8)
    ]
    rows = [(i, t) for i, (_, t) in enumerate(rows)]
    rows.append((100, "zzzz qqqq zzzz qqqq xxxx zzzz qqqq xxxx vvvv"))  # junk
    rows.append((101, "��� mojibake �� run �"))
    rows.append((102, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"))  # repeated char
    rows.append((103, ""))  # empty
    rows.append((104, None))  # null text
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_lm_ranks_junk_worse(docs):
    out = {r["doc_id"]: r for r in textops.char_lm_score(docs).collect()}
    clean_nll = max(out[i]["nll"] for i in range(8))
    assert out[100]["nll"] > clean_nll
    assert out[101]["nll"] > clean_nll
    # empty/null docs: no bigrams, NULL score (never a divide-by-zero abort)
    for d in (103, 104):
        assert out[d]["n_bigrams"] == 0 and out[d]["nll"] is None


def test_char_entropy_flags_repetition(docs):
    out = {r["doc_id"]: r for r in textops.char_entropy(docs).collect()}
    # single repeated character => zero entropy; clean text is well above
    assert out[102]["entropy"] == 0.0
    assert out[0]["entropy"] > 1.0
    for d in (103, 104):
        assert out[d]["n_chars_norm"] == 0 and out[d]["entropy"] is None


def test_char_lm_external_train_slice(docs):
    """Unseen grams under an external train slice hit the smoothing floor
    (cnt=0) instead of null-ing the score."""
    train = docs.filter("doc_id < 8")
    out = {r["doc_id"]: r for r in textops.char_lm_score(docs, train=train).collect()}
    assert all(out[d]["nll"] is not None for d in (100, 101, 102))
    clean_nll = max(out[i]["nll"] for i in range(8))
    assert out[101]["nll"] > clean_nll


def test_char_lm_plan_shape(docs):
    plan = textops.char_lm_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # model + totals ride broadcasts
    assert "CartesianProduct" not in plan


def test_ccnet_buckets_bands_and_ordering(spark):
    clean = "the quick brown fox jumps over the lazy dog and runs on"
    rows = [(i, f"{clean} day {i}", "en") for i in range(10)]
    rows.append((100, "zzqq xv zzqq xv jjkk ww zzqq", "en"))  # junk -> high nll
    rows.append((101, "", "en"))  # token-free -> nll NULL -> tail
    rows += [(200 + i, f"ein kleiner satz nummer {i}", "de") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {r.doc_id: r for r in textops.ccnet_buckets(df).collect()}
    assert len(got) == len(rows)
    # junk page never lands in head; the NULL-nll page is always tail
    assert got[100].bucket != "head"
    assert got[101].bucket == "tail" and got[101].nll is None
    # per-language band sizes follow the integer edges (12 en docs:
    # head = floor-ish 30% -> r*100 <= 30*12 -> r <= 3)
    en = [r for r in got.values() if r.lang == "en"]
    from collections import Counter

    c = Counter(r.bucket for r in en)
    assert c["head"] == 3 and c["middle"] == 5 and c["tail"] == 4
    # 3 de docs: head r<=0 (none ranks r*100<=90), middle r*100<=210 -> r<=2
    de = Counter(r.bucket for r in got.values() if r.lang == "de")
    assert de == {"middle": 2, "tail": 1}
