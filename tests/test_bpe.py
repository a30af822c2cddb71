"""bpe_merges — differential against the pure-Python reference BPE.

The DuckDB twin parity lives in test_entry_parity; here the Spark merge
sequence is pinned to a reference implementation with explicit greedy
left-to-right semantics, including the overlap/adjacency edge cases the
doubled-separator replace algebra must honor.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from enem_spark import bpe, textops

SF_DIR = "/root/testdata/sf0.01"


def _spark_merges(spark, word_freqs, rounds):
    # build a documents-like frame whose token stream realizes word_freqs
    text = " ".join(w for w, f in word_freqs.items() for _ in range(f))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    return [tuple(r) for r in bpe.bpe_merges(df, rounds=rounds).collect()]


def test_overlap_and_adjacency_edge_cases(spark):
    # 'ababab': pair (a,b) occurs 3x per word; merging must take all three
    # (non-overlapping), and 'aaa' must merge left-to-right (aa, a)
    freqs = {"ababab": 2, "aaa": 3}
    got = _spark_merges(spark, freqs, rounds=3)
    exp = [tuple(r) for r in bpe.bpe_reference(freqs, rounds=3)]
    assert got == exp
    # first merge is (a,b) with count 6: three occurrences in each of the
    # 2 'ababab' words (the 'aaa' pair (a,a) has count 2*3=6 too — tie
    # broken by ascending pair, ('a','a') < ('a','b'))
    assert got[0][1:3] == ("a", "a") and got[0][4] == 6


@given(
    st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=5),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=6, deadline=None)
def test_spark_matches_reference_on_random_vocabs(spark, word_freqs):
    got = _spark_merges(spark, word_freqs, rounds=4)
    exp = [tuple(r) for r in bpe.bpe_reference(word_freqs, rounds=4)]
    assert got == exp


def test_corpus_merges_match_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    freqs = {
        r.w: r.freq
        for r in docs.select(
            # the EXPLICIT class, never \s+ (CLAUDE.md tokenizer rule):
            # Java \s includes \x0B and would desync this reference freq
            # table from the engine's split if the corpus ever carries one
            F.explode(F.split(F.trim("text"), textops.TOKEN_WS_RE)).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .collect()
    }
    got = [tuple(r) for r in bpe.bpe_merges(docs).collect()]
    exp = [tuple(r) for r in bpe.bpe_reference(freqs, rounds=bpe.BPE_ROUNDS)]
    assert got == exp
    assert len(got) == bpe.BPE_ROUNDS


def test_encode_stats_match_reference(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the the the banana"),
            (3, "   "),
            (4, "abcabc ababab aaa"),
        ],
        ["doc_id", "text"],
    )
    merges = [(m[1], m[2]) for m in bpe.learn_merges(docs, rounds=4)]
    got = {
        r.doc_id: (r.n_words, r.n_subwords, r.fertility)
        for r in bpe.bpe_encode_stats(docs, merges).collect()
    }
    assert 3 not in got  # token-free docs emit no row (inner-join semantics)
    for d, t in [
        (1, "the cat sat on the mat"),
        (2, "the the the banana"),
        (4, "abcabc ababab aaa"),
    ]:
        nw, ns = bpe.encode_reference(t, merges)
        assert got[d][0] == nw and got[d][1] == ns, (d, got[d], (nw, ns))
        assert got[d][2] == round(ns / nw, 6)
        # subwords never exceed characters+1 per word, never undercut words
        assert nw <= ns


def test_encode_stats_learns_when_merges_omitted(spark):
    docs = spark.createDataFrame([(1, "aa aa ab")], ["doc_id", "text"])
    row = bpe.bpe_encode_stats(docs, rounds=2).collect()[0]
    # merges learned: ('a','a') then ('aa','</w>') — 'aa' -> 1 subword,
    # 'ab' -> a b </w> stays 3
    assert (row.n_words, row.n_subwords) == (3, 1 + 1 + 3)
