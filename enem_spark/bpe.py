"""Distributed BPE vocabulary induction — the tokenizer-training step of a
training-data pipeline, as an iterative DataFrame algorithm.

Classic byte-pair encoding over the corpus word-frequency table: each round
finds the most frequent adjacent symbol pair (ties broken by ascending
pair, so the merge sequence is deterministic in any engine) and merges all
its non-overlapping left-to-right occurrences in every word. Words carry an
explicit ``</w>`` end marker, so merges never cross word boundaries and
suffix units stay distinct from infix units (the standard BPE formulation).

The merge step is pure string algebra shared with the DuckDB twin: with
symbols canonically single-space separated,

    padded  = ' ' || replace(sym, ' ', '  ') || ' '
    merged  = replace(padded, ' a  b ', ' ab ')     -- doubled separators
    sym'    = trim(regexp_replace(merged, ' +', ' '))

The doubled separators make consecutive occurrences non-overlapping for
plain replace() (``a b a b`` merges BOTH pairs) while overlapping runs
(``l l l``) merge left-to-right exactly like reference BPE. Verified
against a pure-Python reference implementation in tests/test_bpe.py.

Scale: after the one corpus-wide word-count shuffle, every round costs
O(|vocab|), independent of corpus size — the vocabulary table is the only
thing iterated, and the per-round argmax is a single-row ``limit(1)``
(driver sees one row per round, the convergence-probe pattern of
dedup_clusters/pagerank, not a data collect). Persist/unpersist hygiene
keeps exactly one generation of the vocab cached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql import types as T

from .textops import _tokens

BPE_ROUNDS = 6

_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("rnd", T.LongType()),
        T.StructField("left_sym", T.StringType()),
        T.StructField("right_sym", T.StringType()),
        T.StructField("merged", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def _word_freqs(documents: DataFrame) -> DataFrame:
    return (
        documents.select(F.explode(_tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _symbolize(words: DataFrame) -> DataFrame:
    # split(w, '') keeps a trailing '' element (Java split limit -1);
    # filter it so the symbol string has no empty symbol
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != "")
    return words.select(
        F.concat(F.array_join(chars, " "), F.lit(" </w>")).alias("sym"), "freq"
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair frequencies, weighted by word
    freq. posexplode + lead window (the _gram_rows discipline — split each
    sym exactly once); syms are distinct rows so `sym` is a valid
    partition key."""
    toks = words.select(
        "sym", "freq", F.posexplode(F.split("sym", " ")).alias("pos", "s")
    )
    w = W.partitionBy("sym").orderBy("pos")
    return (
        toks.withColumn("nxt", F.lead("s", 1).over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("s").alias("a"), F.col("nxt").alias("b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def merge_pair(sym_col, a: str, b: str):
    """One BPE merge applied to a canonical symbol-string column — the
    shared string algebra documented in the module docstring."""
    padded = F.concat(F.lit(" "), F.regexp_replace(sym_col, " ", "  "), F.lit(" "))
    merged = F.replace(padded, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return F.trim(F.regexp_replace(merged, " +", " "))


def bpe_merges(documents: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """(rnd, left_sym, right_sym, merged, cnt) — the first `rounds` BPE
    merges learned from the corpus, in merge order. `rounds` must be small
    vs the distinct-pair count (it is: real vocabularies give millions of
    pairs; the driver query learns 6)."""
    spark = documents.sparkSession
    vocab = _symbolize(_word_freqs(documents)).persist()
    vocab.count()
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for rnd in range(1, rounds + 1):
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((rnd, a, b, a + b, cnt))
            nxt = vocab.select(
                merge_pair(F.col("sym"), a, b).alias("sym"), "freq"
            ).persist()
            nxt.count()
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def bpe_reference(word_freqs: dict[str, int], rounds: int = BPE_ROUNDS):
    """Pure-Python reference BPE (test twin): same marker, same greedy
    left-to-right merge, same (count desc, pair asc) tiebreak."""
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in word_freqs.items()}
    merges = []
    for rnd in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, a + b, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges
