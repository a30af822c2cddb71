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
dedup_clusters/pagerank, not a data collect). Each round runs exactly ONE
Spark job: the argmax scan doubles as the materializer of the new vocab
generation, and the parent generation is unpersisted only after that scan
returns — at most two generations are cached at any instant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
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
    freq. Adjacent pairs come from zipping the symbol array with itself
    shifted by one (the textops._shingle_arrays discipline: the split runs
    once inside one projection, CSE dedupes the two slice references, and
    the explode is a narrow generator) — the groupBy(a, b) is the ONLY
    exchange, where the previous formulation also shuffled every symbol
    row through a partitionBy(sym) window first."""
    syms = F.split("sym", " ")
    m = F.size(syms)
    zipped = F.arrays_zip(F.slice(syms, 1, m - 1), F.slice(syms, 2, m - 1))
    return (
        words.select("freq", F.explode(zipped).alias("p"))
        .groupBy(F.col("p")["0"].alias("a"), F.col("p")["1"].alias("b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def merge_pair(sym_col, a: str, b: str):
    """One BPE merge applied to a canonical symbol-string column — the
    shared string algebra documented in the module docstring."""
    padded = F.concat(F.lit(" "), F.regexp_replace(sym_col, " ", "  "), F.lit(" "))
    merged = F.replace(padded, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return F.trim(F.regexp_replace(merged, " +", " "))


def learn_merges(
    documents: DataFrame, rounds: int = BPE_ROUNDS
) -> list[tuple[int, str, str, str, int]]:
    """The first `rounds` BPE merges learned from the corpus, in merge
    order, as driver-local tuples (rnd, left, right, merged, cnt). Each
    round's argmax is a single-row limit(1) — one row per round crosses to
    the driver, never the vocabulary."""
    vocab = _symbolize(_word_freqs(documents)).persist()
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for rnd in range(1, rounds + 1):
            # ONE job per round: this argmax scan also materializes the
            # just-persisted vocab generation, so no separate count() is
            # needed. The parent generation stays persisted until here —
            # unpersisting it before this job would put the whole lineage
            # back on the recompute path.
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((rnd, a, b, a + b, cnt))
            if rnd == rounds:
                break  # last merge recorded — the rewrite would never be read
            nxt = vocab.select(
                merge_pair(F.col("sym"), a, b).alias("sym"), "freq"
            ).persist()
            prev, vocab = vocab, nxt
    finally:
        vocab.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_merges(documents: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """(rnd, left_sym, right_sym, merged, cnt) — the first `rounds` BPE
    merges learned from the corpus, in merge order. `rounds` must be small
    vs the distinct-pair count (it is: real vocabularies give millions of
    pairs; the driver query learns 6)."""
    return documents.sparkSession.createDataFrame(
        learn_merges(documents, rounds), _MERGE_SCHEMA
    )


def bpe_encode_stats(
    documents: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    rounds: int = BPE_ROUNDS,
) -> DataFrame:
    """Apply a learned merge list to the corpus and report per-document
    tokenization stats: (doc_id, n_words, n_subwords, fertility).

    Scale plan: the merge chain is O(rounds) string ops **per distinct
    word**, not per token occurrence — the token stream is first collapsed
    to a per-doc word-count table, the encode runs over the (much smaller)
    distinct-word vocabulary, and a single equi-join on the word re-attaches
    subword counts. At web scale the distinct vocabulary is orders of
    magnitude smaller than the token stream, so the expensive regexp work
    never touches the long tail of repeats. Everything is built-in
    functions (whole-stage codegen); no Python crossing.

    Documents with no tokens contribute no rows (consistent with the
    DuckDB twin's inner join on the word table)."""
    if merges is None:
        merges = [(m[1], m[2]) for m in learn_merges(documents, rounds)]
    words = documents.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    wc = words.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("cnt"))
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != "")
    sym = F.concat(F.array_join(chars, " "), F.lit(" </w>"))
    for a, b in merges:
        sym = merge_pair(sym, a, b)
    enc = wc.select("w").distinct().select(
        "w", F.size(F.split(sym, " ")).cast("long").alias("n_sub")
    )
    return (
        wc.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sub")).cast("long").alias("n_subwords"),
        )
        .withColumn(
            "fertility",
            F.round(
                F.col("n_subwords") / F.greatest(F.col("n_words"), F.lit(1)), 6
            ),
        )
    )


def _apply_merge(syms, a: str, b: str) -> list:
    """One greedy left-to-right non-overlapping application of merge
    (a, b) — THE merge kernel, shared by the learn twin and the encode
    twin so an edge-case fix can never desync them."""
    out: list = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


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
            out = _apply_merge(syms, a, b)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def encode_reference(
    text: str, merges: list[tuple[str, str]]
) -> tuple[int, int]:
    """Pure-Python encode twin: (n_words, n_subwords) for one document
    under the given merge list — same marker, same greedy left-to-right
    non-overlapping merge application, in merge order. Tokenization uses
    the engine's EXPLICIT whitespace class (textops.TOKEN_WS_RE): str
    .split() is Unicode-aware and would split 'a\\u00a0b' into two words
    where the engine keeps one."""
    import re

    from .textops import TOKEN_WS_RE

    # the strip set is the literal characters of the class (the pattern
    # string itself holds escape SEQUENCES, so it can't be sliced for
    # strip); stripping more than the engine's space-only F.trim is
    # masked by the `if w` filter, which both sides apply
    words = [w for w in re.split(TOKEN_WS_RE, text.strip(" \t\n\f\r")) if w]
    n_sub = 0
    for w in words:
        syms: list[str] = list(w) + ["</w>"]
        for a, b in merges:
            syms = _apply_merge(syms, a, b)
        n_sub += len(syms)
    return len(words), n_sub
