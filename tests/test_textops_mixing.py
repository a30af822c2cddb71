"""doc_chunk / mixture_sample / dsir_weights — semantics + plan guards.

The DuckDB value parity for all three lives in test_entry_parity; these
tests pin the properties the parity hash can't see: chunk coverage/overlap
invariants, the zero-shuffle chunk plan, the exact waterfill rate, and the
sign of the DSIR signal (target-language docs must score above the rest).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enem_spark import textops

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_doc_chunk_covers_every_token(spark):
    texts = [
        ("a", " ".join(f"t{i}" for i in range(100))),  # 100 toks -> 4 chunks
        ("b", "solo"),  # short doc -> exactly one chunk
        ("c", " ".join(f"u{i}" for i in range(32))),  # == window -> one chunk
        ("d", " ".join(f"v{i}" for i in range(33))),  # window+1 -> two chunks
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    rows = textops.doc_chunk(df).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert {d: len(v) for d, v in by_doc.items()} == {
        "a": 4, "b": 1, "c": 1, "d": 2
    }
    for doc_id, text in texts:
        toks = text.split()
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        # chunk i starts at i*stride and is clamped at end-of-doc
        for r in chunks:
            start = r.chunk_id * textops.CHUNK_STRIDE
            expect = toks[start : start + textops.CHUNK_WINDOW]
            assert r.chunk_text.split() == expect
            assert r.n_tokens == len(expect)
        # union of chunks covers every token position
        covered = set()
        for r in chunks:
            s = r.chunk_id * textops.CHUNK_STRIDE
            covered.update(range(s, s + r.n_tokens))
        assert covered == set(range(len(toks)))


def test_doc_chunk_plan_has_no_shuffle(documents):
    """Chunking is pure map work: tokenize once, explode, slice. Any
    Exchange in this plan is a regression that turns a pipelined narrow
    stage into a crawl-scale shuffle."""
    plan = (
        textops.doc_chunk(documents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_mixture_sample_waterfills_to_smallest_stratum(documents):
    # stratify on lang: the sf sources are equal-sized by construction
    # (waterfill = identity there); the language mix is ~3:1 skewed
    kept = textops.mixture_sample(documents, strata_col="lang").groupBy(
        "stratum"
    ).count()
    sizes = {
        r["lang"]: r["c"]
        for r in documents.groupBy("lang").agg(
            F.count("*").alias("c")
        ).collect()
    }
    min_c = min(sizes.values())
    got = {r.stratum: r["count"] for r in kept.collect()}
    # every stratum is present and lands near min_c; the smallest stratum
    # is kept whole (its rate is exactly 1.0 by the integer cross-multiply)
    assert set(got) == set(sizes)
    for s, c in sizes.items():
        if c == min_c:
            assert got[s] == min_c
        # binomial(c, min_c/c): allow a wide deterministic-lottery band
        assert got[s] <= c
        assert abs(got[s] - min_c) < 4 * (min_c**0.5) + 2, (s, got[s], min_c)


def _group_means(scored_docs):
    return {
        r.grp: r.m
        for r in scored_docs.groupBy(
            F.when(F.col("lang") == "en", "target").otherwise("rest").alias("grp")
        )
        .agg(F.avg("dsir_weight").alias("m"))
        .collect()
    }


def test_dsir_weights_rank_target_language_higher(documents):
    # the sf corpus's languages share most vocabulary, so only the ORDERING
    # is asserted here; the margin is pinned on a disjoint-vocab corpus below
    scored = textops.dsir_weights(documents, target_lang="en").join(
        documents.select("doc_id", "lang"), "doc_id"
    )
    means = _group_means(scored)
    assert means["target"] > means["rest"], means


def test_dsir_weights_separate_disjoint_vocabularies(spark):
    rows = []
    for i in range(40):
        rows.append((i, " ".join(f"en{j}" for j in range(i % 7, i % 7 + 20)), "en"))
        rows.append(
            (100 + i, " ".join(f"xx{j}" for j in range(i % 7, i % 7 + 20)), "zz")
        )
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    scored = textops.dsir_weights(df, target_lang="en").join(
        df.select("doc_id", "lang"), "doc_id"
    )
    means = _group_means(scored)
    # disjoint vocab: rest docs are strongly penalized; target docs sit
    # above parity by ln((2T+B)/(T+B)) — compressed toward 0 by the add-one
    # smoothing when the corpus is tiny vs the 4096 buckets, hence the
    # asymmetric thresholds
    assert means["target"] > 0.1, means
    assert means["rest"] < -1.0, means


def test_train_split_duplicates_share_split_and_bands_hold(spark):
    rows = [(i, f"document body {i}") for i in range(300)]
    rows += [(1000 + i, f"document body {i}") for i in range(300)]  # dups
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.split for r in textops.train_split(df).collect()}
    assert len(got) == 600
    # byte-identical text => identical split (no cross-split leakage)
    for i in range(300):
        assert got[i] == got[1000 + i]
    # every band populated, train dominates at 10/10 band widths
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]
    # pure function of the row: a rerun agrees row-for-row
    again = {r.doc_id: r.split for r in textops.train_split(df).collect()}
    assert again == got


def test_unicode_normalize_kernel_and_operator(spark):
    import duckdb

    cases = [
        (0, "plain ascii"),
        (1, "e\u0301 decomposed acute"),          # NFC -> single codepoint
        (2, "a\r\nb\rc"),                        # newline canonicalization
        (3, "x\u200by\ufeffz\u0007!"),           # zero-widths + control
        (4, "tab\tand\nnewline kept"),
        (5, None),
    ]
    df = spark.createDataFrame(cases, ["doc_id", "text"])
    got = {r.doc_id: r for r in textops.unicode_normalize(df).collect()}
    assert len(got) == 6
    assert got[0].changed is False and got[0].n_before == got[0].n_after
    assert got[1].changed is True and got[1].n_after == got[1].n_before - 1
    k = textops.normalize_text_py
    assert k("a\r\nb\rc") == "a\nb\nc"
    assert k("x\u200by\ufeffz\u0007!") == "xyz!"
    assert got[3].n_after == 4
    assert got[4].changed is False
    assert got[5].norm_md5 is None and got[5].changed is None
    # cross-engine NFC agreement on the tricky rows (utf8proc vs unicodedata)
    for _, t in cases:
        if t is None:
            continue
        duck = duckdb.sql(
            "SELECT md5(regexp_replace(regexp_replace(regexp_replace("
            "nfc_normalize(?), '\r\n', chr(10), 'g'), '\r', chr(10), 'g'),"
            "'[\\x{0001}-\\x{0008}\\x{000b}\\x{000c}\\x{000e}-\\x{001f}"
            "\\x{007f}-\\x{009f}\\x{200b}\\x{200c}\\x{200d}\\x{feff}]',"
            " '', 'g'))", params=[t]).fetchone()[0]
        import hashlib
        assert duck == hashlib.md5(k(t).encode()).hexdigest(), t


def test_unicode_normalize_plan_one_arrow_crossing_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    plan = textops.unicode_normalize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "Exchange" not in plan, plan


def test_unicode_normalize_hypothesis_differential():
    """Property: the Python kernel and the DuckDB twin expression agree on
    arbitrary text -- combining marks, CRLF soup, controls, zero-widths.
    (No Spark: this pins the two normalization libraries against each
    other, the scanner-differential discipline.)"""
    import duckdb
    import hashlib
    from hypothesis import given, settings, strategies as st

    con = duckdb.connect()
    expr = (
        "SELECT md5(regexp_replace(regexp_replace(regexp_replace("
        "nfc_normalize(?), '\\r\\n', chr(10), 'g'), '\\r', chr(10), 'g'),"
        "'[\\x{0001}-\\x{0008}\\x{000b}\\x{000c}\\x{000e}-\\x{001f}"
        "\\x{007f}-\\x{009f}\\x{200b}\\x{200c}\\x{200d}\\x{feff}]', '', 'g'))"
    )
    # exclude NUL (VARCHAR cannot carry it) and surrogates (not valid text)
    alphabet = st.characters(
        min_codepoint=1, max_codepoint=0x2FFF, exclude_categories=("Cs",)
    )
    spice = st.sampled_from(
        ["e\u0301", "\r\n", "\r", "\u200b", "\ufeff", "\u0007", "a\u030a", "\t"]
    )
    texts = st.lists(
        st.one_of(st.text(alphabet, max_size=6), spice), max_size=12
    ).map("".join)

    @settings(max_examples=300, deadline=None)
    @given(texts)
    def check(t):
        duck = con.execute(expr, [t]).fetchone()[0]
        mine = hashlib.md5(textops.normalize_text_py(t).encode()).hexdigest()
        assert duck == mine, repr(t)

    check()


def test_token_budget_select_equals_global_greedy_prefix(documents):
    """The two-phase bucket cut must select EXACTLY the docs a naive global
    (quality desc, doc_id) sort + running-sum prefix would — bucketing is a
    scale optimization, never a semantic change."""
    budget = 8000
    feats = textops.quality_score(documents).select(
        "doc_id", "n_tokens", "quality"
    )
    rows = sorted(
        feats.collect(), key=lambda r: (-r.quality, r.doc_id)
    )
    total, expect = 0, set()
    for r in rows:
        if total + r.n_tokens > budget:
            break
        total += r.n_tokens
        expect.add(r.doc_id)
    got = textops.token_budget_select(documents, budget_tokens=budget)
    got_rows = got.collect()
    assert {r.doc_id for r in got_rows} == expect
    assert sum(r.n_tokens for r in got_rows) <= budget


def test_token_budget_select_budget_exceeds_corpus(documents):
    got = textops.token_budget_select(documents, budget_tokens=10**12)
    assert got.count() == documents.count()


def test_token_budget_select_no_global_sort_over_docs(documents):
    """The only unpartitioned window may run over the <=1000-row histogram;
    the per-doc frames must never funnel through a single sort partition.
    Guard: every Window node that orders by quality is partitioned by qb."""
    plan = (
        textops.token_budget_select(documents, budget_tokens=8000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re as _re

    doc_windows = _re.findall(r"Window \[sum\(n_tokens[^\]]*\], \[([^\]]*)\]", plan)
    assert doc_windows, plan[:2000]
    for spec in doc_windows:
        assert "qb" in spec, plan[:2000]


def test_compression_ratio_orders_junk_below_prose(spark):
    rows = [
        ("junk", "spam spam spam " * 200),
        ("prose", " ".join(f"w{i}x{i * 7 % 13}" for i in range(600))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in textops.compression_ratio(df).collect()}
    assert got["junk"].comp_ratio < 0.1 < got["prose"].comp_ratio
    # kernel identity: the UDF is the same function the oracle stages
    assert got["junk"].z_bytes == textops.compression_len_py(rows[0][1])
    assert got["junk"].n_bytes == len(rows[0][1].encode("utf-8"))


def test_compression_ratio_plan_one_arrow_crossing_no_shuffle(documents):
    plan = (
        textops.compression_ratio(documents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_curate_and_stats_keep_null_text_documents(spark):
    """md5(NULL) is NULL and NULL join keys never match — without the
    coalesce-to-'' a NULL-text document silently VANISHED from the
    keep-list, breaking the every-document audit contract; source_stats
    similarly under-counted n_distinct."""
    from pyspark.sql import Row

    from enem_spark import textops

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="good text with many many tokens here " * 5, source="a"),
            Row(doc_id=2, text=None, source="a"),
        ],
        "doc_id long, text string, source string",
    )
    out = textops.corpus_curate(docs).collect()
    assert sorted(r.doc_id for r in out) == [1, 2]
    stats = textops.source_stats(docs).collect()
    assert stats[0].n_docs == 2 and stats[0].n_distinct == 2


def test_dedup_clusters_long_chain(spark):
    """Path-graph regression for the pointer-jumping propagation: doc i
    overlaps doc i+1 at jaccard 0.6 (5 of 6+... sliding 6-token windows,
    stride 1) but doc i vs i+2 only 0.33, and 1-row bands (perms=bands=8)
    surface every consecutive pair — so the near-dup graph is EXACTLY an
    11-edge path (diameter 11). All 12 docs must collapse to cluster 0 in
    the 64-round cap (plain propagation walks 11 rounds; pointer jumping
    ~4), and the edge set itself is pinned so a future LSH-parameter
    change that silently breaks the chain fails loudly here."""
    from enem_spark import textops

    n = 12
    stream = [f"tok{j:03d}" for j in range(2 * n + 8)]
    docs = spark.createDataFrame(
        [(i, " ".join(stream[i : i + 6])) for i in range(n)],
        "doc_id long, text string",
    )
    pairs = sorted(
        (r["doc_a"], r["doc_b"])
        for r in textops.minhash_lsh_pairs(
            docs, threshold=0.55, perms=8, bands=8
        ).collect()
    )
    assert pairs == [(i, i + 1) for i in range(n - 1)]
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in textops.dedup_clusters(docs, 0.55, 8, 8).collect()
    }
    assert got == {i: 0 for i in range(n)}
    spark.catalog.clearCache()


def test_script_detect_branches(spark):
    """Every SCRIPT_RULES branch + unknown + mixed-tie behavior, against
    hand-computed counts."""
    import pandas as pd

    from enem_spark.textops import SCRIPT_RULES, script_detect

    rows = [
        {"doc_id": i, "text": s * 3}
        for i, (_n, _c, s) in enumerate(SCRIPT_RULES)
    ]
    rows.append({"doc_id": 100, "text": "12345 --- !!!"})
    rows.append({"doc_id": 101, "text": None})
    # tie: one han char vs one hangul char -> alphabetical first (han)
    rows.append({"doc_id": 102, "text": "你 안"})
    out = {
        r["doc_id"]: r
        for r in script_detect(
            spark.createDataFrame(pd.DataFrame(rows))
        ).collect()
    }
    for i, (name, _c, _s) in enumerate(SCRIPT_RULES):
        assert out[i]["script"] == name, (i, name, out[i])
        assert out[i]["script_frac"] >= 0.75  # spaces excluded from letters
    assert out[100]["script"] == "unknown" and out[100]["n_letter_chars"] == 0
    assert out[101]["script"] == "unknown"
    assert out[102]["script"] == "han" and out[102]["n_script_chars"] == 1
