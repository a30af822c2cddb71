"""Recall / estimation-error guards for the ENGINE-scale LSH config.

The driver parity queries run the tiny PARITY config (8 perms / 4 bands)
because its DuckDB twin must stay tractable; THESE tests are where the real
operating point (128 perms / 16 bands — textops module defaults) earns its
keep: banded recall on planted near-duplicates and sketch-estimate error
against exact Jaccard."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from enem_spark import textops

SF_DIR = "/root/testdata/sf0.01"
N_BASE = 40
COPY_OFFSET = 100_000


def _perturb(text: str, step: int, tag: str) -> str:
    """Replace every `step`-th token with a unique junk token (no RNG)."""
    toks = text.split()
    for i in range(0, len(toks), step):
        toks[i] = f"xqzv{tag}{i}"
    return " ".join(toks)


def _shingle_set(text: str) -> set[str]:
    """Pure-python mirror of textops._shingles (3-gram over \\s+ tokens)."""
    toks = re.split(r"\s+", text.strip())
    if len(toks) < textops.SHINGLE_N:
        return {" ".join(toks)}
    return {
        " ".join(toks[i : i + textops.SHINGLE_N])
        for i in range(len(toks) - textops.SHINGLE_N + 1)
    }


def _jaccard(a: set[str], b: set[str]) -> float:
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus of sf0.01 docs + planted near-dup copies at three similarity
    tiers (step 50 ≈ j>0.9, step 25 ≈ j~0.85, step 6 ≈ j~0.5) and the exact
    Jaccard of every planted pair."""
    base = (
        pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        .sort_values("doc_id")
        .head(N_BASE)
        .reset_index(drop=True)
    )
    rows, truth = [], {}
    for _, r in base.iterrows():
        d, t = int(r["doc_id"]), str(r["text"])
        rows.append({"doc_id": d, "text": t})
        for k, step in enumerate((50, 25, 6)):
            cid = d + COPY_OFFSET * (k + 1)
            ct = _perturb(t, step, f"s{step}x")
            rows.append({"doc_id": cid, "text": ct})
            truth[(d, cid)] = _jaccard(_shingle_set(t), _shingle_set(ct))
    df = spark.createDataFrame(pd.DataFrame(rows))
    return df, truth


def test_engine_config_recall_on_near_dups(spark, planted):
    """128/16 banding: P(candidate | j) = 1-(1-j^8)^16 ≈ 0.95 at j=0.8 —
    recall on planted pairs with exact j >= 0.8 must clear 0.85, and the
    j~0.5 tier must be mostly rejected (the curve's whole point)."""
    df, truth = planted
    found = {
        (r["doc_a"], r["doc_b"])
        for r in textops.minhash_lsh_pairs(df, threshold=0.8).collect()
    }
    high = {p for p, j in truth.items() if j >= 0.8}
    assert len(high) >= 20, f"weak fixture: only {len(high)} high-sim pairs"
    recall = len(found & high) / len(high)
    assert recall >= 0.85, f"recall {recall:.3f} over {len(high)} planted pairs"
    # precision side: nothing the verifier emits may be below the threshold
    low = {p for p, j in truth.items() if j < 0.5}
    assert not (found & low)


def test_estimate_pairs_error_bounded(spark, planted):
    """minhash_estimate_pairs (no shingle verification) must track exact
    Jaccard within sketch noise: std ≈ sqrt(j(1-j)/128) ≈ 0.045."""
    df, truth = planted
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in textops.minhash_estimate_pairs(df, threshold=0.0).collect()
    }
    seen = [(truth[p], est[p]) for p in truth if p in est]
    assert len(seen) >= 40
    errs = [abs(j - e) for j, e in seen]
    assert max(errs) <= 0.2, f"max sketch error {max(errs):.3f}"
    assert sum(errs) / len(errs) <= 0.06, f"mean error {sum(errs)/len(errs):.3f}"


def test_estimate_pairs_plan_has_no_shingle_join(spark, planted):
    """The scale path must never join the shingle table: every join in the
    physical plan keys on band buckets or doc ids only."""
    df, _ = planted
    plan = (
        textops.minhash_estimate_pairs(df, threshold=0.25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert join_lines, "expected band/doc joins in the plan"
    bad = [ln for ln in join_lines if "shingle" in ln]
    assert not bad, f"shingle join leaked into the estimate path:\n{bad}"


def test_incremental_dedup_semantics(spark):
    """Ground truth for the incremental operators: verbatim re-crawls are
    exact dups of their originals; tailed re-crawls are near-dups (high
    estimate, not exact); absent rows produce nothing."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    base = F.col("doc_id") + F.lit(1_000_000)
    exact_new = docs.filter(F.col("doc_id") % 3 == 0).select(
        base.alias("doc_id"), "text"
    )
    near_new = docs.filter(F.col("doc_id") % 3 == 1).select(
        base.alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz1 zz2")).alias("text"),
    )
    new = exact_new.unionByName(near_new)

    got = {
        r["doc_id"]: r["dup_of"]
        for r in textops.incremental_exact_dedup(new, docs).collect()
    }
    expected_exact = {
        r["doc_id"] + 1_000_000: r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 3 == 0).collect()
    }
    assert got == expected_exact  # tailed copies must NOT exact-match

    near = {
        (r["doc_id"], r["dup_of"]): r["est_jaccard"]
        for r in textops.incremental_minhash_dedup(
            new, docs, threshold=0.5
        ).collect()
    }
    # every verbatim copy matches its original with estimate 1.0
    for nid, oid in expected_exact.items():
        assert near.get((nid, oid)) == 1.0, (nid, oid)
    # most tailed copies are found as near-dups of their originals
    tailed = [r["doc_id"] for r in docs.filter(F.col("doc_id") % 3 == 1).collect()]
    hits = sum(1 for d in tailed if (d + 1_000_000, d) in near)
    assert hits >= int(0.8 * len(tailed)), f"{hits}/{len(tailed)} tailed found"


def test_boilerplate_strip_recovers_content(spark):
    """Injecting per-source template chrome and stripping it must return
    every document's ORIGINAL text exactly (order preserved, unique
    content lines never flagged)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    chrome = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("NAVBAR HOME ABOUT "), F.col("source"), F.lit("\n"),
            F.col("text"), F.lit("\n"),
            F.lit("COPYRIGHT "), F.col("source"), F.lit(" ALL RIGHTS"),
        ).alias("text"),
    )
    got = {
        r["doc_id"]: r["text"]
        for r in textops.strip_boilerplate(chrome, min_frac=0.5).collect()
    }
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == orig


def test_pii_scrub_and_decontaminate_semantics(spark):
    """Planted PII must be fully redacted with exact counts; decontamination
    must flag exactly the docs sharing 8-grams with the benchmark slice."""
    import re as _re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    sid = F.col("doc_id").cast("string")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" mail a"), sid, F.lit("@ex.org ip 192.168.1."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(" fone +44 20 7946 0958"),
        ).alias("text"),
    )
    out = textops.pii_scrub(planted).collect()
    assert len(out) == docs.count()
    for r in out:
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1), r["doc_id"]
        assert "<EMAIL>" in r["text"] and "<IP>" in r["text"] and "<PHONE>" in r["text"]
        assert not _re.search(r"@ex\.org|192\.168", r["text"])

    bench = docs.filter(F.col("doc_id") % 50 == 0)
    flagged = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in textops.decontaminate(docs, bench, n=8).collect()
    }
    # ground truth by brute force: a doc is contaminated iff it shares an
    # 8-gram with any benchmark text (benchmark docs always self-match)
    def grams(t: str) -> set[str]:
        toks = _re.split(r"\s+", t.strip())
        return {
            " ".join(toks[i : i + 8]) for i in range(max(0, len(toks) - 7))
        }

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    bench_ids = {r["doc_id"] for r in bench.collect()}
    bench_grams = set().union(*(grams(texts[b]) for b in bench_ids))
    expected = {
        d: len(grams(t) & bench_grams)
        for d, t in texts.items()
        if grams(t) & bench_grams
    }
    assert flagged == expected
    assert bench_ids <= set(flagged)


def test_null_text_doc_keeps_one_empty_shingle(spark):
    """A NULL-text document must not vanish from shingle-derived tables
    (the DuckDB twins emit a row for it): it carries one '' shingle."""
    import pandas as pd
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 1, "text": None}, {"doc_id": 2, "text": "a b c d"}]),
        schema=schema,
    )
    rows = textops.shingle_table(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["shingle"])
    assert by_doc[1] == {""}
    assert by_doc[2] == {"a b c", "b c d"}


def test_url_canonicalization_adversarial_cases(spark):
    """Pin the canonicalization contract on the tricky shapes: params whose
    NAME contains utm_, adjacent utm params, literal '&' in the path, a
    second '?' inside a value, non-http default ports."""
    cases = {
        # path-final '/' strips BEFORE query reassembly: '/?q' == '?q'
        "http://a.com/?id=1&myutm_x=2&foo=1": "http://a.com?id=1&myutm_x=2&foo=1",
        "https://A.com:443/p?utm_a=1&utm_b=2&id=3#f": "https://a.com/p?id=3",
        "http://b.com/p?utm_only=1": "http://b.com/p",
        "https://c.com/p/?utm_a=1&id=2": "https://c.com/p?id=2",
        "ftp://Files.x.com:21/p/9": "ftp://files.x.com:21/p/9",
        "http://h/r&d": "http://h/r&d",
        "http://h/a&b?c=1": "http://h/a&b?c=1",
        "http://h/p?x=a?b&utm_z=1": "http://h/p?x=a?b",
        "HTTP://WWW.E.com:80/P/Q?utm_source=z": "http://www.e.com/P/Q",
        # a query VALUE ending in '/' is data — must survive canonicalization
        "http://h/p?x=/": "http://h/p?x=/",
        # schemeless/malformed urls pass through unchanged (one bad url must
        # not collapse every malformed url into a single '://' dedup key)
        "not a url at all": "not a url at all",
        "www.h.com/p": "www.h.com/p",
    }
    df = spark.createDataFrame(pd.DataFrame({"url": list(cases)}))
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url", textops.canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    assert got == cases


def test_url_canonicalization_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over a generated
    grammar of messy urls — a dedup key must be a fixpoint or re-crawls of
    the canonical form would diverge from it."""
    schemes = ["http://", "HTTPS://", "ftp://"]
    hosts = ["A.com", "www.B.org:443", "c.net:80", "d.io:8080"]
    paths = ["", "/", "/p", "/p/", "/a&b", "/P/Q"]
    queries = [
        "", "?id=1", "?utm_a=1", "?utm_a=1&id=2", "?id=1&utm_b=2&utm_c=3",
        "?myutm=1", "?x=a?b", "?utm_a=1&", "#f", "?id=1#f",
    ]
    urls = [s + h + p + q for s in schemes for h in hosts for p in paths for q in queries]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    once = df.select(textops.canonicalize_url(F.col("url")).alias("url"))
    got_once = [r["url"] for r in once.collect()]
    twice = once.select(textops.canonicalize_url(F.col("url")).alias("url"))
    got_twice = [r["url"] for r in twice.collect()]
    bad = [(u, a, b) for u, a, b in zip(urls, got_once, got_twice) if a != b]
    assert not bad, f"{len(bad)} non-fixpoints; first: {bad[0]}"


def test_sentence_stats_hand_cases(spark):
    """The driver corpus is punctuation-free (1 sentence/doc), so the
    segmentation semantics are pinned here: boundary = punct run + ws,
    empty/NULL -> zeros, unpunctuated text = one sentence."""
    hand = spark.createDataFrame(
        [
            (1, "Uma frase. Outra frase! E mais?  Fim"),
            (2, ""),
            (3, None),
            (4, "sem pontuacao nenhuma"),
            (5, "a.b stays one: no whitespace after the dot"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_sentences"], r["mean_sentence_chars"], r["max_sentence_chars"])
        for r in textops.sentence_stats(hand).collect()
    }
    assert got[1] == (4, 7.25, 11)
    assert got[2] == (0, 0.0, 0)
    assert got[3] == (0, 0.0, 0)
    assert got[4] == (1, 21.0, 21)
    assert got[5][0] == 1  # dot without following whitespace is no boundary


def test_duplicate_spans_hand_cases(spark):
    """Ground truth for the exact-substring (Lee-et-al window) dedup:
    verbatim dup fully covered, within-doc repeat caught, the canonical
    first occurrence never marked, short/NULL docs untouched."""
    w = 4
    hand = spark.createDataFrame(
        [
            (0, "a b c d e f"),                  # canonical source
            (1, "a b c d e f"),                  # verbatim dup of doc 0
            (2, "x y z w"),                      # unique single window
            (3, "a b c d q r s t a b c d"),      # cross-doc + in-doc repeat
            (4, "p q"),                          # shorter than w
            (5, None),                           # NULL text
        ],
        "doc_id long, text string",
    )
    stats = {
        r["doc_id"]: (r["n_tokens"], r["dup_windows"], r["dup_tokens"], r["dup_frac"])
        for r in textops.duplicate_spans(hand, w=w).collect()
    }
    assert stats[0] == (6, 0, 0, 0.0)  # earliest occurrence is canonical
    assert stats[1] == (6, 3, 6, 1.0)  # every window dup -> full coverage
    assert stats[2] == (4, 0, 0, 0.0)
    # doc 3: "a b c d" at pos 0 and pos 8 are non-canonical (doc 0 owns it);
    # interval union covers [0,4) + [8,12) = 8 of 12 tokens
    assert stats[3] == (12, 2, 8, round(8 / 12, 6))
    assert stats[4] == (2, 0, 0, 0.0)
    assert stats[5] == (1, 0, 0, 0.0)  # NULL -> one empty token, no window

    clean = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in textops.remove_duplicate_spans(hand, w=w).collect()
    }
    assert clean[0] == ("a b c d e f", 6, 0)
    assert clean[1] == ("", 0, 6)  # fully duplicated -> empty survivor
    assert clean[3] == ("q r s t", 4, 8)
    assert clean[4] == ("p q", 2, 0)
    assert clean[5] == ("", 1, 0)  # the empty token survives


def test_duplicate_spans_plan_no_cartesian(spark):
    """Both span-dedup plans must stay equi-join only (hash/doc keys)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (
        textops.duplicate_spans(docs, w=textops.PARITY_SPAN_W),
        textops.remove_duplicate_spans(docs, w=textops.PARITY_SPAN_W),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_crawl_url_filter_hand_cases(spark):
    """First-match-wins rule chain of the frontier filter."""
    cases = [
        (0, "https://ok.example.com/a/b/1", True, "ok"),
        (1, "ftp://files.x.com/1", False, "scheme"),
        (2, "https://ads.example.com/c", False, "blocked_host"),
        (3, "http://my.tracker.net:8080/x", False, "blocked_host"),
        (4, "https://x.com/img/photo.JPG", False, "binary_ext"),
        (5, "https://x.com/a/b/c/d/e/f/g/h/i/j", False, "deep_path"),
        (6, "https://x.com/s?q=" + "x" * 200, False, "long_query"),
        (7, "https://x.com/" + "y" * 600, False, "long_url"),
        # ext check beats path depth; uppercase scheme still passes
        (8, "HTTPS://x.com/a/b/c/d/e/f/g/h/i/pic.png", False, "binary_ext"),
        # dotted final segment with non-listed ext is fine
        (9, "https://x.com/page.html", True, "ok"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _, _ in cases], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: (r["keep"], r["reason"])
        for r in textops.crawl_url_filter(df).collect()
    }
    for i, _, keep, reason in cases:
        assert got[i] == (keep, reason), (i, got[i], keep, reason)


def test_url_normalize_hand_cases(spark):
    """Every normalization rule, one hand case each."""
    cases = [
        # lowercase scheme+host, drop :443, drop fragment, strip utm_*,
        # sort survivors
        (0, "HTTPS://WWW.Example.COM:443/Path/1?utm_source=x&b=2&a=1#frag",
         "https://www.example.com/Path/1?a=1&b=2"),
        # :80 dropped for http, empty path -> '/', empty param dropped
        (1, "http://h.example.com:80?z=1&utm_campaign=s&&y=2",
         "http://h.example.com/?y=2&z=1"),
        # all params tracking -> no '?'
        (2, "https://h.com/a/1?gclid=abc", "https://h.com/a/1"),
        # non-http passthrough VERBATIM
        (3, "ftp://Files.x.com/1", "ftp://Files.x.com/1"),
        # '?' inside the fragment is not a query
        (4, "https://h.com/b/1#sec?notaquery", "https://h.com/b/1"),
        # duplicate names sort byte-wise; :443 kept on http (not default)
        (5, "http://h.com:443/c?b=2&a=1&a=0", "http://h.com:443/c?a=0&a=1&b=2"),
        # path casing preserved, non-default port preserved
        (6, "https://H.com:8443/CaSe", "https://h.com:8443/CaSe"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: r["canon_url"]
        for r in textops.url_normalize(df).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)
    # idempotence: canonicalizing the canonical form is a no-op
    df2 = spark.createDataFrame(
        [(i, c) for i, c in got.items()], "doc_id long, url string"
    )
    got2 = {
        r["doc_id"]: r["canon_url"]
        for r in textops.url_normalize(df2).collect()
    }
    assert got2 == got


def test_url_normalize_idempotent_and_total_on_junk(spark):
    """Property sweep in ONE Spark job: for a pile of adversarial URL-ish
    strings, canonicalization never raises, never yields NULL, and is
    idempotent (canon(canon(x)) == canon(x))."""
    junk = [
        "https://h.com/??a=1?b=2",  # '?' inside the query stays literal
        "http://h.com#?",  # fragment-only, empty path
        "HTTP://H.COM:80:80/x",  # malformed double port
        "https://:443/x",  # empty host
        "http:///path",  # empty host, path only
        "https://h.com/a?&&&",  # only empty params
        "https://h.com/a?utm_source=&ref",  # tracking with/without '='
        "noscheme/just/a/path",
        "://bare",
        "",
        "https://h.com/%20?b<>=|&a=^",  # unencoded junk chars
        "ftp://x/../y?utm_source=keepme",  # non-http: verbatim, params kept
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(junk)], "doc_id long, url string"
    )
    once = textops.url_normalize(df)
    rows1 = {r["doc_id"]: r["canon_url"] for r in once.collect()}
    assert all(v is not None for v in rows1.values())
    again = textops.url_normalize(
        spark.createDataFrame(
            [(i, c) for i, c in rows1.items()], "doc_id long, url string"
        )
    )
    rows2 = {r["doc_id"]: r["canon_url"] for r in again.collect()}
    assert rows2 == rows1
    # the non-http rows really are verbatim
    for i, u in enumerate(junk):
        if not u.lower().startswith("http"):
            assert rows1[i] == u


def test_cap_per_host_quota_and_determinism(spark):
    from enem_spark import textops

    docs = spark.createDataFrame(
        [(i, f"texto unico {i}", f"h{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    out = textops.cap_per_host(docs, cap=3).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert set(by_host) == {"h0", "h1", "h2"}
    for host, rows in by_host.items():
        assert len(rows) == 3
        assert sorted(r["host_rank"] for r in rows) == [1, 2, 3]
    # deterministic: a second run picks the identical doc set
    again = {(r["doc_id"], r["host_rank"]) for r in textops.cap_per_host(docs, cap=3).collect()}
    assert again == {(r["doc_id"], r["host_rank"]) for r in out}
    # a host with fewer docs than the cap keeps everything
    small = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")],
        "doc_id long, text string, source string",
    )
    got = textops.cap_per_host(small, cap=5).count()
    assert got == 3
