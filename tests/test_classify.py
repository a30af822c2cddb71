"""nb_classifier — pinned against a pure-Python multinomial NB computed
from first principles (DuckDB twin parity lives in test_entry_parity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from enem_spark.classify import nb_classifier


def _nb_reference(rows):
    toks = {d: t.strip().split() for d, t, _ in rows}
    y = {d: lab for d, _, lab in rows}
    cnt = {}
    for d, ts in toks.items():
        for t in ts:
            pos, neg = cnt.get(t, (0, 0))
            cnt[t] = (pos + (1 if y[d] else 0), neg + (0 if y[d] else 1))
    tot_pos = sum(p for p, _ in cnt.values())
    tot_neg = sum(n for _, n in cnt.values())
    v = len(cnt)
    n_pos = sum(1 for lab in y.values() if lab)
    n_neg = len(y) - n_pos
    prior = math.log((n_pos + 1.0) / (n_neg + 1.0))
    out = {}
    for d, ts in toks.items():
        s = prior
        for t in set(ts):
            p, n = cnt[t]
            lr = math.log((p + 1.0) / (tot_pos + v)) - math.log(
                (n + 1.0) / (tot_neg + v)
            )
            s += ts.count(t) * lr
        out[d] = round(s, 6)
    return out


def test_nb_matches_reference(spark):
    rows = [
        (1, "the cat and the dog", True),
        (2, "the fast cat runs", True),
        (3, "o gato e o cachorro", False),
        (4, "o gato corre rapido", False),
        (5, "the gato mixed bag", True),
        (6, "", False),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_en"])
    got = {
        r.doc_id: (r.score, r.pred)
        for r in nb_classifier(df, label=F.col("is_en")).collect()
    }
    exp = _nb_reference(rows)
    assert set(got) == {1, 2, 3, 4, 5, 6}
    for d in exp:
        assert abs(got[d][0] - exp[d]) < 1e-6, (d, got[d], exp[d])
        assert got[d][1] == (exp[d] > 0)
    # the empty doc scores exactly the prior
    prior = round(math.log(4.0 / 4.0), 6)
    assert got[6][0] == prior
    # a classifier trained on separable classes separates them in-sample
    assert got[1][1] and got[2][1] and not got[3][1] and not got[4][1]


def test_nb_default_label_is_lang_en(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta beta", "en", "s", 15),
            (2, "gamma delta delta", "fr", "s", 17),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = {r.doc_id: r.pred for r in nb_classifier(df).collect()}
    assert got[1] and not got[2]


def test_nb_explode_shuffle_reused(spark):
    """The corpus explode must feed ONE exchange consumed by both the
    vocabulary counts and the per-doc tf table (per_term re-aggregates the
    (doc, y, term) counts): AQE's final plan must contain a ReusedExchange,
    or the heaviest stage (scan + split + explode) runs twice."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("pt")
    )
    out = nb_classifier(docs)
    out.collect()  # finalize the adaptive plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, "explode exchange not shared"
