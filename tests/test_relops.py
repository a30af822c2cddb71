"""relops (as-of join, range join) + the HLL sketch: value equivalence
against brute-force references, the estimator's accuracy at the ENGINE
config (the driver twin checks only the tiny parity config), and the plan
shapes that make these the scale paths (no inequality-join fallback, one
shuffle for asof)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from enem_spark import relops, textops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def views(events):
    return events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )


@pytest.fixture(scope="module")
def clicks(events):
    # one row per (user_id, ts): the determinism contract callers keep
    # when tie-breaks matter (q_asof_join does the same)
    return (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("click_id"),
            F.round(F.max("value"), 6).alias("click_value"),
        )
    )


def test_asof_join_matches_merge_asof(views, clicks):
    got = (
        relops.asof_join(views, clicks, on=["user_id"])
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    lv = views.toPandas().sort_values("ts")
    rc = clicks.toPandas().rename(columns={"ts": "asof_ts"}).sort_values("asof_ts")
    want = (
        pd.merge_asof(
            lv, rc, left_on="ts", right_on="asof_ts",
            by="user_id", direction="backward",
        )
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_equal_ts_matches(spark):
    # a right row AT the left timestamp must match ("<=", not "<")
    l = spark.createDataFrame([(1, 100, "a")], "k int, t int, lv string")
    r = spark.createDataFrame(
        [(1, 100, "x"), (1, 99, "y")], "k int, t int, rv string"
    )
    row = relops.asof_join(l, r, on=["k"], left_ts="t", right_ts="t").collect()[0]
    assert row["rv"] == "x" and row["asof_ts"] == 100


def test_asof_join_tolerance_nulls_stale_matches(views, clicks):
    tight = relops.asof_join(
        views, clicks, on=["user_id"], tolerance_s=3600
    ).toPandas()
    loose = relops.asof_join(views, clicks, on=["user_id"]).toPandas()
    # rows are preserved, only stale matches are nulled
    assert len(tight) == len(loose)
    m = tight[tight.asof_ts.notna()]
    assert ((m.ts - m.asof_ts).dt.total_seconds() <= 3600).all()
    assert m.asof_ts.notna().sum() <= loose.asof_ts.notna().sum()


def test_asof_join_plan_one_exchange_no_nested_loop(events, views):
    # shuffle-free right side so the count isolates the operator's own
    # exchange (a pre-aggregated right adds its groupBy exchange upstream)
    raw_clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    plan = (
        relops.asof_join(views, raw_clicks, on=["user_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the whole operator costs ONE hash exchange (on the key) — the union
    # and window reuse it
    assert plan.count("Exchange hashpartitioning") == 1


def _intervals(events, win_s):
    return events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr(f"INTERVAL {win_s} SECONDS")).alias("end_ts"),
    )


@pytest.mark.parametrize("bucket_s", [120, 3600, 86400])
def test_range_join_matches_inequality_join(events, bucket_s):
    # window longer AND shorter than the bucket, plus a huge bucket
    iv = _intervals(events, 3600)
    pts = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    got = sorted(
        map(
            repr,
            relops.range_join(pts, iv, on=["user_id"], bucket_s=bucket_s)
            .select("error_id", "ts", "value")
            .toPandas()
            .itertuples(index=False),
        )
    )
    want = sorted(
        map(
            repr,
            iv.join(pts, "user_id")
            .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
            .select("error_id", "ts", "value")
            .toPandas()
            .itertuples(index=False),
        )
    )
    assert got == want and len(got) > 0


def test_range_join_end_exclusive(spark):
    iv = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "iid int, k int, s string, e string",
    ).select(
        "iid", "k",
        F.col("s").cast("timestamp").alias("start_ts"),
        F.col("e").cast("timestamp").alias("end_ts"),
    )
    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 01:00:00")], "k int, t string"
    ).select("k", F.col("t").cast("timestamp").alias("ts"))
    got = relops.range_join(
        pts, iv, on=["k"], point_ts="ts", bucket_s=3600
    ).select("ts").collect()
    assert len(got) == 1 and got[0]["ts"].minute == 0 and got[0]["ts"].hour == 0


def test_range_join_plan_no_nested_loop(events):
    iv = _intervals(events, 3600)
    pts = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    plan = (
        relops.range_join(pts, iv, on=["user_id"], bucket_s=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hll_accuracy_engine_config(spark):
    # engine config p=12 (4096 registers): rel error must be well inside
    # 3 * 1.04/sqrt(4096) ≈ 4.9% on real vocabulary counts
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        "source", F.explode(textops._tokens(F.col("text"))).alias("tok")
    )
    est = textops.hll_distinct(toks, ["source"], "tok", p=12).toPandas()
    exact = (
        toks.groupBy("source")
        .agg(F.countDistinct("tok").alias("d"))
        .toPandas()
    )
    j = est.set_index("source").join(exact.set_index("source"))
    rel = ((j.approx_distinct - j.d).abs() / j.d).max()
    assert rel < 0.049, f"HLL rel error {rel:.4f} at p=12"


def test_hll_small_range_linear_counting(spark):
    # 150 distinct users in 64 registers lands in the linear-counting
    # branch; the estimate must still be close (3-sigma-ish bound)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    est = textops.hll_distinct(
        ev.select(F.col("event_type").alias("grp"), F.col("user_id").alias("v")),
        ["grp"], "v", p=textops.PARITY_HLL_P,
    ).toPandas()
    exact = (
        ev.groupBy(F.col("event_type").alias("grp"))
        .agg(F.countDistinct("user_id").alias("d"))
        .toPandas()
    )
    j = est.set_index("grp").join(exact.set_index("grp"))
    rel = ((j.approx_distinct - j.d).abs() / j.d).max()
    assert rel < 0.2, f"linear-counting rel error {rel:.4f}"


def test_hll_register_memory_is_bounded(spark):
    # the whole point: per group at most m register rows reach the final
    # aggregate, however many values flow through
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        "source", F.explode(textops._tokens(F.col("text"))).alias("tok")
    )
    m = 1 << textops.PARITY_HLL_P
    regs = textops._hll_registers(toks, ["source"], F.col("tok"), m)
    per_group = regs.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    assert per_group <= m


def test_range_join_fractional_end_covers_boundary_bucket(spark):
    # end_ts = 02:00:00.4 covers instants in [02:00:00, 02:00:00.4) — the
    # bucket AFTER the truncated end second; a point at 02:00:00.1 must
    # match (unix_timestamp truncation would otherwise drop the end bucket)
    iv = spark.createDataFrame(
        [(1, 1, "2024-01-01 01:00:00.4", "2024-01-01 02:00:00.4")],
        "iid int, k int, s string, e string",
    ).select(
        "iid", "k",
        F.col("s").cast("timestamp").alias("start_ts"),
        F.col("e").cast("timestamp").alias("end_ts"),
    )
    pts = spark.createDataFrame(
        [(1, "2024-01-01 02:00:00.1"), (1, "2024-01-01 02:00:00.5")],
        "k int, t string",
    ).select("k", F.col("t").cast("timestamp").alias("ts"))
    got = relops.range_join(pts, iv, on=["k"], bucket_s=3600).select("ts").collect()
    assert len(got) == 1 and got[0]["ts"].microsecond == 100000


def test_range_join_inverted_interval_yields_nothing(spark):
    # a corrupt end-before-start row must produce zero pairs, not a
    # descending-sequence fan-out of junk bucket rows
    iv = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "2023-12-01 00:00:00")],
        "iid int, k int, s string, e string",
    ).select(
        "iid", "k",
        F.col("s").cast("timestamp").alias("start_ts"),
        F.col("e").cast("timestamp").alias("end_ts"),
    )
    pts = spark.createDataFrame(
        [(1, "2023-12-15 00:00:00")], "k int, t string"
    ).select("k", F.col("t").cast("timestamp").alias("ts"))
    assert relops.range_join(pts, iv, on=["k"], bucket_s=600).count() == 0


def test_range_join_wide_interval_matches_via_fallback(spark):
    # a legitimate window wider than RANGE_JOIN_MAX_BUCKETS buckets (2 years
    # at bucket_s=60 ≈ 1.05M) must still match its points — through the
    # non-exploded fallback join, never a 1M-element sequence explode
    iv = spark.createDataFrame(
        [(1, 1, "2022-01-01 00:00:00", "2024-01-01 00:00:00"),
         (2, 1, "2023-06-01 00:00:00", "2023-06-01 01:00:00")],
        "iid int, k int, s string, e string",
    ).select(
        "iid", "k",
        F.col("s").cast("timestamp").alias("start_ts"),
        F.col("e").cast("timestamp").alias("end_ts"),
    )
    pts = spark.createDataFrame(
        [(1, "2023-06-01 00:30:00"), (1, "2025-01-01 00:00:00")],
        "k int, t string",
    ).select("k", F.col("t").cast("timestamp").alias("ts"))
    got = sorted(
        (r["iid"], str(r["ts"]))
        for r in relops.range_join(pts, iv, on=["k"], bucket_s=60).collect()
    )
    # the in-window point pairs with BOTH the wide and the narrow interval;
    # the out-of-window point matches nothing
    assert got == [(1, "2023-06-01 00:30:00"), (2, "2023-06-01 00:30:00")]


def test_asof_tolerance_exact_to_the_microsecond(spark):
    # staleness 3600.5 s vs tolerance 3600: must be nulled (second-level
    # truncation would keep it)
    l = spark.createDataFrame([(1, "2024-01-01 02:00:00.9", "a")],
                              "k int, t string, lv string").select(
        "k", F.col("t").cast("timestamp").alias("ts"), "lv")
    r = spark.createDataFrame([(1, "2024-01-01 01:00:00.4", "x")],
                              "k int, t string, rv string").select(
        "k", F.col("t").cast("timestamp").alias("ts"), "rv")
    row = relops.asof_join(l, r, on=["k"], tolerance_s=3600).collect()[0]
    assert row["asof_ts"] is None and row["rv"] is None
    row2 = relops.asof_join(l, r, on=["k"], tolerance_s=3601).collect()[0]
    assert row2["rv"] == "x"


def test_relops_reserved_and_shared_name_guards(spark, events, views, clicks):
    with pytest.raises(ValueError, match="asof_join internals"):
        relops.asof_join(
            views.withColumn("asof_ts", F.col("ts")), clicks, on=["user_id"]
        )
    with pytest.raises(ValueError, match="shared by points and intervals"):
        relops.range_join(
            events.select("user_id", "ts", "value"),
            _intervals(events, 3600).withColumn("value", F.lit(1.0)),
            on=["user_id"],
        )


def test_qsketch_within_one_subbin_of_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    est = textops.quantile_sketch(docs, ["source"], "n_chars").toPandas()
    exact = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("0.5"),
        F.expr("percentile(n_chars, 0.9)").alias("0.9"),
        F.expr("percentile(n_chars, 0.99)").alias("0.99"),
    ).toPandas().set_index("source")
    piv = est.pivot(index="source", columns="q", values="q_est")
    for q in (0.5, 0.9, 0.99):
        ratio = piv[q] / exact[str(q)]
        # lower-edge estimate: within one sub-bin (12.5%) below, and the
        # ceil-rank pick can sit at most a hair above the interpolated exact
        assert (ratio > 1 - 2 ** -textops.QSKETCH_SUB_BITS).all(), (q, ratio.min())
        assert (ratio < 1 + 2 ** -textops.QSKETCH_SUB_BITS).all(), (q, ratio.max())


def test_qsketch_merge_equals_whole(spark):
    # the property that makes it a sketch: per-shard histograms summed ==
    # one histogram over the union, so quantiles agree exactly
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    whole = sorted(
        map(tuple, textops.quantile_sketch(docs, ["source"], "n_chars")
            .toPandas().itertuples(index=False))
    )
    h1 = textops.qsketch_hist(docs.filter(F.col("doc_id") % 2 == 0), ["source"], "n_chars")
    h2 = textops.qsketch_hist(docs.filter(F.col("doc_id") % 2 == 1), ["source"], "n_chars")
    merged = h1.unionByName(h2).groupBy("source", "bin_id").agg(F.sum("n").alias("n"))
    got = sorted(
        map(tuple, textops.qsketch_quantiles(merged, ["source"])
            .toPandas().itertuples(index=False))
    )
    assert got == whole


def test_qsketch_state_is_bounded(spark):
    # sketch state per group is tiny however many rows flow through:
    # bin ids are <= 64 octaves * 2^sub_bits
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    hist = textops.qsketch_hist(docs, ["source"], "n_chars")
    mx = hist.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    assert mx <= 64 * (1 << textops.QSKETCH_SUB_BITS)
