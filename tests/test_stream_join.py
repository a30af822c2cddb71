"""Stream-stream interval join: the two-live-streams correlation primitive
(watermarks on BOTH sides + an event-time-bounded condition => expirable
state). Ground truth is the BATCH relops.range_join over the same rows —
the operators implement the same half-open containment, so the streaming
catch-up must land exactly the batch pair set."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from enem_spark import relops, streaming as st

TOL_S = 3600
EPOCH = pd.Timestamp("2024-01-01 00:00:00")

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
    ]
)
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("robots_ts", T.TimestampType()),
        T.StructField("directive", T.StringType()),
    ]
)


def _pages_pdf():
    rows = []
    for h in range(3):
        for i in range(8):
            rows.append(
                {
                    "host": f"h{h}.example.org",
                    "url": f"https://h{h}.example.org/p/{i}",
                    "warc_ts": EPOCH + pd.Timedelta(minutes=13 * i + 7 * h),
                }
            )
    return pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])


def _robots_pdf():
    rows = []
    for h in range(3):
        for j in range(3):
            rows.append(
                {
                    "host": f"h{h}.example.org",
                    "robots_ts": EPOCH + pd.Timedelta(minutes=45 * j + 3 * h),
                    "directive": f"rule-{h}-{j}",
                }
            )
    # one host with robots but no pages: inner semantics drop it
    rows.append(
        {
            "host": "lonely.example.org",
            "robots_ts": EPOCH,
            "directive": "rule-lonely",
        }
    )
    return pd.DataFrame(rows, columns=[f.name for f in ROBOTS_SCHEMA.fields])


def _expected_pairs():
    out = set()
    for _, p in _pages_pdf().iterrows():
        for _, r in _robots_pdf().iterrows():
            if p["host"] != r["host"]:
                continue
            if (
                r["robots_ts"] <= p["warc_ts"]
                < r["robots_ts"] + pd.Timedelta(seconds=TOL_S)
            ):
                out.add((p["url"], r["directive"]))
    return out


def test_stream_interval_join_matches_batch_range_join(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    robots_dir = str(tmp_path / "robots")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(_pages_pdf(), schema=PAGES_SCHEMA).coalesce(
        2
    ).write.parquet(pages_dir)
    spark.createDataFrame(_robots_pdf(), schema=ROBOTS_SCHEMA).coalesce(
        1
    ).write.parquet(robots_dir)

    joined = st.stream_interval_join(
        spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir),
        spark.readStream.schema(ROBOTS_SCHEMA).parquet(robots_dir),
        key="host",
        left_ts="warc_ts",
        right_ts="robots_ts",
        tolerance_s=TOL_S,
    )
    q = (
        joined.select("url", "directive")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["url"], r["directive"])
        for r in spark.read.parquet(out).collect()
    }

    # pure-python expectation AND the batch range_join both agree
    exp = _expected_pairs()
    assert got == exp and len(exp) > 10

    points = spark.createDataFrame(_pages_pdf(), schema=PAGES_SCHEMA)
    intervals = (
        spark.createDataFrame(_robots_pdf(), schema=ROBOTS_SCHEMA)
        .withColumn("start_ts", F.col("robots_ts"))
        .withColumn(
            "end_ts", F.col("robots_ts") + F.expr(f"INTERVAL {TOL_S} SECONDS")
        )
        .drop("robots_ts")
    )
    batch = relops.range_join(
        points, intervals, on=["host"], point_ts="warc_ts"
    )
    batch_pairs = {
        (r["url"], r["directive"]) for r in batch.collect()
    }
    assert batch_pairs == exp
