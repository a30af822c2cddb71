"""Sitemap parsing + crawl discovery: parse fidelity, known-set
classification, and the new-first/changefreq/recency ranking."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from enem_spark import htmlops


def test_parse_extracts_every_entry(spark):
    hosts = spark.createDataFrame([Row(host="h1"), Row(host="h2")])
    parsed = htmlops.sitemap_parse(htmlops.synth_sitemaps(hosts)).collect()
    assert len(parsed) == 12  # 6 entries x 2 hosts
    by_host = {}
    for r in parsed:
        by_host.setdefault(r["host"], []).append(r)
    for h, rows in by_host.items():
        locs = {r["loc"] for r in rows}
        assert locs == {
            f"https://{h}.example.com/page/{k}" for k in range(6)
        }
        assert all(r["lastmod"].startswith("2024-01-") for r in rows)
        assert {r["changefreq"] for r in rows} == {
            "daily", "weekly", "monthly"
        }


def test_discover_ranks_new_first(spark):
    hosts = spark.createDataFrame([Row(host="h1")])
    known = spark.createDataFrame(
        [Row(url=f"https://h1.example.com/page/{k}") for k in (0, 2, 4)]
    )
    got = sorted(
        htmlops.sitemap_discover(htmlops.synth_sitemaps(hosts), known).collect(),
        key=lambda r: r["fetch_rank"],
    )
    # pages 1,3,5 are new; 3 is daily so it outranks 1 (weekly) and 5 (monthly)
    assert [r["loc"].rsplit("/", 1)[1] for r in got[:3]] == ["3", "1", "5"]
    assert all(r["is_new"] for r in got[:3])
    assert not any(r["is_new"] for r in got[3:])
    # known pages rank by the same changefreq-then-recency rule: 0 daily first
    assert [r["loc"].rsplit("/", 1)[1] for r in got[3:]] == ["0", "4", "2"]
    assert [r["fetch_rank"] for r in got] == list(range(1, 7))


def test_discover_plan_shape(spark):
    hosts = spark.createDataFrame([Row(host="h1")])
    known = spark.createDataFrame([Row(url="https://h1.example.com/page/0")])
    plan = (
        htmlops.sitemap_discover(htmlops.synth_sitemaps(hosts), known)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_parse_handles_pretty_printed_sitemaps(spark):
    """Real sitemap.xml pretty-prints one tag per line; a '.'-stops-at-
    newline regex would match zero <url> blocks and silently lose the
    whole host."""
    xml = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "  <url>\n"
        "    <loc>https://h3.example.com/a</loc>\n"
        "    <lastmod>2024-02-01</lastmod>\n"
        "    <changefreq>daily</changefreq>\n"
        "  </url>\n"
        "  <url>\n"
        "    <loc>https://h3.example.com/b</loc>\n"
        "  </url>\n"
        "</urlset>\n"
    )
    parsed = htmlops.sitemap_parse(
        spark.createDataFrame([Row(host="h3", sitemap_xml=xml)])
    ).collect()
    assert len(parsed) == 2
    got = {r["loc"]: r for r in parsed}
    assert got["https://h3.example.com/a"]["lastmod"] == "2024-02-01"
    assert got["https://h3.example.com/a"]["changefreq"] == "daily"
    assert got["https://h3.example.com/b"]["lastmod"] == ""  # absent field
