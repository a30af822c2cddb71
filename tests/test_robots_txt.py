"""robots.txt file parsing + allow/deny decisions: UA-block grouping,
comment/empty-value handling, longest-prefix-match with Allow tiebreak, and
plan shape (broadcast rule dimension, no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from enem_spark import htmlops


ROBOTS = [
    Row(
        host="h1",
        robots_txt=(
            "# comment\n"
            "User-agent: googlebot\n"
            "Disallow: /private\n"
            "User-agent: *\n"
            "Allow: /a/b\n"
            "Disallow: /a\n"
            "Crawl-delay: 2"
        ),
    ),
    # stacked user-agents: * shares the block with bota
    Row(host="h2", robots_txt="User-agent: botA\nUser-agent: *\nDisallow: /x"),
    # empty Disallow imposes no restriction
    Row(host="h3", robots_txt="User-agent: *\nDisallow:"),
    # no star group: rules don't apply to us
    Row(host="h4", robots_txt="User-agent: botB\nDisallow: /"),
    # tie: Allow and Disallow of equal length on the SAME prefix -> Allow wins
    Row(host="h5", robots_txt="User-agent: *\nDisallow: /t\nAllow: /t"),
]


@pytest.fixture(scope="module")
def robots(spark):
    return spark.createDataFrame(ROBOTS)


def test_rule_extraction(spark, robots):
    rules = {
        (r["host"], r["rule_type"], r["prefix"])
        for r in htmlops.robots_txt_rules(robots).collect()
    }
    assert ("h1", "allow", "/a/b") in rules
    assert ("h1", "disallow", "/a") in rules
    # googlebot-only rule must NOT enter the star set
    assert ("h1", "disallow", "/private") not in rules
    # stacked agents: the * in the same UA block adopts the rule
    assert ("h2", "disallow", "/x") in rules
    # empty Disallow dropped; no-star host contributes nothing
    assert not any(h == "h3" for h, _, _ in rules)
    assert not any(h == "h4" for h, _, _ in rules)


def test_decisions(spark, robots):
    urls = spark.createDataFrame(
        [
            Row(url="u1", host="h1", path="/a/b/c"),   # allow (longest)
            Row(url="u2", host="h1", path="/a/z"),     # disallow
            Row(url="u3", host="h1", path="/private"), # star set unaffected
            Row(url="u4", host="h2", path="/x/1"),     # stacked-agent deny
            Row(url="u5", host="h3", path="/anything"),
            Row(url="u6", host="h4", path="/blocked-for-botB-only"),
            Row(url="u7", host="h5", path="/t/page"),  # tie -> Allow wins
        ]
    )
    got = {
        r["url"]: (r["allowed"], r["matched_type"])
        for r in htmlops.robots_txt_allow(robots, urls).collect()
    }
    assert got["u1"] == (True, "allow")
    assert got["u2"] == (False, "disallow")
    assert got["u3"] == (True, None)
    assert got["u4"] == (False, "disallow")
    assert got["u5"] == (True, None)
    assert got["u6"] == (True, None)
    assert got["u7"] == (True, "allow")


def test_plan_shape(spark, robots):
    urls = spark.createDataFrame([Row(url="u", host="h1", path="/a")])
    plan = (
        htmlops.robots_txt_allow(robots, urls)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # the rule table must ride a broadcast, not a shuffled join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
