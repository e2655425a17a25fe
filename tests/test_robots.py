"""robots.txt *-group parsing + URL screening (webpipe
robots_star_disallows / apply_robots): group semantics, comments,
consecutive user-agent lines, empty Disallow, non-star groups ignored,
unknown domains pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import webpipe

ROBOTS_A = "\r\n".join([
    "# politeness file",
    "User-agent: gptbot",
    "Disallow: /",
    "",
    "User-agent: crawler  # consecutive-UA group",
    "User-agent: *",
    "Disallow: /private/",
    "Disallow: /tmp",
    "Allow: /private/ok   # Allow ignored by the minimal parser",
    "Disallow:",
])
ROBOTS_B = "\n".join([
    "User-agent: *",
    "Disallow:",          # empty → allow-all
])
ROBOTS_C = "\n".join([
    "User-agent: onlybot",
    "Disallow: /",        # no * group at all
])


def _rules(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B), ("c.com", ROBOTS_C)],
        "domain string, robots_txt string")
    return {r["domain"]: list(r["disallow"])
            for r in webpipe.robots_star_disallows(df).collect()}


def test_star_group_parse(spark):
    got = _rules(spark)
    assert got["a.com"] == ["/private/", "/tmp"]
    assert got["b.com"] == []
    assert got["c.com"] == []


def test_apply_robots_filters_by_prefix(spark):
    rules = webpipe.robots_star_disallows(spark.createDataFrame(
        [("a.com", ROBOTS_A)], "domain string, robots_txt string"))
    docs = spark.createDataFrame(
        [(1, "a.com", "http://a.com/private/x"),   # blocked
         (2, "a.com", "http://a.com/tmpfile"),     # '/tmp' prefix: blocked
         (3, "a.com", "http://a.com/public"),      # kept
         (4, "d.com", "http://d.com/private/x")],  # no rules: kept
        "doc_id long, domain string, url string")
    kept = sorted(r["doc_id"]
                  for r in webpipe.apply_robots(docs, rules).collect())
    assert kept == [3, 4]
    plan = webpipe.apply_robots(docs, rules) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
