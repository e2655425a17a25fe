"""Web-corpus pipeline operators (operators/webpipe.py): URL
canonicalization edge cases, URL dedup groups, per-domain caps, PII
redaction on crafted strings, contamination screen semantics, and
deterministic shard assignment. The driver-contract rehearsal
(test_queries_oracle.py) additionally hash-compares each operator's
query against an independently-derived DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import webpipe


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in
            df.select(webpipe.canonical_url(F.col("url"))).collect()]


def test_canonical_url_cases(spark):
    got = _canon(spark, [
        # lowercase scheme+host, strip default port, keep path case
        "HTTP://WWW.Example.COM:80/Page/One",
        # https default port; fragment stripped
        "https://example.com:443/a#frag",
        # non-default port kept
        "http://example.com:8080/a",
        # tracking params stripped, rest sorted; empty query dropped
        "http://example.com/p?utm_source=x&b=2&a=1",
        "http://example.com/p?utm_campaign=only",
        # empty path becomes /
        "https://Example.com",
        # query param order normalized
        "http://example.com/p?b=2&a=1",
        "http://example.com/p?a=1&b=2#sec",
    ])
    assert got == [
        "http://www.example.com/Page/One",
        "https://example.com/a",
        "http://example.com:8080/a",
        "http://example.com/p?a=1&b=2",
        "http://example.com/p",
        "https://example.com/",
        "http://example.com/p?a=1&b=2",
        "http://example.com/p?a=1&b=2",
    ]
    # the last two collapse to the same canonical form — the dedup key
    assert got[6] == got[7]


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over a combinatorial
    grid of scheme/host/port/path/query/fragment variants — the
    property that makes re-canonicalizing an already-clean corpus a
    no-op (one batch, column-wise, no per-example Spark round-trips)."""
    urls = []
    for scheme in ("http", "HTTPS"):
        for host in ("Example.com", "WWW.sub.EXAMPLE.org"):
            for port in ("", ":80", ":443", ":8080"):
                for path in ("", "/", "/A/b"):
                    for q in ("", "?b=2&a=1", "?utm_source=x",
                              "?utm_source=x&z=9&a=1"):
                        for frag in ("", "#sec"):
                            urls.append(f"{scheme}://{host}{port}{path}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = webpipe.canonical_url(F.col("url"))
    twice = webpipe.canonical_url(webpipe.canonical_url(F.col("url")))
    bad = df.select(F.col("url"), once.alias("c1"), twice.alias("c2")) \
        .filter(F.col("c1") != F.col("c2")).collect()
    assert bad == [], bad[:5]


def test_url_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "http://A.com/x?b=2&a=1"),
         (2, "HTTP://a.COM:80/x?a=1&utm_source=f&b=2"),
         (3, "http://a.com/y")],
        "doc_id long, url string")
    got = {r["canonical_url"]: (r["n_captures"], r["keep_doc_id"])
           for r in webpipe.url_dedup_groups(df).collect()}
    assert got == {"http://a.com/x?a=1&b=2": (2, 1),
                   "http://a.com/y": (1, 3)}


def test_cap_per_domain(spark):
    rows = [("d1", i, 100 - i) for i in range(5)] + [("d2", 10, 7)]
    df = spark.createDataFrame(rows, "domain string, doc_id long, score long")
    out = webpipe.cap_per_domain(
        df, "domain", k=2,
        order_by=[F.col("score").desc(), F.col("doc_id")])
    got = sorted((r["domain"], r["doc_id"], r["rank_in_domain"])
                 for r in out.collect())
    assert got == [("d1", 0, 1), ("d1", 1, 2), ("d2", 10, 1)]
    with pytest.raises(ValueError, match="order_by"):
        webpipe.cap_per_domain(df, "domain", k=2, order_by=None)


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b-c%d@sub.Example.org then 192.168.0.1 and "
             "+1-555-123-4567 done"),
         (2, "no pii here, just 1.2 decimals and v1.2.3.4.5 versions"),
         (3, "two mails: x@y.io y@z.ai")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in webpipe.pii_stats(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 1, 1)
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (2, 0, 0)
    # versions-with-5-parts: the IPv4 pattern matches the first 4 dotted
    # groups (documented approximation); plain decimals never match
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0

    red = [r[0] for r in df.filter("doc_id = 1")
           .select(webpipe.redact_pii(F.col("text"))).collect()]
    assert red == ["mail <EMAIL> then <IP> and <PHONE> done"]


def test_contamination_screen(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),   # shares trigram with bench
         (2, "completely different words entirely"),
         (3, "short")],                      # < n words → no grams
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a the quick brown cat")],    # trigram 'the quick brown'
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"]
           for r in webpipe.contamination_screen(docs, bench, n=3).collect()}
    assert got == {1: 1}
    # benchmark side is broadcast — the corpus is never shuffled for it
    plan = webpipe.contamination_screen(docs, bench, n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_shard_assign_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = webpipe.shard_assign(df, F.col("doc_id"), n_shards=8)
    b = webpipe.shard_assign(df.repartition(13), F.col("doc_id"), n_shards=8)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # partitioning-invariant
    sizes = [r["n"] for r in
             a.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 8
    # uniform hash → balanced shards (loose 3-sigma-ish bound)
    assert max(sizes) - min(sizes) < 2000 // 8
    # positions are a permutation of 1..size within each shard
    chk = a.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos_in_shard").alias("mx"),
        F.min("pos_in_shard").alias("mn"),
        F.countDistinct("pos_in_shard").alias("nd")).collect()
    for r in chk:
        assert r["mn"] == 1 and r["mx"] == r["n"] == r["nd"]


def test_pii_counts_are_sequential_and_sha_attested(spark):
    """Round-3 review: counts must describe the SEQUENTIAL redaction.
    An email whose host reads like a dotted quad is one email, not an
    email plus an IP — and redacted_sha must equal sha256 of the
    actual redact_pii output."""
    df = spark.createDataFrame(
        [(1, "mail u@1.2.3.4.example.com then 10.0.0.1 done")],
        "doc_id long, text string")
    out = webpipe.pii_stats(df).collect()[0]
    assert (out["n_emails"], out["n_ips"], out["n_phones"]) == (1, 1, 0)
    sha = df.select(
        F.sha2(webpipe.redact_pii(F.col("text")).cast("binary"), 256)
    ).collect()[0][0]
    assert out["redacted_sha"] == sha


def test_strip_boilerplate_semantics(spark):
    """Lines repeated across >= min_docs docs of a source are removed;
    unique body lines keep their order; blank lines survive; an
    all-boilerplate doc yields clean_text='' (not a dropped row);
    other sources are untouched."""
    mk = lambda *ls: "\n".join(ls)  # noqa: E731
    df = spark.createDataFrame(
        [(1, "a", mk("MENU", "body one", "", "FOOT")),
         (2, "a", mk("MENU", "body two", "FOOT")),
         (3, "a", mk("MENU", "FOOT")),            # all boilerplate
         (4, "b", mk("MENU", "other body"))],     # df=1 in source b
        "doc_id long, source string, text string")
    out = {r["doc_id"]: r
           for r in webpipe.strip_boilerplate(df, min_docs=2).collect()}
    assert out[1]["clean_text"] == "body one\n"   # blank line kept
    assert (out[1]["n_lines"], out[1]["n_boiler_lines"]) == (4, 2)
    assert out[2]["clean_text"] == "body two"
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_lines"], out[3]["n_boiler_lines"]) == (2, 2)
    # MENU appears once in source b → not boilerplate there
    assert out[4]["clean_text"] == "MENU\nother body"
    assert len(out) == 4


def test_line_doc_freq_counts_docs_not_occurrences(spark):
    """A line repeated WITHIN one doc counts once — frequency is
    document frequency, not occurrence count."""
    df = spark.createDataFrame(
        [(1, "a", "X\nX\nX"), (2, "a", "X\ny")],
        "doc_id long, source string, text string")
    got = {(r["source"], r["line"]): r["n_docs"]
           for r in webpipe.line_doc_freq(df).collect()}
    assert got[("a", "X")] == 2
    assert got[("a", "y")] == 1
