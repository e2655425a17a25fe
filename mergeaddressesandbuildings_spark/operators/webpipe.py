"""Web-corpus pipeline operators (driver round spec: first-class
large-scale training-data ops over Common-Crawl-style pages): URL
canonicalization + URL-level dedup, per-domain capping, PII redaction,
benchmark-contamination screening, deterministic shard shuffling.

Everything here is pure built-in column expressions — no Python UDFs,
no collect — so each operator is exactly as parallel as its input scan
(plus one keyed shuffle where a window/group is semantically required,
called out per function). The regex family is restricted to syntax
that Java regex (Spark) and RE2 (the DuckDB oracle) evaluate
identically: character classes, bounded repetition, alternation, ``\\b``
— no backreferences, no lookaround — which is what makes every
operator oracle-pairable.

Scale notes (100 TB corpus):
- canonicalization / PII / contamination-hash are map-side only.
- URL dedup groups by canonical URL: one hash-partition shuffle, fully
  map-side combinable (min/count aggregates).
- per-domain cap is a windowed top-k: one shuffle on domain. Hot
  domains (the canonical web-crawl skew) are exactly the skew AQE's
  skew-join/aggregation splitting targets; for pathological single
  domains the two-phase partial-top-k variant in
  ``operators/spatial_join.py`` (pick_*_winner) is the template.
- contamination joins the corpus's n-gram stream against the BENCHMARK
  n-gram set — benchmarks are tiny (MBs) next to the corpus, so the
  benchmark side is broadcast and the corpus is never shuffled.
- shard assignment is a pure hash column; the in-shard position is a
  window per shard (one shuffle, and shard counts are balanced by
  construction so there is no skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from mergeaddressesandbuildings_spark.functions import ids_sql
from mergeaddressesandbuildings_spark.operators import doc_dedupe

# Tracking query parameters stripped by canonicalization (shared with
# the DuckDB oracle via TRACKING_PARAM_RE).
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    - fragment removed,
    - scheme and authority lowercased (path/query case is preserved —
      paths are case-sensitive on most origins),
    - default port stripped (``:80`` for http, ``:443`` for https),
    - tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``) removed, remaining parameters sorted, empty query
      dropped.

    Pure regexp/array expressions; non-URL input degenerates to
    lowercased-empty parts rather than erroring (regexp_extract
    returns '' on no match in both engines).
    """
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTHORITY_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, _QUERY_RE, 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda x: (~x.rlike(TRACKING_PARAM_RE)) & (x != ""),
            )
        ),
        "&",
    )
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )


def url_dedup_groups(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """URL-level dedup: group rows by ``canonical_url`` and pick the
    min-id winner per group — ``(canonical_url, n_captures,
    keep_<id>)``. One hash shuffle on the canonical URL, min/count
    fully map-side combinable; the idiomatic first pass of a crawl
    pipeline (same shape as textstats.exact_dup_groups, which keys on
    content instead)."""
    return (
        df.select(canonical_url(F.col(url_col)).alias("canonical_url"),
                  F.col(id_col))
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_captures"),
             F.min(id_col).alias(f"keep_{id_col}"))
    )


def cap_per_domain(df: DataFrame, domain_col: str = "domain",
                   k: int = 3, order_by: list[Column] | None = None) -> DataFrame:
    """Keep at most ``k`` rows per domain (per-domain caps are how
    crawl pipelines stop a handful of giant hosts from dominating the
    training mix). ``order_by`` defines which rows win (default:
    deterministic by the frame's natural sort columns must be passed
    by the caller). Adds ``rank_in_domain`` (1-based).

    One shuffle on domain. Web-domain frequency is Zipfian — enable
    AQE skew handling, or pre-aggregate with the two-phase partial
    top-k pattern (spatial_join.pick_pip_winner) when one domain is a
    double-digit fraction of the corpus."""
    if not order_by:
        raise ValueError("cap_per_domain needs a deterministic order_by")
    w = Window.partitionBy(domain_col).orderBy(*order_by)
    return (
        df.withColumn("rank_in_domain", F.row_number().over(w))
        .filter(F.col("rank_in_domain") <= k)
    )


# --- PII redaction ------------------------------------------------------
# Patterns are the Java/RE2 common subset; order matters (emails first so
# the IP pattern cannot eat a dotted mail host, phones last).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}[- ]\d{3}[- ]\d{3,4}[- ]\d{4}"


def _count_matches(s: Column, pattern: str) -> Column:
    # matches(pattern) == separators(pattern) count: split yields n+1 parts
    return (F.size(F.split(s, pattern)) - 1).cast("long")


def redact_pii(text: Column) -> Column:
    """Replace emails / IPv4s / phone numbers with typed placeholders.
    Pure chained regexp_replace — map-side, no Python."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts + sha256 of the redacted text —
    ``(doc_id, n_emails, n_ips, n_phones, redacted_sha)``. The sha
    makes redaction output hash-verifiable without shipping the text.

    Counts are taken SEQUENTIALLY, each against the text the previous
    redaction produced (exactly ``redact_pii``'s order), so they
    describe the attested redaction: a dotted host inside an email is
    counted as part of the email, never double-counted as an IP."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    return df.select(
        F.col(id_col),
        _count_matches(t, EMAIL_RE).alias("n_emails"),
        _count_matches(after_email, IPV4_RE).alias("n_ips"),
        _count_matches(after_ip, PHONE_RE).alias("n_phones"),
        F.sha2(F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
               .cast("binary"), 256).alias("redacted_sha"),
    )


def contamination_screen(docs: DataFrame, benchmark: DataFrame,
                         n: int = 3) -> DataFrame:
    """Benchmark-contamination screen: for every corpus document,
    count how many of its distinct word ``n``-grams also occur in the
    benchmark set — ``(doc_id, n_hits)``, hit docs only. The standard
    decontamination pass before training on web text.

    Scale shape: the benchmark n-gram set is tiny next to the corpus,
    so it is distinct-ed and BROADCAST; the corpus n-gram stream joins
    against it map-side and aggregates by doc — the 100 TB side is
    never shuffled for the join. Short documents (< n words)
    contribute no n-grams (doc_dedupe.shingles guard)."""
    corpus_sh = doc_dedupe.shingles(docs, n=n)
    bench_sh = (
        doc_dedupe.shingles(benchmark, n=n)
        .select("shingle").distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def shard_assign(df: DataFrame, key: Column, n_shards: int,
                 prefix: str = "shard|",
                 with_position: bool = True) -> DataFrame:
    """Deterministic global shuffle for training order: stable 60-bit
    hash of the key → ``shard`` (hash % n_shards) and ``pos_in_shard``
    (rank of the hash within the shard). Reproducible across runs,
    engines, and cluster sizes — the same sha256-hex-window family as
    operators/sampling.py, NOT rand().

    The shard column is a pure map-side expression; the position is
    one window shuffle on shard, and shards are balanced by
    construction (uniform hash), so no skew."""
    h = ids_sql.sha256_hash60_expr(key.cast("string"), prefix=prefix)
    out = df.withColumn("shard", (h % n_shards).cast("long"))
    if with_position:
        w = Window.partitionBy("shard").orderBy(h.asc(), key.asc())
        out = out.withColumn("pos_in_shard",
                             F.row_number().over(w).cast("long"))
    return out


# A per-source boilerplate set larger than this aborts loudly (same
# loud-failure contract as functions/cells.py MAX_COVER_CELLS): the
# map-side array_contains rewrite is O(lines x boiler) per document,
# which is only the right trade while the set stays nav/footer-sized.
MAX_BOILER_LINES_PER_SOURCE = 100_000


def line_doc_freq(docs: DataFrame, text_col: str = "text",
                  source_col: str = "source",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-source document frequency of every non-blank trimmed line:
    ``(source, line, n_docs)``. The CCNet-style signal behind
    boilerplate detection — nav bars, cookie banners, and footers are
    exactly the lines that repeat across most documents of a domain.

    Scale shape: one map-side explode, then ONE hash aggregation on
    (source, line) with a distinct count — map-side combinable, no
    corpus re-shuffle."""
    lines = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_fid"),
        F.explode(F.split(F.col(text_col), "\n", -1)).alias("raw"),
    ).select("source", "_fid", F.trim(F.col("raw")).alias("line"))
    return (
        lines.filter(F.col("line") != "")
        .groupBy("source", "line")
        .agg(F.count_distinct("_fid").cast("long").alias("n_docs"))
    )


def strip_boilerplate(docs: DataFrame, min_docs: int = 5,
                      text_col: str = "text",
                      source_col: str = "source",
                      id_col: str = "doc_id") -> DataFrame:
    """Remove per-source boilerplate lines (CCNet-style): a trimmed
    non-blank line appearing in >= ``min_docs`` distinct documents of
    the same source is dropped from every document of that source;
    remaining lines keep their order. Output:
    ``(doc_id, n_lines, n_boiler_lines, clean_text)`` — all-boilerplate
    documents survive with ``clean_text = ''`` (so downstream
    quality_filter drops them EXPLICITLY as too_short, never silently).

    Scale shape — the corpus is NEVER re-shuffled: the line-frequency
    agg (line_doc_freq) reduces to per-source boilerplate SETS
    (nav/footer-sized, capped loudly at MAX_BOILER_LINES_PER_SOURCE),
    which broadcast-join back onto the document scan; the strip itself
    is a pure map-side array filter. The alternative explode→regroup
    plan would shuffle every text byte by doc_id — at 100 TB that is
    the whole corpus through the wire, vs kilobytes of boilerplate
    sets here."""
    boiler = (
        line_doc_freq(docs, text_col, source_col, id_col)
        .filter(F.col("n_docs") >= min_docs)
        .groupBy("source")
        .agg(F.collect_set("line").alias("_boiler"))
        .select(
            F.col("source").alias("_bsrc"),
            F.when(
                F.size("_boiler") > MAX_BOILER_LINES_PER_SOURCE,
                F.raise_error(F.concat(
                    F.lit("strip_boilerplate: source "), F.col("source"),
                    F.lit(f" has > {MAX_BOILER_LINES_PER_SOURCE} "
                          "boilerplate lines; raise min_docs or "
                          "pre-partition the source"))),
            ).otherwise(F.col("_boiler")).alias("_boiler"),
        )
    )
    arr = F.split(F.col(text_col), "\n", -1)
    kept = F.filter(
        arr,
        lambda x: ~F.coalesce(
            F.array_contains(F.col("_boiler"), F.trim(x)), F.lit(False)
        ),
    )
    return (
        docs.join(F.broadcast(boiler),
                  F.col(source_col) == F.col("_bsrc"), "left")
        .select(
            F.col(id_col).alias("doc_id"),
            F.size(arr).cast("long").alias("n_lines"),
            (F.size(arr) - F.size(kept)).cast("long").alias("n_boiler_lines"),
            F.array_join(kept, "\n").alias("clean_text"),
        )
    )


def robots_star_disallows(robots: DataFrame,
                          text_col: str = "robots_txt",
                          domain_col: str = "domain") -> DataFrame:
    """Parse robots.txt bodies into ``(domain, disallow)`` where
    ``disallow`` is the array of path prefixes the ``User-agent: *``
    group(s) forbid — the crawl-politeness screen of a web pipeline.

    The parser is a single pure ``F.aggregate`` fold over the file's
    lines (state: in-star-group flag, UA-run flag for consecutive
    ``User-agent`` lines, prefix accumulator) — robots files are KB-
    sized so a per-row fold is exactly as parallel as the scan, with
    zero Python. Semantics (the minimal common subset): ``#`` starts a
    comment; consecutive ``User-agent`` lines form one group; a group
    applies iff any of its agents is ``*``; empty ``Disallow:`` means
    allow-all; ``Allow`` lines and non-star groups are ignored."""
    lines = F.split(F.col(text_col), "\r?\n", -1)
    init = F.struct(
        F.lit(False).alias("star"),
        F.lit(False).alias("ua_run"),
        F.array().cast("array<string>").alias("pfx"),
    )

    def step(acc, l):  # noqa: E741
        c = F.trim(F.substring_index(l, "#", 1))
        key = F.lower(F.trim(F.substring_index(c, ":", 1)))
        val = F.trim(F.regexp_replace(c, "^[^:]*:", ""))
        is_ua = key == "user-agent"
        is_dis = (key == "disallow") & c.contains(":")
        return F.struct(
            F.when(
                is_ua,
                F.when(acc["ua_run"], acc["star"] | (val == "*"))
                .otherwise(val == "*"),
            ).otherwise(acc["star"]).alias("star"),
            is_ua.alias("ua_run"),
            F.when(is_dis & acc["star"] & (val != ""),
                   F.concat(acc["pfx"], F.array(val)))
            .otherwise(acc["pfx"]).alias("pfx"),
        )

    return robots.select(
        F.col(domain_col).alias("domain"),
        F.aggregate(lines, init, step)["pfx"].alias("disallow"),
    )


def apply_robots(docs: DataFrame, rules: DataFrame,
                 url_col: str = "url",
                 domain_col: str = "domain") -> DataFrame:
    """Drop documents whose URL path starts with any of their domain's
    ``*``-group disallow prefixes (``rules`` from
    :func:`robots_star_disallows`). Domains with no rules row pass
    through. The rules table is one small row per domain — broadcast —
    and the screen itself is a map-side array scan per URL."""
    path = F.regexp_extract(F.col(url_col), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    r = rules.select(F.col("domain").alias("_rdom"),
                     F.col("disallow").alias("_dis"))
    blocked = F.exists(F.col("_dis"), lambda p: path.startswith(p))
    return (
        docs.join(F.broadcast(r), F.col(domain_col) == F.col("_rdom"),
                  "left")
        .filter(~F.coalesce(blocked, F.lit(False)))
        .drop("_rdom", "_dis")
    )
