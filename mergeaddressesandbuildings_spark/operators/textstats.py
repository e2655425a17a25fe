"""Text-analysis operators for the training-data pipeline surface
(driver round spec: language-ID, quality scoring, token counting,
document fingerprinting — each over the ``documents`` table).

Everything here is pure built-in column expressions (whole-stage
codegen; no Python in the hot path). Counts are emitted as exact
integers — numerator/denominator pairs instead of ratios — so results
are bit-identical across engines and partitionings at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# "stopwords" of the synthetic corpus (vocabulary is driver-generated);
# for real text swap in a language stoplist — the plan shape is identical
STOPWORDS = ("key", "agg", "row", "scan")

TOKEN_ALPHA = "[a-z]+"
TOKEN_DIGIT = "[0-9]"
TOKEN_PUNCT = "[^a-z0-9 ]"


def word_stats(docs: DataFrame) -> DataFrame:
    ws = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.element_at(ws, 1).alias("first_word"),
        F.element_at(ws, -1).alias("last_word"),
        F.length("text").cast("long").alias("n_chars_text"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace words + regex token classes (the
    BPE-ish pre-tokenizer shape: alpha runs / single digits / punct)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_ALPHA), F.lit(0))).cast("long").alias("n_alpha_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_DIGIT), F.lit(0))).cast("long").alias("n_digit_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PUNCT), F.lit(0))).cast("long").alias("n_punct_tokens"),
    )


def quality_counts(docs: DataFrame) -> DataFrame:
    """Quality scoring inputs as exact integers: total words, stopword
    hits, char count. Downstream ratio = stopword_count / n_words is the
    consumer's division (kept out of the engine output for exactness)."""
    ws = F.split(F.col("text"), " ")
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        "lang",
        F.size(ws).cast("long").alias("n_words"),
        stop_hits.cast("long").alias("n_stopwords"),
        F.length("text").cast("long").alias("n_chars_text"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct_words"),
    )


def lang_guess(docs: DataFrame) -> DataFrame:
    """Language-ID heuristic (marker-token n-gram test) as a pure CASE
    expression. Markers are corpus-appropriate; for natural text this is
    where a char-trigram table goes (same plan shape: no shuffle)."""
    guess = (
        F.when(F.col("text").contains(" the "), F.lit("en"))
        .when(F.col("text").contains(" el "), F.lit("es"))
        .when(F.col("text").contains("spark"), F.lit("en"))
        .otherwise(F.lit("unk"))
    )
    return docs.select("doc_id", "lang", guess.alias("lang_guess"))


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprinting: full-content md5 + a locality-stable
    prefix fingerprint (first 16 words) — catches head-duplicates."""
    ws = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_md5"),
        F.md5(F.array_join(F.slice(ws, 1, 16), " ")).alias("prefix_md5"),
        F.length("text").cast("long").alias("n_chars_text"),
    )


def exact_dup_groups(docs: DataFrame, dups_only: bool = True) -> DataFrame:
    """Exact dedup: hash-groupBy on content hash; map-side combinable.
    ``dups_only=False`` keeps singleton groups (the full keep-list)."""
    out = (
        docs.select("doc_id", F.md5(F.col("text")).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )
    return out.filter(F.col("n_docs") > 1) if dups_only else out


def top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-k terms by (frequency desc, term asc) —
    keyword-extraction baseline. Deterministic integer ranking (no
    float scores → bit-exact across engines); explode + two hash aggs
    + one window, all builtins."""
    from pyspark.sql import Window

    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
    return (
        tf.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "term", "tf", "term_rank")
    )


def corpus_vocab(docs: DataFrame, top_n: int = 100) -> DataFrame:
    """Corpus vocabulary table: global term count + document frequency,
    top ``top_n`` by (count desc, term asc) — the count-collection step
    of tokenizer/vocab training. One explode + one hash agg (map-side
    combinable: the shuffle carries (term, partial count, partial df),
    never rows) + a top-n."""
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    return (
        words.groupBy("term")
        .agg(F.count("*").alias("n_occurrences"),
             F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(top_n)
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher/C4-style repetition signals per document, kept as exact
    integer pairs (numerator, denominator) so downstream thresholds —
    and the cross-engine oracle — never touch a float:

    - ``top_bigram_n / n_bigrams``: occurrences of the most frequent
      word bigram (ties: lexicographically first);
    - ``once_words / n_distinct_words``: words appearing exactly once.

    Two explodes + hash aggs, all builtins, map-side combinable."""
    from pyspark.sql import Window

    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    word_stats = wc.groupBy("doc_id").agg(
        F.sum((F.col("c") == 1).cast("long")).alias("once_words"),
        F.count("*").alias("n_distinct_words"),
    )

    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    # guard: sequence(2, size) DESCENDS for <2-word docs and element_at
    # then throws (index 0) — emit an empty bigram array instead, so
    # explode drops the doc and the inner joins below drop it from the
    # result, matching the oracle's empty-range + inner-join semantics.
    grams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(ws)),
            lambda i: F.concat(
                F.element_at(ws, i - 1), F.lit(" "), F.element_at(ws, i)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigrams = docs.select(
        "doc_id", F.explode(grams).alias("g")
    )
    bc = bigrams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    w_top = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
    top = (
        bc.withColumn("_rn", F.row_number().over(w_top))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("c").alias("top_bigram_n"))
    )
    n_bi = bc.groupBy("doc_id").agg(F.sum("c").alias("n_bigrams"))
    return (
        word_stats.join(n_bi, "doc_id").join(top, "doc_id")
        .select("doc_id", "once_words", "n_distinct_words",
                "top_bigram_n", "n_bigrams")
    )


def line_repetition_stats(docs: DataFrame, sep: str = "\n") -> DataFrame:
    """Gopher duplicate-line signals (Rae et al. 2021 repetition
    filters: "duplicate line fraction" and "duplicate line character
    fraction") per document, as exact integer numerator/denominator
    pairs:

    - ``dup_line_instances / n_lines``: line occurrences beyond each
      line's first (a line appearing c times contributes c−1);
    - ``dup_line_chars / n_line_chars``: the same mass in characters.

    ZERO shuffles: lines live in a per-doc array and the counts are
    array_distinct + aggregate folds — whole-stage-codegen column
    exprs, embarrassingly parallel, the cheapest possible shape for a
    per-doc signal at corpus scale (contrast repetition_stats, whose
    cross-line grouping needs its two hash aggs). ``sep`` is the line
    delimiter, matched LITERALLY (quoted with \\Q...\\E before it
    reaches Java's regex split, so "." or "|" separate on the
    character, not on any-char/alternation — same semantics as the
    DuckDB oracle's string_split); pass " " to get per-word repetition
    mass instead. NULL text yields NULL in every stat column (the
    honest signal — size(NULL) would otherwise leak -1 as a count)."""
    # \Q...\E literal-quotes sep for Java's regex engine; an embedded
    # \E in sep would end the quote early, so split-and-rejoin it
    lit_sep = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = F.split(F.col("text"), lit_sep)
    dist = F.array_distinct(lines)
    zero = F.lit(0).cast("long")
    tot_chars = F.aggregate(lines, zero, lambda a, x: a + F.length(x))
    dis_chars = F.aggregate(dist, zero, lambda a, x: a + F.length(x))

    def guarded(col):
        return F.when(F.col("text").isNotNull(), col)

    return docs.select(
        "doc_id",
        guarded(F.size(lines).cast("long")).alias("n_lines"),
        guarded((F.size(lines) - F.size(dist)).cast("long"))
        .alias("dup_line_instances"),
        guarded(tot_chars).alias("n_line_chars"),
        guarded(tot_chars - dis_chars).alias("dup_line_chars"),
    )


def quality_filter(docs: DataFrame) -> DataFrame:
    """Composite C4/Gopher-style document filter: one row PER INPUT DOC
    with a keep/drop verdict and the comma-joined names of every rule
    that fired — the decision layer on top of the integer signals above.

    All rules compare exact integers (never ratios), so the verdict is
    bit-identical across engines and partitionings:

    - ``too_short``    n_words < 5
    - ``too_long``     n_words > 5000
    - ``mean_word_short``  total non-space chars < 2·n_words
    - ``mean_word_long``   total non-space chars > 12·n_words
    - ``no_stopword``  zero corpus-stopword hits
    - ``top_bigram_heavy`` most frequent bigram > 20% of all bigrams
      (bigram-less docs never fire this — left join + coalesce)
    - ``low_once_ratio``   words occurring exactly once < 20% of
      distinct words (heavy repetition)

    Plan: the per-doc scalar rules are one map-side projection; the
    two aggregate signals reuse repetition_stats (two hash aggs + a
    window) joined back LEFT so short docs keep their verdict row.
    """
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    base = docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.length(F.regexp_replace(F.col("text"), " ", ""))
         .cast("long").alias("n_chars_nospace"),
        F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
         .cast("long").alias("n_stopwords"),
    )
    rep = repetition_stats(docs)
    j = base.join(rep, "doc_id", "left")
    rules = [
        # NULL text yields NULL n_words, which would skip every rule
        # and silently KEEP the doc — treat it as too_short instead
        ("too_short",
         (F.col("n_words") < 5) | F.col("n_words").isNull()),
        ("too_long", F.col("n_words") > 5000),
        ("mean_word_short", F.col("n_chars_nospace") < 2 * F.col("n_words")),
        ("mean_word_long", F.col("n_chars_nospace") > 12 * F.col("n_words")),
        ("no_stopword", F.col("n_stopwords") == 0),
        ("top_bigram_heavy",
         F.coalesce(F.col("top_bigram_n") * 5 > F.col("n_bigrams"),
                    F.lit(False))),
        ("low_once_ratio",
         F.coalesce(F.col("once_words") * 5 < F.col("n_distinct_words"),
                    F.lit(False))),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    return j.select(
        "doc_id", "n_words",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def pmi_pairs(docs: DataFrame, min_count: int = 5,
              threshold_log2: int = 3,
              tokenize_partitions: int | None = None) -> DataFrame:
    """Pointwise-mutual-information collocations over the corpus's
    adjacent word pairs, with the PMI threshold applied as an EXACT
    INTEGER cross-multiplication so the result is engine-exact:

        pmi = log2(c_xy * N / (c_x * c_y)) > t
          <=> c_xy * N > 2^t * c_x * c_y          (t integer)

    — no log, no division, no float. c_x / c_y are the word's counts
    as LEFT / RIGHT member over the bigram corpus (derived by
    re-aggregating the bigram counts, so the corpus is tokenized and
    shuffled ONCE), N is the total bigram count.

    Plan at 10^12 docs: one explode + hash agg for the bigram counts,
    two small re-aggs of that table, two equi-joins back, one bounded
    1-number collect (N — the lm.py corpus-constant pattern). Integer
    overflow bound: c_xy * N <= N^2 must fit a signed 64-bit, i.e.
    N < 3e9 bigrams per run; beyond that, run per-shard or switch the
    comparison to the double log form (the threshold then inherits
    ~1 ulp fuzz, which only matters to the oracle pairing, not the
    collocation quality).

    → (w1, w2, c_xy, c_x, c_y, n_bigrams), all counts BIGINT.
    """
    if threshold_log2 < 0:
        raise ValueError("threshold_log2 must be a non-negative integer")
    if tokenize_partitions:
        # small-file corpora arrive as 1-2 scan partitions, serializing
        # the tokenize stage; at-scale scans are already wide, so this
        # stays opt-in (an extra shuffle of raw text is not free)
        docs = docs.repartition(tokenize_partitions)
    # materialize the token array ONCE per row: referencing the split
    # expression inside the transform lambda would re-evaluate it per
    # element (measured 2x on the bench corpus)
    wsc = F.col("__ws")
    toks = docs.select(
        F.filter(F.split(F.lower(F.col("text")), " "),
                 lambda t: t != "").alias("__ws"))
    # guard: sequence(2, size) DESCENDS for docs under 2 words
    # (doc_dedupe.shingles's short-doc rule) — emit no bigrams instead
    grams = F.when(
        F.size(wsc) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(wsc)),
            lambda i: F.struct(
                F.element_at(wsc, i - 1).alias("w1"),
                F.element_at(wsc, i).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = (
        toks.select(F.explode(grams).alias("g"))
        .groupBy(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .agg(F.count("*").alias("c_xy"))
    ).persist()  # reused by N, both marginals, and the final join
    # bounded metadata: ONE number (total bigrams), embedded as a
    # literal so the plan carries no constant-key join; this collect
    # also materializes the persisted bigram table
    n_bigrams = big.agg(F.sum("c_xy")).collect()[0][0] or 0
    left = big.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    right = big.groupBy("w2").agg(F.sum("c_xy").alias("c_y"))
    return (
        big.join(left, "w1").join(right, "w2")
        .filter(
            (F.col("c_xy") >= min_count)
            & (F.col("c_xy") * F.lit(n_bigrams)
               > F.lit(1 << threshold_log2) * F.col("c_x") * F.col("c_y"))
        )
        .select(
            "w1", "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            F.lit(n_bigrams).cast("long").alias("n_bigrams"),
        )
    )
