"""Near-duplicate detection over documents: MinHash+LSH, SimHash, and
exact n-gram Jaccard (driver round spec: deduplication operators as
first-class components).

Scale design:
- shingling/hashing is all built-in expressions (hash + transform +
  explode) — JVM-side, no Python anywhere in this module;
- MinHash signatures come out of ONE hash aggregate (min of k
  independent hashes per doc — map-side combinable);
- LSH banding turns candidate generation into an equi-join on
  (band_id, band_key): only same-bucket docs ever pair, so the
  quadratic blowup is confined to buckets (the standard banding
  guarantee); candidates are then verified with exact Jaccard via a
  shingle-set semi-join restricted to candidate pairs.
- SimHash is 60 conditional-sum aggregates over JVM token hashes (one
  hash-agg pass, map-side combinable — no Python, no row blowup).

Hash families: ``hash="xxhash64"`` (default — fastest, the 100 TB
path) or ``hash="sha256"`` (60-bit hex-window hashes both Spark and
DuckDB can compute bit-identically — functions/ids_sql.py — which
makes the FULL MinHash→LSH→verify pipeline and SimHash oracle-pairable
in plans/queries.py; same operator shape, only the hash kernel swaps).
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column, DataFrame, functions as F

from mergeaddressesandbuildings_spark.functions import ids_sql

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
N_SIMHASH_BITS = 60  # sha256 hex-window hash width (ids_sql.sha256_hash60_expr)
SIMHASH_CHUNK_BITS = 15  # 4 chunks; pigeonhole: hamming<=3 => one chunk equal

# Persisted intermediates from dedup invocations, kept only so
# release_caches() can drop everything explicitly.  The OWNING release
# path is per-invocation: _tie_caches_to() attaches a weakref
# finalizer to the DataFrame an entry point returns, so each
# invocation's caches are unpersisted exactly when the caller drops
# its result — long-lived sessions (the full-registry oracle sweep
# runs the dedup family several times) never accumulate storage, and
# interleaved invocations can't release each other's still-live caches
# (a pop-on-next-invocation scheme did, round-5 review finding).
_CACHES: list[DataFrame] = []


def _track_cache(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for release when the invocation's
    result is dropped (see _tie_caches_to) or an explicit
    release_caches()."""
    _CACHES.append(df)
    return df


def _tie_caches_to(result: DataFrame, start_idx: int) -> DataFrame:
    """Unpersist the caches registered since ``start_idx`` when
    ``result`` is garbage-collected.  Unpersisting is never a
    correctness hazard (Spark recomputes), so the worst case — a
    caller derives a frame from the result and drops the original
    before consuming — only costs recompute.  Nested entry points tie
    overlapping slices to the same returned object; unpersist is
    idempotent, so the duplicate finalizers are harmless."""
    caches = tuple(_CACHES[start_idx:])
    if not caches:
        return result

    def _release() -> None:
        for c in caches:
            try:
                c.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
            try:
                _CACHES.remove(c)
            except ValueError:
                pass

    weakref.finalize(result, _release)
    return result


def release_caches() -> None:
    """Unpersist every cache registered by prior dedup calls. Safe to
    call at any time; lazily-recomputable plans are unaffected beyond
    losing the cache."""
    while _CACHES:
        try:
            _CACHES.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def shingles(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, built with array
    lambdas (no Python)."""
    ws = F.split(F.col("text"), " ")
    # guard: sequence(n, size) DESCENDS for docs shorter than n words
    # and slice then throws INVALID_PARAMETER_VALUE.START — emit an
    # empty shingle array instead (explode drops the doc: a doc with no
    # n-grams has no shingle set, matching the oracle's empty range).
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(n), F.size(ws)),
            lambda i: F.array_join(F.slice(ws, i - (n - 1), n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def _shingle_hash(j: int, hash: str) -> Column:
    """j-th independent shingle hash. xxhash64: seeded by a literal
    prefix. sha256: four 15-hex-char (60-bit) windows per digest, so k=16
    hashes cost 4 sha256 evaluations per shingle — and DuckDB computes
    the identical value (see module docstring)."""
    if hash == "xxhash64":
        return F.xxhash64(F.concat(F.lit(f"mh{j}|"), F.col("shingle")))
    a, b = divmod(j, 4)
    hex64 = F.sha2(
        F.concat(F.lit(f"mh{a}|"), F.col("shingle")).cast("binary"), 256
    )
    return F.conv(F.substring(hex64, 1 + 15 * b, 15), 16, 10).cast("long")


def minhash_signatures(sh: DataFrame, k: int = N_MINHASH,
                       hash: str = "xxhash64") -> DataFrame:
    """(doc_id, sig: array<long>) — k min-hashes per doc in one agg."""
    mins = [F.min(_shingle_hash(j, hash)).alias(f"h{j}") for j in range(k)]
    sig = F.array(*[F.col(f"h{j}") for j in range(k)])
    return sh.groupBy("doc_id").agg(*mins).select("doc_id", sig.alias("sig"))


def minhash_signature_expr(text: Column, k: int = N_MINHASH, n: int = 2,
                           hash: str = "xxhash64") -> Column:
    """The signature as ONE row expression (``array<long>`` of k, NULL
    when the doc has no n-grams) — no explode, no groupBy, no shuffle.

    Bit-identical to ``minhash_signatures(shingles(docs, n))``: min is
    duplicate-insensitive, so skipping ``array_distinct`` over the gram
    array changes nothing, and the per-j hash kernels are shared with
    ``_shingle_hash``. This exists for the streaming formulation (ST9):
    a stateful query can't put a shuffle aggregate in front of
    ``applyInPandasWithState``. It is NOT the batch scale path —
    measured ~2x slower than explode+agg for the signature pass (100k
    docs, local[16], interleaved: 6.1/9.4 s agg vs 15.2/18.4 s rowexpr)
    because higher-order-function lambdas are interpreted per element
    while the explode+hash-agg pipeline whole-stage-codegens; the agg's
    shuffle is ~1 row/doc (map-side partial mins), so there is no
    shuffle saving to win back."""
    ws = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(n), F.size(ws)),
        lambda i: F.array_join(F.slice(ws, i - (n - 1), n), " "),
    )

    def h(j: int, s: Column) -> Column:
        if hash == "xxhash64":
            return F.xxhash64(F.concat(F.lit(f"mh{j}|"), s))
        a, b = divmod(j, 4)
        hex64 = F.sha2(F.concat(F.lit(f"mh{a}|"), s).cast("binary"), 256)
        return F.conv(F.substring(hex64, 1 + 15 * b, 15), 16, 10).cast("long")

    # ONE pass: per-gram k-vector of hashes, then an element-wise min
    # fold. Naive `array(*[array_min(transform(grams, h_j)) ...])` is
    # 16 separate lambda trees over the same grams expression — Catalyst
    # does NOT CSE through higher-order-function lambdas, so the
    # split/slice/join gram construction ran k times per row (measured
    # 330 s vs 80 s for the signature pass at 300k docs, local[16]).
    # NB inside transform lambdas: never `lambda s, j=j` — pyspark
    # counts a defaulted second parameter as another lambda VARIABLE
    # and j would bind to a fresh column instead of the Python int.
    hashed = F.transform(
        grams, lambda s: F.array(*[h(j, s) for j in range(k)])
    )
    sig = F.aggregate(
        hashed,
        F.array_repeat(F.lit(9223372036854775807).cast("long"), k),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
    )
    return F.when(F.size(ws) >= n, sig).otherwise(F.lit(None))


def banded_signatures(sigs: DataFrame, n_bands: int = N_BANDS,
                      band_key: str = "hash") -> DataFrame:
    """(doc_id, band_id, band_hash) — each signature exploded into its
    LSH band keys. Public so scale probes can measure band-bucket skew
    (the groupBy(band_id, band_hash) size distribution IS the
    candidate-join cost model: a bucket of size s contributes s^2 join
    work) with exactly the keys the candidate join shuffles on."""
    k = N_MINHASH
    rows_per_band = k // n_bands

    def key_of(b: int) -> Column:
        joined = F.concat_ws(",", F.transform(
            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
            lambda x: x.cast("string"),
        ))
        return F.xxhash64(joined).cast("string") if band_key == "hash" else joined

    bands = F.explode(
        F.array(*[
            F.struct(
                F.lit(b).alias("band_id"), key_of(b).alias("band_hash")
            )
            for b in range(n_bands)
        ])
    )
    return sigs.select("doc_id", bands.alias("b")).select(
        "doc_id", "b.band_id", "b.band_hash"
    )


def lsh_candidate_pairs(sigs: DataFrame, n_bands: int = N_BANDS,
                        band_key: str = "hash") -> DataFrame:
    """LSH banding: equal band-slice → candidate pair (doc_a < doc_b).

    ``band_key="hash"`` buckets on xxhash64 of the band slice (compact
    shuffle key — the scale default); ``band_key="string"`` buckets on
    the comma-joined slice itself (bit-identical across engines — the
    oracle-paired mode)."""
    banded = banded_signatures(sigs, n_bands, band_key)
    a = banded.alias("a")
    b = banded.alias("b")
    # SHUFFLE_HASH pin: both sides are the SAME |docs|·n_bands-row
    # table, so a broadcast build here means broadcasting every band
    # key of the whole corpus — never right at any scale, yet it is
    # exactly what the static planner picks when the explode+aggregate
    # upstream leaves it with a default size estimate (observed at 1M
    # docs: BroadcastHashJoin over the full banded table → driver OOM
    # when the consumer runs the plan cold, i.e. without lsh_bench.py's
    # persist+count giving AQE real stats).
    return (
        a.join(b.hint("shuffle_hash"), ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(sh: DataFrame, pairs: DataFrame, threshold: float,
                   restrict: bool = True) -> DataFrame:
    """Exact Jaccard for candidate pairs via PAIR-ANCHORED shingle
    intersection.

    Shape (round-4 verdict task 2): explode each candidate pair against
    doc_a's shingle set (``pairs ⋈ sh on doc_a``), then equi-join on
    ``(doc_b, shingle)`` against the shingle table — each (doc_id,
    shingle) is distinct, so that join is 1:≤1 and the whole verify
    costs ``|pairs| · avg_shingles``, independent of how many candidate
    docs share any one shingle. The previous shingle SELF-join
    (``sh ⋈ sh on shingle`` then semi-join against pairs) was quadratic
    in the hottest shingle: a boilerplate shingle shared by a 10k-doc
    template cluster generated ~5·10⁷ intermediate rows on that single
    key before the pair restriction could prune (it can't push below
    the join — the pair keys exist only post-join). The pair-anchored
    plan is hot-shingle-immune and produces the identical pair set
    (pairs with zero shared shingles drop out of the inner join in both
    shapes; asserted equal in tests/test_jaccard_verify_adversarial.py's
    adversarial template-cluster fixture).

    Pass ``restrict=False`` when ``sh`` is already candidate-restricted
    (the rowexpr/incremental pipelines) to skip the redundant
    restriction join — the persist below still applies.
    """
    cache_start = len(_CACHES)
    docs_in_play = pairs.select(F.col("doc_a").alias("doc_id")).union(
        pairs.select("doc_b")
    ).distinct()
    if not restrict:
        docs_in_play = None
    # Materialize the candidate-restricted shingle slice ONCE: it feeds
    # three consumers (sizes, the doc_a explode, the doc_b probe), and
    # without the persist each recomputes the full corpus shingling
    # upstream — measured at 1M docs/local[16] as 3x the shingle pass,
    # ~60% of the whole dedup wall (jobs/lsh_bench.py). The slice is
    # candidate-bounded (dup docs, not the corpus), so caching it is
    # safe at any scale. Cache lifetime: registered with _track_cache
    # and tied to the returned DataFrame (_tie_caches_to) — the cache
    # drops when the caller drops the result, so interleaved
    # invocations can't clobber each other and long-lived sessions
    # don't leak (round-4 ADVICE leak item + round-5 review finding).
    # LEFT SEMI, not inner: semantically identical (docs_in_play is
    # distinct), but a semi-join can only ever hash/broadcast its RIGHT
    # side — the in-play doc-id set — never the corpus shingle explode.
    # As an inner join the planner was free to pick the corpus side as
    # the build (observed at 1M docs: BuildLeft broadcast of the full
    # doc-text scan → driver OOM).
    sh_c = _track_cache(
        (sh.join(docs_in_play, "doc_id", "left_semi")
         if docs_in_play is not None else sh).persist()
    )
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    # Both verify joins are pinned to SHUFFLE_HASH: every input here —
    # the pair set, the pair×shingle explode, the shingle slice —
    # scales with dup mass, so any AQE broadcast conversion is a
    # latent driver OOM that only fires on dup-heavy corpora (observed
    # at 1M docs/15k clusters: AQE broadcast the ~|pairs|·avg_shingles
    # intermediate and blew the default driver heap; jobs/
    # incr_dedup_bench.py --rebuild-only is the regression probe).
    # Shuffle-hash keeps the build side per-partition-bounded — the
    # only memory that grows is (dup shingle mass / shuffle
    # partitions) — and avoids sort-merge's two sorts on the fat keys.
    common = (
        pairs
        .join(sh_c.withColumnRenamed("doc_id", "doc_a").hint("shuffle_hash"),
              "doc_a")
        .join(
            sh_c.select(F.col("doc_id").alias("doc_b"), "shingle")
            .hint("shuffle_hash"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return _tie_caches_to(
        out.filter(F.col("jaccard") >= threshold).select(
            "doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard"
        ),
        cache_start,
    )


def minhash_lsh_dedupe(docs: DataFrame, n: int = 2, threshold: float = 0.6,
                       hash: str = "xxhash64",
                       sig_mode: str = "agg") -> DataFrame:
    """Full MinHash→LSH→verify pipeline → near-dup pairs above threshold.

    ``hash="sha256"`` makes every stage bit-reproducible in DuckDB
    (oracle-paired in plans/queries.py); the operator shape — signature
    pass, banded equi-join, candidate-restricted verify — is identical
    in both modes.

    ``sig_mode``:
    - ``"agg"`` — shingle explode → k-min hash aggregate. THE SCALE
      DEFAULT: the shuffle is ~1 row/doc thanks to map-side partial
      mins and the whole pipeline whole-stage-codegens.
    - ``"rowexpr"`` — signatures as per-row array folds
      (``minhash_signature_expr``, zero shuffle), shingles built only
      for candidate docs. Bit-identical pairs (asserted in tests;
      fingerprint-identical at 300k docs), but measured ~2x SLOWER on
      the signature pass (see ``minhash_signature_expr``) — kept as the
      batch twin of the ST9 streaming path, for parity testing and for
      corpora where the explode blowup genuinely can't be afforded.
      Candidate pairs are persisted because three consumers (in-play
      set, verify semi-join, restriction) would otherwise re-run the
      band join.
    """
    cache_start = len(_CACHES)
    if sig_mode == "rowexpr":
        sigs = docs.select(
            "doc_id",
            minhash_signature_expr(F.col("text"), n=n, hash=hash).alias("sig"),
        ).filter(F.col("sig").isNotNull())
        cands = _track_cache(lsh_candidate_pairs(
            sigs, band_key="hash" if hash == "xxhash64" else "string"
        ).persist())
        in_play = cands.select(F.col("doc_a").alias("doc_id")).union(
            cands.select("doc_b")
        ).distinct()
        sh_c = shingles(docs.join(in_play, "doc_id", "left_semi"), n)
        return _tie_caches_to(
            jaccard_verify(sh_c, cands, threshold, restrict=False),
            cache_start,
        )
    sh = shingles(docs, n)
    sigs = minhash_signatures(sh, hash=hash)
    # Persist the candidate pairs (as the rowexpr branch already does):
    # jaccard_verify consumes them three ways (in-play doc-a set,
    # in-play doc-b set, the pair probe itself), and without the
    # persist each consumer recomputes the ENTIRE shingle → signature →
    # band-join pipeline from the raw scan — observed as ~6 full
    # pipeline repetitions in the 1M-doc rebuild plan. The persist also
    # gives AQE real stats for the verify-side joins.
    cands = _track_cache(lsh_candidate_pairs(
        sigs, band_key="hash" if hash == "xxhash64" else "string"
    ).persist())
    return _tie_caches_to(jaccard_verify(sh, cands, threshold), cache_start)


def incremental_near_dup(delta_docs: DataFrame, corpus_docs: DataFrame,
                         corpus_sigs: DataFrame, n: int = 2,
                         threshold: float = 0.6,
                         hash: str = "xxhash64") -> tuple[DataFrame, DataFrame]:
    """Near-dup pairs TOUCHING a delta, at O(delta + matched slice)
    cost — the batch complement of ST9 and the dedup analogue of the
    incremental merge absorption (plans/incremental.py): as new crawl
    batches land, dedupe them against the whole corpus WITHOUT
    re-deduping the corpus against itself.

    Inputs: the delta documents, the corpus documents (read ONLY for
    the candidate-restricted verify slice — never exploded or hashed
    corpus-wide), and the corpus's maintained signature table
    (doc_id, sig) — at scale a snapshot table the caller appends each
    returned delta signature batch to, so signature maintenance is
    itself O(delta).

    Returns ``(pairs, delta_sigs)``:
    - ``pairs`` — verified near-dup pairs (doc_a < doc_b) where at
      least one side is a delta doc: delta x corpus candidates come
      from a band equi-join of the delta's bands against the corpus
      signature table (narrow scan, ~n_bands rows/doc); delta x delta
      pairs are included via the banded self-join of the delta;
    - ``delta_sigs`` — (doc_id, sig) for the delta, to append to the
      signature table.

    Equivalence (asserted in tests + the DuckDB-oracle-paired registry
    query ``doc_incremental_near_dup``): pairs ==
    ``minhash_lsh_dedupe(corpus ∪ delta)`` restricted to pairs with a
    delta member — under the standing assumption that doc_ids are
    globally unique across corpus and delta.
    """
    cache_start = len(_CACHES)
    band_key = "hash" if hash == "xxhash64" else "string"
    sh_delta = shingles(delta_docs, n)
    delta_sigs = minhash_signatures(sh_delta, k=N_MINHASH, hash=hash)
    # banded keys for both sides; the delta side is tiny, the corpus
    # side is a narrow (doc_id, band_id, band_hash) scan of the
    # signature table — no text, no shingles, no corpus explode
    b_delta = banded_signatures(delta_sigs, band_key=band_key)
    b_all = banded_signatures(
        corpus_sigs.select("doc_id", "sig"), band_key=band_key
    ).union(b_delta)
    cands = (
        b_delta.alias("d").join(b_all.alias("c"), ["band_id", "band_hash"])
        .filter(F.col("d.doc_id") != F.col("c.doc_id"))
        .select(
            F.least(F.col("d.doc_id"), F.col("c.doc_id")).alias("doc_a"),
            F.greatest(F.col("d.doc_id"), F.col("c.doc_id")).alias("doc_b"),
        )
        .distinct()
        .persist()  # three consumers: in-play set, verify semi-join
    )
    cands = _track_cache(cands)
    in_play = cands.select(F.col("doc_a").alias("doc_id")).union(
        cands.select("doc_b")
    ).distinct()
    texts = corpus_docs.select("doc_id", "text").union(
        delta_docs.select("doc_id", "text")
    )
    sh_c = shingles(texts.join(in_play, "doc_id", "left_semi"), n)
    pairs = _tie_caches_to(
        jaccard_verify(sh_c, cands, threshold, restrict=False), cache_start
    )
    return pairs, delta_sigs


def ngram_jaccard_pairs(docs: DataFrame, n: int = 2, min_common: int = 10) -> DataFrame:
    """Exact (no-LSH) n-gram overlap — the small-scale oracle-checkable
    variant: pairs sharing ≥ min_common distinct shingles."""
    sh = shingles(docs, n)
    return (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def simhash(docs: DataFrame) -> DataFrame:
    """60-bit SimHash per doc — ENTIRELY builtin expressions.

    Token hashes are 60-bit sha256 hex windows (JVM-side, and
    reproducible in DuckDB — the oracle pairing in plans/queries.py);
    the bit-majority vote is 60 conditional SUM aggregates over the
    exploded tokens: ONE map-side-combinable hash aggregate, no Python,
    no per-bit row blowup. Tie (vote == 0) counts as a 1-bit."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    th = ids_sql.sha256_hash60_expr(F.col("tok"))
    votes = toks.select("doc_id", th.alias("th")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(N_SIMHASH_BITS)
        ]
    )
    val: Column = F.lit(0).cast("long")
    for b in range(N_SIMHASH_BITS):
        val = val + F.when(F.col(f"v{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return votes.select("doc_id", val.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by SimHash: block on 15-bit chunks (pigeonhole:
    hamming ≤ 3 over 4 chunks → at least one chunk identical), verify
    hamming distance with bit_count — all builtins end to end."""
    s = simhash(docs)
    chunk = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftright(F.col("simhash"), i * SIMHASH_CHUNK_BITS)
                .bitwiseAND(F.lit((1 << SIMHASH_CHUNK_BITS) - 1))
                .alias("chunk_val"),
            )
            for i in range(4)
        ])
    )
    blocked = s.select("doc_id", "simhash", chunk.alias("c")).select(
        "doc_id", "simhash", "c.chunk_id", "c.chunk_val"
    )
    pairs = (
        blocked.alias("x")
        .join(blocked.alias("y"), ["chunk_id", "chunk_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def dup_clusters(pairs: DataFrame,
                 a_col: str = "doc_a", b_col: str = "doc_b",
                 max_iters: int = 50,
                 scratch_dir: str | None = None) -> DataFrame:
    """Connected components over a near-dup pair graph →
    ``(doc_id, cluster_id)`` with ``cluster_id = min doc id reachable``
    — the step that turns pairwise dedup verdicts into keep-one-per-
    cluster groups in a training-data pipeline.

    Algorithm: hash-min label propagation with path halving. Each
    round every vertex takes the min of (its label, its neighbors'
    labels, *its label's label* from the previous round) — the last
    term is pointer jumping, which contracts label chains
    geometrically, so convergence is O(log diameter) rounds instead of
    O(diameter) (a 120-node chain converges in ~10 rounds, not 119 —
    asserted in tests). Per round: two equi-joins + one hash agg, all
    map-side combinable; the loop exits as soon as a round changes
    nothing. Labels are parquet-barriered every round (plans/merge.py
    pattern): iterative self-joins otherwise double the logical plan
    per round, which is quadratic driver work by round 10.

    The driver-loop-with-convergence-check is the documented exception
    to "no driver loops" (SURVEY.md §2.11): the loop count is
    O(diameter), data never leaves executors (the only collect is the
    1-row convergence count).

    ``scratch_dir``: where the per-round parquet barriers live. On a
    multi-node cluster this MUST be a shared filesystem path (same
    contract as run_merge's ``barrier_dir``); the default
    tempfile.mkdtemp is only valid in local mode. All state lives under
    ``<scratch_dir>/run``, which is wiped at the START of each call —
    so reusing one scratch_dir never accumulates stale rounds and the
    previous call's final labels are removed; callers wanting a durable
    result should write it onward. Intermediate rounds are deleted as
    they are superseded. Raises RuntimeError if the propagation has not
    converged after ``max_iters`` rounds (a silent partial clustering
    would merge wrong documents downstream).
    """
    import shutil
    import tempfile

    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
    )
    base = scratch_dir or tempfile.mkdtemp(prefix="dup_clusters_")
    scratch = f"{base}/run"

    def _rm(sub: str = "") -> None:
        # Hadoop FS delete → works for local paths AND shared-FS URIs
        target = f"{scratch}/{sub}" if sub else scratch
        try:
            jpath = spark._jvm.org.apache.hadoop.fs.Path(target)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jpath, True)
        except Exception:
            shutil.rmtree(target, ignore_errors=True)

    _rm()  # wipe any previous call's rounds (incl. its final labels)
    edges.write.mode("overwrite").parquet(f"{scratch}/edges")
    edges = spark.read.parquet(f"{scratch}/edges")

    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    from pyspark.sql import Observation

    converged = False
    it = -1
    for it in range(max_iters):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src").agg(F.min("cluster_id").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr_min, labels["doc_id"] == nbr_min["src"], "left")
            .select(
                "doc_id",
                F.col("cluster_id").alias("_old"),
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # path halving: follow the (previous-round) label's label.
        # `labels` is a parquet scan, so this join re-reads the small
        # barriered table — it does NOT recompute the round's agg.
        lbl_of_lbl = labels.select(
            F.col("doc_id").alias("_jid"), F.col("cluster_id").alias("_jlbl")
        )
        stepped = (
            stepped.join(lbl_of_lbl, stepped["cluster_id"] == lbl_of_lbl["_jid"],
                         "left")
            .select(
                "doc_id", "_old",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("_jlbl"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # convergence metric rides the barrier write itself (observe()
        # is collected by the SAME action) — one job per round, not two
        obs = Observation(f"cc_round_{it}")
        stepped = stepped.observe(
            obs, F.sum((F.col("cluster_id") != F.col("_old")).cast("long"))
            .alias("n_changed")
        ).drop("_old")
        stepped.write.mode("overwrite").parquet(f"{scratch}/labels_{it}")
        labels = spark.read.parquet(f"{scratch}/labels_{it}")
        if it > 0:
            _rm(f"labels_{it - 1}")  # superseded round
        # F.sum over ZERO rows observes NULL, not 0 — an empty pair set
        # is trivially converged, not a failure
        if (obs.get["n_changed"] or 0) == 0:
            converged = True
            break
    converged = converged or it < 0  # zero rounds requested edge case
    if it < 0:
        # no round ran, so `labels` still reads the edges parquet that
        # the next line deletes — barrier it to its own files first
        labels.write.mode("overwrite").parquet(f"{scratch}/labels_init")
        labels = spark.read.parquet(f"{scratch}/labels_init")
    _rm("edges")
    if not converged:
        _rm(f"labels_{it}")
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} rounds — "
            "graph diameter exceeds 2^max_iters (path halving); raise "
            "max_iters rather than consuming a partial clustering"
        )
    return labels


def dedupe_paragraphs(docs: DataFrame, sep: str = "\n",
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Sub-document exact dedup (the MassiveText/Gopher paragraph
    pass): across the WHOLE corpus, every repeated paragraph keeps
    only its first occurrence — (min doc_id, then min position) wins —
    and later occurrences are stripped from their documents. Unlike
    strip_boilerplate (which removes a frequent line from EVERY
    document of a source), this keeps exactly one copy globally, so
    syndicated articles and quoted passages survive once.

    Output: ``(doc_id, n_paragraphs, n_dropped, clean_text)`` —
    paragraphs are ``sep``-separated (default line-level; pass
    ``"\\n\\n"`` for blank-line paragraphs), blank paragraphs are
    never deduped. Every input document appears in the output (a doc
    reduced to nothing gets ``clean_text = ''``).

    Scale shape: two honest shuffles, both keyed and combinable —
    (1) winner-per-paragraph is a window over sha256(paragraph), a
    uniformly distributed key (no hot keys by construction); (2) the
    rebuild regroups surviving paragraphs by doc_id. The rebuild
    moves the surviving corpus bytes once — unavoidable for a global
    keep-one semantics, and exactly the shuffle the all-pairs-free
    design of minhash_lsh_dedupe avoids when only PAIRS are needed."""
    from pyspark.sql import Window

    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "para"),
    )
    key = F.sha2(F.col("para").cast("binary"), 256)
    w = Window.partitionBy(key).orderBy(F.col("doc_id").asc(),
                                        F.col("pos").asc())
    flagged = paras.withColumn(
        "_drop",
        (F.trim(F.col("para")) != "") & (F.row_number().over(w) > 1),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_paragraphs"),
            F.sum(F.col("_drop").cast("long")).cast("long")
            .alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(~F.col("_drop"),
                               F.struct(F.col("pos"), F.col("para")))
                    )),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("clean_text"),
        )
    )


def duplicated_ngram_coverage(docs: DataFrame, n: int = 5,
                              min_count: int = 2,
                              hashed: bool = False,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Exact duplicated-substring signal (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): for every document,
    how many of its whitespace tokens sit inside at least one word
    n-gram that occurs >= ``min_count`` times across the whole corpus
    (internal repetition included — a doc repeating itself counts).

    Returns (doc_id, n_tokens, dup_tokens) — both BIGINT, so the
    result is engine- and parallelism-exact (driver-hashable).

    Scale shape (the 100 TB path):
    - positional n-grams via sequence+transform+explode — all JVM, no
      Python; short docs (< n tokens) emit zero grams (guarded: a
      descending ``sequence`` never reaches ``slice``);
    - the corpus-wide gram census is ONE map-side-combinable hash agg,
      filtered to count >= min_count BEFORE the join back, so only
      genuinely duplicated grams shuffle twice;
    - ``hashed=True`` keys the census and join on xxhash64(gram)
      (8-byte keys instead of strings — the at-scale mode; the string
      mode is what DuckDB can reproduce bit-exactly for the oracle);
    - per-doc span union is a gaps-and-islands lag window: intervals
      all have length n and are sorted by start, so the union length
      is sum(min(n, start_i - start_{i-1})) with the first island
      contributing n — one window + one agg, no interval list ever
      materialized.
    """
    from pyspark.sql import Window

    ws = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.size(ws).alias("n_tokens"), ws.alias("ws"))
    grams = F.when(
        F.size("ws") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - n + 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice("ws", i, n), " ").alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<pos:int,gram:string>>"))
    occ = base.select(
        "doc_id", F.explode(grams).alias("g")
    ).select("doc_id", F.col("g.pos").alias("pos"),
             F.col("g.gram").alias("gram"))
    key = F.xxhash64("gram") if hashed else F.col("gram")
    occ = occ.withColumn("gk", key).drop("gram")
    dup_keys = (occ.groupBy("gk").agg(F.count("*").alias("cnt"))
                .filter(F.col("cnt") >= min_count).select("gk"))
    dup_pos = occ.join(dup_keys, "gk").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    contrib = F.when(
        F.lag("pos").over(w).isNull(), F.lit(n)
    ).otherwise(F.least(F.lit(n), F.col("pos") - F.lag("pos").over(w)))
    per_doc = (dup_pos.withColumn("c", contrib)
               .groupBy("doc_id")
               .agg(F.sum("c").cast("long").alias("dup_tokens")))
    return (
        base.select("doc_id", F.col("n_tokens").cast("long"))
        .join(per_doc, "doc_id", "left")
        .select("doc_id", "n_tokens",
                F.coalesce("dup_tokens", F.lit(0)).cast("long")
                .alias("dup_tokens"))
    )
