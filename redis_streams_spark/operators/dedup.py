"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

North-star extensions (absent in the reference — SURVEY §2.2 last row),
built for 100 TB: every stage is a DataFrame transformation whose shuffles
are keyed on doc_id / band-bucket / content-bucket, so work distributes by
hash with no driver materialization.  Hashing uses the cross-engine
md5-based ``h32`` so results are verifiable against the DuckDB oracle
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import (
    LSH_BANDS,
    MINHASH_COEFFS,
    MINHASH_PRIME,
    ROWS_PER_BAND,
    h32,
    h60,
)
from redis_streams_spark.functions.textfns import char_ngrams, word_shingles, words
from redis_streams_spark.functions.rounding import rnd

NORM_RE = "[^a-z0-9]+"


def normalized_text(col=None) -> F.Column:
    """Canonical text form for exact dedup: lowercase, collapse all
    non-alphanumerics to single spaces, trim."""
    if col is None:
        col = F.col("text")
    return F.trim(F.regexp_replace(F.lower(col), NORM_RE, " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on md5 of normalized text: one hash-shuffle on the
    digest (never on the full text — at 100 TB the shuffle carries 32-byte
    keys, not documents)."""
    hashed = fanout(docs).select(id_col, F.md5(normalized_text()).alias("content_hash"))
    w = W.partitionBy("content_hash").orderBy(id_col)
    return hashed.select(
        id_col,
        "content_hash",
        F.count(F.lit(1)).over(W.partitionBy("content_hash")).alias("group_size"),
        F.row_number().over(w).cast("long").alias("dup_rank"),
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


def fanout(df: DataFrame) -> DataFrame:
    """Spread an under-parallel scan across the cluster before CPU-bound
    array work (a single parquet file under maxPartitionBytes otherwise
    runs serially on one core).

    Conditional: at 100 TB the scan already has thousands of splits and an
    unconditional repartition would be a pointless full-corpus shuffle of
    the text column — so the rebalance only happens when the scan has
    fewer partitions than the cluster has cores.  Inspecting the
    partition count triggers physical planning only, no job."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingles array<string>) — distinct word n-gram shingles.

    Tokens are materialized as a column BEFORE the shingle lambda:
    expressions referenced inside higher-order-function lambdas are
    re-evaluated per element, so building shingles directly over
    ``words(text)`` would re-split the text O(shingles) times per row.
    """
    toks = fanout(docs).select("doc_id", words("text").alias("w"))
    return toks.select("doc_id", word_shingles(F.col("w"), n).alias("shingles"))


def minhash_band_rows(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, band_idx, band_hash): LSH band buckets of the 32-perm
    minhash signature."""
    return band_rows_from_sets(shingle_sets(docs, n))


def minhash_signatures(sets_: DataFrame) -> DataFrame:
    """(doc_id, m0..m31): the 32-perm minhash signature of each shingle
    set — the step band_rows_from_sets bands up, exposed for operators
    that re-band the SAME signatures differently (band-tuning curves,
    signature-agreement audits)."""
    sh = sets_.select("doc_id", F.explode("shingles").alias("shingle"))
    h = sh.select("doc_id", h32(F.col("shingle")).alias("h"))
    return minhash_from_hashes(h)


def minhash_from_hashes(h: DataFrame) -> DataFrame:
    """(doc_id, m0..m31) from pre-hashed shingles (doc_id, h) — the
    permute+min half of :func:`minhash_signatures`.  Signatures are
    IDENTICAL whichever entry point is used: h32 is the same hash, and
    min over a set equals min over its multiset, so hash-set dedup
    (array_distinct after hashing) cannot move a minimum."""
    perms = h.select(
        "doc_id",
        *[
            ((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"p{j}")
            for j, (a, b) in enumerate(MINHASH_COEFFS)
        ],
    )
    return perms.groupBy("doc_id").agg(
        *[F.min(f"p{j}").alias(f"m{j}") for j in range(len(MINHASH_COEFFS))]
    )


def hashed_shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh array<long>): the h32-hashed shingle SET — the
    storage/verification form the persisted dedup index uses
    (operators/dupindex.py).  8-byte sorted hashes instead of ~20-byte
    shingle strings: ~4x fewer bytes on the verify store and scan, and
    one downstream md5 pass saved (bands derive from these hashes
    directly via :func:`band_rows_from_hashes`).

    Semantics: exact set-Jaccard AT HASH RESOLUTION — two distinct
    shingles colliding in h32 (2^-32 per pair) merge.  The minhash
    CANDIDATE stage already lives at this resolution (signatures hash
    shingles with the same h32), so hashing the verify step aligns the
    two stages; the string-set form (:func:`shingle_sets`) remains the
    collision-free reference and the two agree on every verdict at
    test scale (asserted in tests/test_dupindex.py).  Sorted for
    deterministic storage (delta-encodes well in parquet)."""
    sets_ = shingle_sets(docs, n)
    return sets_.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(F.transform("shingles", lambda s: h32(s)))
        ).alias("sh"),
    )


def band_rows_from_hashes(hsets: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) from (doc_id, sh) hashed shingle
    sets — :func:`band_rows_from_sets` minus the md5 pass, emitting
    IDENTICAL band rows (see :func:`minhash_from_hashes`)."""
    h = hsets.select("doc_id", F.explode("sh").alias("h"))
    return _bands_from_minhash(minhash_from_hashes(h))


def band_rows_from_sets(sets_: DataFrame) -> DataFrame:
    """Band rows from a (doc_id, shingles) frame.  Shingle hashing and the
    (a*h+b) mod P permutations stay inside whole-stage codegen; the only
    shuffle is the doc_id re-aggregation of the signature.

    Shape notes (measured at sf0.1, do not "simplify"):
    - The permutations are computed in a PROJECTION and the aggregates are
      plain ``min(col)``: putting ``(a*h+b) % P`` inside the 32 aggregate
      functions made the generated aggregate code big enough that cold
      whole-stage-codegen compile took 5.7 s vs 1.9 s projection-first
      (warm runs identical).  The driver's bench is one-shot cold.
    - Computing the signature per-row with nested higher-order functions
      (transform over a coefficient array + array_min) avoids the groupBy
      shuffle but runs 3× slower — HOF lambdas evaluate interpreted,
      outside whole-stage codegen.  The shuffle here carries
      (doc_id, 32×long) rows — signature-sized, not document-sized — so
      it also scales fine.
    """
    return _bands_from_minhash(minhash_signatures(sets_))


def _bands_from_minhash(mins: DataFrame) -> DataFrame:
    # band key: xxhash64 directly over the band's signature longs.  Equal
    # hash ⇔ equal band signature (mod 64-bit collisions), which is all
    # the bucket join needs — the hash never appears in query output, so
    # the DuckDB oracle's md5-over-concat band key yields the SAME pairs.
    # vs the previous md5(concat_ws(cast...)): no 32 string casts, no 8
    # concats, and an 8-byte long shuffle key instead of a 32-char string
    # (the bucket join's exchange carries ~4× less key data).
    bands = mins.select(
        "doc_id",
        F.array(
            *[
                F.xxhash64(
                    *[
                        F.col(f"m{b * ROWS_PER_BAND + r}")
                        for r in range(ROWS_PER_BAND)
                    ]
                )
                for b in range(LSH_BANDS)
            ]
        ).alias("bands"),
    )
    return bands.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_hash")
    )


# Bound on the member count of a single LSH bucket the pair enumerators
# will expand (r14, the r13 verdict's one flagged scale risk): the
# bucket-aggregation shape collects a bucket's ids into ONE array row,
# so a degenerate corpus (every document identical) would funnel the
# whole corpus into one aggregation buffer and then emit C(n,2) pairs
# from it.  At the cap the array is 8 bytes x 100k = 0.8 MB and the
# quadratic output 5e9 pairs — already far beyond any sane pair-verify
# budget, so a bucket larger than this is a modeling error, not a
# workload: the enumerator fails LOUDLY naming the cap instead of
# grinding toward a single-task OOM, and the error points at the
# linear-at-scale clustering path (minhash_lsh_star_edges).
PAIR_BUCKET_CAP = 100_000


def expand_bucket_pairs(
    buckets: DataFrame,
    extra: tuple[str, ...] = (),
    max_bucket: int | None = PAIR_BUCKET_CAP,
) -> DataFrame:
    """(a_id, b_id, *extra) i<j pairs from a bucket frame carrying a
    SORTED ``ids`` array — the shared in-row pair expansion of the
    bucket-aggregation candidate generators.

    Shape (r14): the expansion streams through TWO chained Generates —
    posexplode the members, then explode each member's tail slice — so
    peak per-row memory is O(bucket) (the ids array itself), never the
    O(bucket²) pair array the previous ``flatten(transform(transform))``
    built in one row before exploding; the transform lambdas also ran
    interpreted (HOF) where Generate is whole-stage-codegen.
    ``max_bucket`` guards the remaining O(bucket) hazard: an oversized
    bucket raises with the cap named (see PAIR_BUCKET_CAP) rather than
    expanding quadratically; pass ``None`` to disable."""
    ids = F.col("ids")
    if max_bucket is not None:
        ids = F.when(
            F.size("ids") > max_bucket,
            F.raise_error(
                F.format_string(
                    "expand_bucket_pairs: a bucket holds %s members "
                    f"(max_bucket={max_bucket}) — quadratic pair "
                    "expansion of a bucket this hot is a single-task "
                    "memory/output hazard; raise max_bucket only if "
                    "C(n,2) output is truly intended, or use the "
                    "linear star-edges path (minhash_lsh_star_edges)",
                    F.size("ids"),
                )
            ),
        ).otherwise(F.col("ids"))
    step1 = buckets.select(
        *extra, F.col("ids"), F.posexplode(ids).alias("i", "a_id")
    )
    return step1.select(
        *extra,
        "a_id",
        F.explode(
            F.slice(F.col("ids"), F.col("i") + 2, F.size("ids"))
        ).alias("b_id"),
    )


def lsh_candidate_pairs(band_rows: DataFrame) -> DataFrame:
    """Distinct (a_id < b_id) doc pairs sharing any (band_idx, band_hash)
    bucket — THE candidate generator, extracted so the pair queries, the
    band-tuning curve, and the estimator audit share one copy of the
    predicate (review finding, r08).

    Shape (r13 optimization): pairs are enumerated per bucket from ONE
    aggregation (collect bucket members, emit the sorted i<j pairs) —
    not a bucket-keyed self-join.  The self-join form evaluated its
    input subtree twice (both join sides recompute the full signature
    pipeline: explode → h32 → 32 permutations → groupBy min — the most
    expensive stage of every LSH query, and a full duplicate corpus
    pass at 100 TB); persisting the band rows to deduplicate it just
    serialized the two passes (measured at sf0.1: 3.9-6.3 s vs 3.0-3.3 s
    unpersisted).  The aggregation form computes the signatures ONCE by
    construction, shuffles the same (band_idx, band_hash)-keyed bytes
    the join did, and drops the join's second exchange.  Output pairs
    are C(bucket, 2) either way — quadratic in bucket size, like the
    join, and fine for non-degenerate corpora where a bucket only
    collects near-identical signatures; the expansion itself streams
    and is capped (r14 — see :func:`expand_bucket_pairs`), and the
    clustering path that must survive adversarial bucket sizes uses
    minhash_lsh_star_edges (linear) instead."""
    buckets = (
        band_rows.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    return expand_bucket_pairs(buckets).distinct()


def exact_jaccard_cols() -> tuple[F.Column, F.Column]:
    """(intersection size, jaccard) over shingle columns named sa/sb —
    the one copy of the inter/union/greatest clamp arithmetic."""
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    return inter, inter * 1.0 / F.greatest(union, F.lit(1))


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.3) -> DataFrame:
    """Candidate pairs via LSH band-bucket self-join, then exact Jaccard
    verification on the shingle sets.  Returns every candidate with its
    verified jaccard + is_dup flag (candidates that fail verification are
    retained so false-positive behavior is observable).

    Scale: the self-join is keyed on (band_idx, band_hash) — skew-safe for
    non-degenerate corpora since a bucket only collects near-identical
    signatures; the verify join is an equi-join on doc_id against the
    (small) candidate set.
    """
    # The shingle frame feeds signature build AND both verify sides, and
    # is deliberately NOT persisted (r13 optimization, guide §5): a
    # persist here materializes the corpus-sized exploded-shingle frame
    # behind a barrier that SERIALIZES the pipeline — measured at sf0.1
    # (interleaved, 4 reps) persist 2.58 s median vs no-persist 2.27 s,
    # no-persist winning every rep, and the same every-warm-rep win at
    # the 10× corpus (7.8/5.7/4.9 vs 6.5/4.5/4.4).  Recomputing the
    # tokenize+shingle projection per consumer is whole-stage-codegen
    # work that pipelines with each consumer's shuffle (SCALE.md: 32
    # cores re-minhash 150 M shingles in ~2 s), while at 100 TB a
    # persisted MEMORY_AND_DISK copy of the shingle frame is a corpus-
    # sized disk write + 3 reads.  Construction-time persist also
    # registers the subtree in the CacheManager for the whole session
    # (the dedup_tier_summary poisoning class, OPTIMIZATION_r13 §14).
    sets_ = shingle_sets(docs, n)
    bands = band_rows_from_sets(sets_)
    cands = lsh_candidate_pairs(bands)
    sa = sets_.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa"))
    sb = sets_.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb"))
    joined = cands.join(sa, "a_id").join(sb, "b_id")
    inter, jaccard = exact_jaccard_cols()
    # NO presentation sort: the pair output is C(clique,2) rows per
    # clique at real duplicate density, and globally range-sorting 43M
    # result rows buys nothing the order-insensitive correctness gate
    # needs (driver-verified: 33 green queries emit unsorted).  Measured
    # at the 100x load: 251 s -> 225 s wall from dropping the orderBy
    # (the remaining cost is enumeration + emit, SCALE.md); negligible
    # at sf0.1 where the output is small.  Callers that want ordered
    # output sort the (small) filtered result themselves.
    return joined.select(
        "a_id",
        "b_id",
        inter.cast("long").alias("n_common"),
        rnd(jaccard, 6).alias("jaccard"),
    ).withColumn("is_dup", F.col("jaccard") >= threshold)


def minhash_lsh_star_edges(
    docs: DataFrame, n: int = 3, threshold: float = 0.3
) -> DataFrame:
    """Near-dup edges for the CLUSTERING path: per LSH band bucket emit
    only the (bucket-min doc, doc) STAR edges — O(bucket size) rows —
    instead of :func:`minhash_lsh_pairs`' all C(bucket,2) pairs, then
    exact-Jaccard-verify just those edges.  Feed the result to
    :func:`connected_components`.

    Why this exists (round-7 scale finding, SCALE.md): with k-member
    duplicate cliques the all-pairs candidate list grows as C(k,2) per
    clique — at the 100× load, 295 s of the 364 s composed pipeline was
    pair enumeration feeding CC, which only needs a spanning set.  Star
    edges to the bucket minimum preserve within-bucket connectivity at
    k-1 edges per bucket, so the verified edge list is linear in corpus
    size, not quadratic in clique size.

    Semantics note: the star edge set is a SUBSET of the all-pairs set,
    so after Jaccard verification clusters can only be equal or finer
    than all-pairs clusters (a bucket whose min-doc fails verification
    against members that would pass against each other splits).  For
    actual near-duplicate cliques — mutually similar members, which is
    what LSH buckets collect at the configured band/row setting — every
    star edge verifies and the components are identical; the parity is
    asserted on the synthetic corpus in tests/test_dedup_operators.py.

    Scale shape: one window-min shuffle keyed on (band_idx, band_hash)
    — the same key the pair self-join would use, minus the join's
    quadratic output; a degenerate giant bucket degrades to a linear
    straggler, never a quadratic one.  The verify join is an equi-join
    on doc_id against the (linear) edge list.
    """
    # NOT persisted (r13 optimization, guide §5): same finding as
    # minhash_lsh_pairs — all three shingle consumers (bands + both
    # verify sides) sit inside the ONE materialization of the edge list
    # (connected_components persists the symmetrized edges), so a
    # persist here serializes that single pass behind a corpus-sized
    # cache build instead of letting the cheap tokenize+shingle
    # projection pipeline into each consumer (interleaved fresh-process
    # A/B on dedup_clusters_lsh at sf0.1, 8 reps both orders: persist
    # median 6.86 s vs no-persist 5.31 s, no-persist wins 7/8
    # head-to-heads).  It also
    # registered the shingle subtree in the session CacheManager at
    # construction time, silently substituting an InMemoryRelation into
    # every later query that builds shingle_sets(docs, 3) — the
    # dedup_tier_summary poisoning class (OPTIMIZATION_r13 §14).
    sets_ = shingle_sets(docs, n)
    bands = band_rows_from_sets(sets_)
    bw = W.partitionBy("band_idx", "band_hash")
    star = (
        bands.withColumn("root", F.min("doc_id").over(bw))
        .where(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("a_id"), F.col("doc_id").alias("b_id"))
        .distinct()
    )
    sa = sets_.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa"))
    sb = sets_.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb"))
    joined = star.join(sa, "a_id").join(sb, "b_id")
    _, jaccard = exact_jaccard_cols()
    return joined.where(jaccard >= threshold).select("a_id", "b_id")


def simhash_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over term frequencies.

    Token hash bits vote +tf/−tf per position; explode over 32 bit
    positions keeps everything in built-in expressions (no UDF).
    """
    tf = (
        fanout(docs).select("doc_id", F.explode(words("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("doc_id", h32(F.col("tok")).alias("h"), "tf")
    )
    bits = tf.select(
        "doc_id",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit"),
    )
    votes = bits.groupBy("doc_id", "bit").agg(
        F.sum(
            F.when(F.expr("(shiftright(h, bit) & 1) = 1"), F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias("vote")
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("vote") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")
                ).otherwise(0)
            ).alias("simhash")
        )
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash byte-banding: pairs agreeing on ≥1 of the
    4 signature bytes (pigeonhole guarantee for hamming ≤ 3 per byte-span),
    verified by exact popcount hamming distance ≤ max_hamming."""
    sh = simhash_docs(docs)
    bytes_ = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("byte_idx"),
    ).withColumn("byte_val", F.expr("shiftright(simhash, byte_idx * 8) & 255"))
    a, b = bytes_.alias("a"), bytes_.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.byte_idx") == F.col("b.byte_idx"))
            & (F.col("a.byte_val") == F.col("b.byte_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 4, bucket_col: str = "source", threshold: float = 0.2
) -> DataFrame:
    """Character n-gram Jaccard via an INVERTED INDEX: explode distinct
    grams, equi-join postings on (bucket, gram), group-count the
    intersection, then derive Jaccard from the precomputed set sizes.

    Scale: the old shape (all-pairs join keyed on bucket alone, carrying
    full gram arrays) is quadratic in bucket size — a provenance bucket is
    unbounded at 100 TB.  Here the join is keyed on (bucket, gram): only
    docs that actually SHARE a gram ever meet, cost is sum over grams of
    df² within a bucket (df = docs containing that gram), the shuffle
    carries 4-char postings instead of whole gram arrays, and any
    threshold > 0 is unaffected because zero-intersection pairs can't
    qualify.  Set sizes ride along on the postings (min-agg per pair) so
    no extra join is needed."""
    # materialize the normalized string first — char_ngrams' substring
    # lambda would otherwise recompute the regexp_replace per n-gram
    grams = (
        fanout(docs)
        .select("doc_id", F.col(bucket_col).alias("bucket"), normalized_text().alias("norm"))
        .select("doc_id", "bucket", char_ngrams(F.col("norm"), n).alias("grams"))
    )
    # postings: one row per (doc, distinct gram); sz rides along so the
    # pair aggregation below needs no second join against a sizes table
    inv = grams.select(
        "doc_id", "bucket", F.size("grams").alias("sz"), F.explode("grams").alias("gram")
    )
    a, b = inv.alias("a"), inv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = (
        pairs.groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.min("a.sz").alias("na"),
            F.min("b.sz").alias("nb"),
        )
    )
    union = F.col("na") + F.col("nb") - F.col("n_common")
    return (
        inter.select(
            "a_id",
            "b_id",
            rnd(F.col("n_common") * 1.0 / F.greatest(union, F.lit(1)), 6).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 20,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components over near-dup pairs → (node, cluster_id)
    with cluster_id = min node id in the component — the step that turns
    pairwise dedup verdicts into canonical document clusters.

    Iterative min-label propagation: each round joins labels across
    edges and keeps the per-node minimum; converges in O(diameter)
    rounds (near-dup clusters are tiny chains, typically 1-3).  Each
    round is a distributed join+agg — the driver only checks the
    convergence counter, never the data.  At 100 TB this is the standard
    large-graph CC pattern (alternating large/small-star variants exist
    for adversarial diameters — upgrade path if cluster diameters grow
    beyond a handful of rounds).

    ``reliable_checkpoint=True`` uses ``checkpoint()`` (written to
    ``spark.sparkContext.setCheckpointDir``) instead of
    ``localCheckpoint()``: on a real cluster an executor loss invalidates
    local checkpoints mid-iteration, killing a long CC run; reliable
    checkpoints survive.  Local mode keeps the cheaper default.
    """

    def ckpt(df: DataFrame) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint()
        return df.localCheckpoint()

    # persist the (usually expensive) edge lineage ONCE — every iteration
    # joins against it, and without the persist the whole upstream
    # pipeline (e.g. n-gram similarity) re-executes per round
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    # checkpointing truncates the logical plan each round — without it
    # the lineage (and Catalyst analysis time) grows per iteration, the
    # classic iterative-DataFrame pathology
    sym = ckpt(sym)
    labels = ckpt(
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(max_iter):
        candidate = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), "lbl")
            .unionByName(labels.select("node", "lbl"))
            .groupBy("node")
            .agg(F.min("lbl").alias("new_lbl"))
        )
        merged = ckpt(labels.join(candidate, "node"))
        changed = merged.where(F.col("new_lbl") < F.col("lbl")).limit(1).count()
        labels = merged.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("lbl").alias("cluster_id"))


def connected_components_star(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 20,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — same (node, cluster_id=component min) contract as
    :func:`connected_components`, but converging in O(log n) rounds
    REGARDLESS of component diameter, vs O(diameter) for min-label
    propagation.  This is the adversarial-diameter upgrade path the
    min-label docstring references: use it when near-dup clusters can
    chain (e.g. template drift across a crawl).

    Per round, both stars are pure join+agg — no collect_list, no driver
    data:
    - large-star: m(u) = min over Γ(u) ∪ {u}; every LARGER neighbor of u
      re-points to m(u).
    - small-star: on canonical (u → smaller v) edges, every smaller
      neighbor and u itself point to the minimum.
    Terminates when the canonical edge set stops changing (checked with
    an except().limit(1) probe, a scalar — not a materialization).
    """

    def ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if reliable_checkpoint else df.localCheckpoint()

    raw = edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    # node universe (kept so self-pair singletons survive the u≠v filter)
    nodes = ckpt(
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    cur = ckpt(raw.where(F.col("u") != F.col("v")).distinct())
    for _ in range(max_rounds):
        # -- large-star ------------------------------------------------
        sym = cur.unionByName(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star ------------------------------------------------
        canon = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        smins = canon.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            canon.join(smins, "u")
            .select(F.col("v").alias("n"), "m")
            .unionByName(smins.select(F.col("u").alias("n"), "m"))
            .where(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        nxt = ckpt(ss)
        progressed = (
            nxt.exceptAll(cur).limit(1).count() + cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if progressed == 0:
            break
    # converged: every edge is (node → component root); roots and
    # singletons label themselves
    labels = cur.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node", F.coalesce("cluster_id", F.col("node")).alias("cluster_id")
        )
    )


def incremental_dedup(
    history: DataFrame,
    batch: DataFrame,
    n: int = 3,
    threshold: float = 0.3,
    hashed: bool = False,
) -> DataFrame:
    """Ingest-time dedup of a new batch against an existing corpus:
    per batch doc a verdict ``exact_dup`` (normalized-text digest already
    in history), ``near_dup`` (shares an LSH band with a history doc and
    exact shingle-Jaccard ≥ threshold), or ``keep``; ``match_id`` is the
    smallest matching history doc_id (exact match wins precedence).

    ``hashed=True`` verifies on h32-hashed shingle sets instead of the
    strings (:func:`hashed_shingle_sets`) — the semantics the persisted
    dedup index stores (operators/dupindex.py); this form is its
    recompute-from-text reference.  Bands are identical either way;
    only the Jaccard verification resolution differs (and only under
    h32 collisions).

    This is the batch form of the streaming near-dup path
    (``streaming/neardup.py``): at 100 TB the history side's digests and
    band rows are a persisted index that each ingest batch equi-joins
    against — both joins are keyed on digests (32-byte md5 / band hash),
    never on document text, and the batch side is tiny relative to
    history, so candidate fan-out is bounded by true near-dup density.
    """
    bnorm = batch.select("doc_id", F.md5(normalized_text()).alias("content_hash"))
    hnorm = history.select(
        F.col("doc_id").alias("h_id"), F.md5(normalized_text()).alias("content_hash")
    )
    exact = (
        bnorm.join(hnorm, "content_hash")
        .groupBy("doc_id")
        .agg(F.min("h_id").alias("exact_match"))
    )
    # Shingle frames NOT persisted (r13 optimization, guide §5): each
    # side has two consumers (its band rows + its verify side), all
    # inside one materialization — recomputing the codegen
    # tokenize+shingle projection per consumer pipelines, while a
    # persist materializes both corpus-sized frames behind barriers
    # that serialize the pass.  Locally a WASH (interleaved
    # fresh-process A/B on dedup_incremental at sf0.1, 8 reps both
    # orders: no-persist wins 5/8 head-to-heads, medians 5.09 s vs
    # 4.90 s — within the sandbox's drift); decided by the 100 TB
    # posture — a MEMORY_AND_DISK persist of the history-side shingle
    # frame is a corpus-sized disk write + 2 reads, while the recompute
    # is whole-stage-codegen work that pipelines (the §15 argument the
    # pair path already carries) — and by CacheManager hygiene: a
    # construction-time persist registers the subtrees in the session
    # CacheManager (OPTIMIZATION_r13 §14 poisoning class).
    if hashed:
        bsets = hashed_shingle_sets(batch, n)
        hsets = hashed_shingle_sets(history, n)
        bands_of, set_col = band_rows_from_hashes, "sh"
    else:
        bsets = shingle_sets(batch, n)
        hsets = shingle_sets(history, n)
        bands_of, set_col = band_rows_from_sets, "shingles"
    cands = (
        bands_of(bsets)
        .join(
            bands_of(hsets).select(
                F.col("doc_id").alias("h_id"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select("doc_id", "h_id")
        .distinct()
    )
    ver = cands.join(
        bsets.select("doc_id", F.col(set_col).alias("sa")), "doc_id"
    ).join(
        hsets.select(F.col("doc_id").alias("h_id"), F.col(set_col).alias("sb")),
        "h_id",
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    near = (
        ver.where(rnd(inter * 1.0 / F.greatest(union, F.lit(1)), 6) >= threshold)
        .groupBy("doc_id")
        .agg(F.min("h_id").alias("near_match"))
    )
    return (
        batch.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_match").isNotNull(), F.lit("exact_dup"))
            .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
            F.coalesce("exact_match", "near_match").alias("match_id"),
        )
        .orderBy("doc_id")
    )


def positioned_ngrams(docs: DataFrame, n: int = 8) -> DataFrame:
    """(doc_id, pos, g): every word n-gram of each document with its
    1-based start position and 60-bit fingerprint.

    The fingerprint is :func:`h60`, not the gram string: the global
    duplicated-gram detection below shuffles one row per corpus TOKEN,
    so the shuffle key must be 8 bytes, and 32 bits would birthday-
    collide at ~10^5 distinct grams (every collision fabricates a
    duplicated span); 60 bits holds to ~10^9.  This is the standard
    fingerprint trade of suffix-array substring dedup reimplementations
    (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better" — their exact-substring pass; the n-gram fingerprint
    form is the distributed-engine restatement)."""
    toks = fanout(docs).select("doc_id", words(F.col("text")).alias("w"))
    idx = F.sequence(F.lit(1), F.size("w") - (n - 1))
    # fingerprints materialize as an array in ONE projection and the
    # explode emits (pos, 8-byte g) rows only: exploding positions first
    # and slicing after would copy the full token array into every gram
    # row — O(tokens²) bytes per document, fatal on long docs.  The HOF
    # lambda runs interpreted (band_rows_from_sets' measured trade) but
    # does O(tokens·n) work total.
    gs = toks.where(F.size("w") >= n).select(
        "doc_id",
        F.transform(
            idx, lambda i: h60(F.concat_ws(" ", F.slice(F.col("w"), i, n)))
        ).alias("gs"),
    )
    return gs.select("doc_id", F.posexplode("gs").alias("p0", "g")).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), "g"
    )


def duplicated_spans(
    docs: DataFrame, n: int = 8, min_count: int = 2
) -> DataFrame:
    """Substring-level dedup: maximal duplicated token spans per doc —
    (doc_id, span_start, span_end, span_tokens), positions 1-based
    inclusive.

    A token position is COVERED when some n-gram starting at it occurs
    ≥ ``min_count`` times in the whole corpus (within- or cross-doc —
    Lee et al. 2021 remove any repeated substring, same-document
    repeats included).  Covered n-gram intervals [pos, pos+n-1] that
    overlap or touch merge into maximal spans (gaps-and-islands on the
    sorted starts: a new span starts when the gap to the previous start
    exceeds n).

    Scale shape: two shuffles on the 8-byte fingerprint (partial-agg
    count, then the semi-join back), one shuffle on doc_id for the
    island window — never a shuffle carrying document text.  The
    duplicated-gram frame is output-sized (true duplicate density),
    not corpus-sized."""
    grams = positioned_ngrams(docs, n)
    dup = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi").select("doc_id", "pos")
    return spans_from_hits(hits, n)


def spans_from_hits(hits: DataFrame, n: int) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens) from covered n-gram
    START positions (doc_id, pos) — the gaps-and-islands merge half of
    :func:`duplicated_spans`, shared with the incremental probe
    (operators/gramindex.py), so the two paths cannot drift."""
    wp = W.partitionBy("doc_id").orderBy("pos")
    isl = hits.select(
        "doc_id",
        "pos",
        F.sum(
            F.when(
                F.coalesce(F.col("pos") - F.lag("pos").over(wp), F.lit(n + 1))
                > n,
                1,
            ).otherwise(0)
        )
        .over(wp.rowsBetween(W.unboundedPreceding, 0))
        .alias("island"),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (n - 1)).alias("span_end"),
        (F.max("pos") + (n - 1) - F.min("pos") + 1).alias("span_tokens"),
    ).drop("island")


def duplicated_span_profile(
    docs: DataFrame, n: int = 8, min_count: int = 2
) -> DataFrame:
    """Per-document rollup of :func:`duplicated_spans`: (doc_id,
    n_spans, dup_tokens, n_tokens, dup_ratio) for every doc holding at
    least one duplicated span — the triage frame a pipeline filters or
    trims on (Lee et al. cut the spans; Gopher-style pipelines drop
    docs past a ratio)."""
    spans = duplicated_spans(docs, n, min_count)
    roll = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    ntok = docs.select("doc_id", F.size(words(F.col("text"))).cast("long").alias("n_tokens"))
    return roll.join(ntok, "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_tokens",
        "n_tokens",
        rnd(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_ratio"),
    )


def strip_duplicated_spans(
    docs: DataFrame, n: int = 8, min_count: int = 2
) -> DataFrame:
    """Lee et al. 2021's remedy applied: (doc_id, clean_text) with every
    duplicated span CUT from the (normalized) token stream — the
    survivors of :func:`duplicated_spans` joined back out.  Docs with
    nothing duplicated pass through whole; a doc that is one big
    duplicated span comes back empty (the dedup policy decision of
    keeping one canonical copy belongs to the caller — compose with
    exact_dedup's is_canonical to retain one).

    Scale shape: covered positions explode from the spans frame
    (duplicate-mass-sized, not corpus-sized), anti-join the token
    stream on (doc_id, pos), and the per-doc rebuild is one doc_id
    aggregation (array_sort over collect_list — same bounded-per-doc
    pattern as the centroid rebuilds)."""
    spans = duplicated_spans(docs, n, min_count)
    covered = spans.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end"))
        ).alias("pos"),
    ).distinct()
    toks = fanout(docs).select("doc_id", words(F.col("text")).alias("w"))
    pos_tok = toks.select(
        "doc_id", F.posexplode("w").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    kept = pos_tok.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda r: r["tok"],
            ),
        ).alias("clean_text")
    )
    # docs whose every token was covered drop out of the aggregation;
    # re-attach them (and untouched docs are already present) so the
    # output is one row per input doc
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select("doc_id", F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    )
