"""Dedup queries over ``documents`` with fully-mirrored DuckDB oracles.

The oracle SQL re-implements the identical deterministic arithmetic
(md5-based h32, the same 32 minhash (a,b) coefficients, the same band
layout) so the LSH pipelines hash-match exactly — not just statistically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import (
    LSH_BANDS,
    MINHASH_COEFFS,
    MINHASH_PRIME,
    ROWS_PER_BAND,
    h32_sql,
)
from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.functions.textfns import word_shingles_sql, words_sql
from redis_streams_spark.operators.dedup import (
    NORM_RE,
    exact_dedup,
    incremental_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_docs,
    simhash_pairs,
)
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_NORM_SQL = f"trim(regexp_replace(lower(text), '{NORM_RE}', ' ', 'g'))"


@register(
    "dedup_exact",
    shape="per_row",
    tags=("dedup",),
    bench=True,
    oracle=f"""
WITH h AS (
  SELECT doc_id, md5({_NORM_SQL}) AS content_hash FROM documents
)
SELECT doc_id, content_hash,
       count(*) OVER (PARTITION BY content_hash) AS group_size,
       row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS dup_rank,
       row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) = 1 AS is_canonical
FROM h
ORDER BY doc_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy on normalized-text digest): SURVEY §2.2
    north-star.  The shuffle key is the 32-byte md5, never the document.
    No presentation sort: per-doc output (r08 verdict ask #3)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


def minhash_bands_cte(src: str = "documents") -> str:
    """Shared oracle CTE body: tokens → 3-shingles → h32 → 32-perm
    minhash signatures → LSH band rows.  The SINGLE source of the
    MinHash-LSH SQL math — dedup_minhash_lsh, dedup_incremental, and
    dedup4's threshold curve all build on this, so the oracle side can
    never desynchronize from the shared Spark operator
    (operators/dedup.py band_rows_from_sets)."""
    min_exprs = ",\n         ".join(
        f"min(({a} * h + {b}) % {MINHASH_PRIME}) AS m{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_idx, md5({concat}) AS band_hash FROM sigs".format(
            b=b,
            concat=" || ',' || ".join(
                f"m{b * ROWS_PER_BAND + r}::VARCHAR" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(LSH_BANDS)
    )
    return f"""toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM {src}
), sh AS (
  SELECT doc_id, {word_shingles_sql('w', 3)} AS s FROM toks
), hv AS (
  SELECT doc_id, {h32_sql('shingle')} AS h
  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh) t
), sigs AS (
  SELECT doc_id,
         {min_exprs}
  FROM hv GROUP BY doc_id
), bands AS (
{band_selects}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {minhash_bands_cte()}, cands AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
)
SELECT c.a_id, c.b_id,
       len(list_intersect(sa.s, sb.s))::BIGINT AS n_common,
       round(5e-10 + len(list_intersect(sa.s, sb.s)) * 1.0 /
             greatest(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)), 1),
             6) AS jaccard,
       round(5e-10 + len(list_intersect(sa.s, sb.s)) * 1.0 /
             greatest(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)), 1),
             6) >= 0.3 AS is_dup
FROM cands c
JOIN sh sa ON sa.doc_id = c.a_id
JOIN sh sb ON sb.doc_id = c.b_id
ORDER BY c.a_id, c.b_id
"""


@register("dedup_minhash_lsh", shape="per_row", tags=("dedup", "lsh"), bench=True, oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection: shingle → 32 minhash perms → 16
    band buckets → bucket self-join → exact-Jaccard verification.
    Oracle re-computes the identical signature arithmetic in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, n=3, threshold=0.3)


_SIMHASH_CORE = f"""
toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS tok FROM toks) t
  GROUP BY doc_id, tok
), hv AS (
  SELECT doc_id, {h32_sql('tok')} AS h, tf FROM tf
), bits AS (
  SELECT doc_id, h, tf, unnest(range(0, 32)) AS bit FROM hv
), votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN tf ELSE -tf END) AS vote
  FROM bits GROUP BY doc_id, bit
), sim AS (
  SELECT doc_id,
         sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
  FROM votes GROUP BY doc_id
)"""


@register(
    "text_simhash",
    shape="per_row",
    tags=("dedup", "simhash"),
    oracle=f"""
WITH {_SIMHASH_CORE}
SELECT doc_id, simhash FROM sim ORDER BY doc_id
""",
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash over term frequencies (bit-exact on
    both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_docs(docs)


@register(
    "dedup_simhash_pairs",
    shape="per_row",
    tags=("dedup", "simhash"),
    oracle=f"""
WITH {_SIMHASH_CORE}
, bytes AS (
  SELECT doc_id, simhash, b AS byte_idx, (simhash >> (b * 8)) & 255 AS byte_val
  FROM sim, (SELECT unnest(range(0, 4)) AS b) bs
), cands AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM bytes a JOIN bytes b
    ON a.byte_idx = b.byte_idx AND a.byte_val = b.byte_val AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
FROM cands
WHERE bit_count(xor(sh_a, sh_b)) <= 3
ORDER BY a_id, b_id
""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: byte-band candidate generation + exact
    hamming-distance verification (≤ 3 of 32 bits)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3)


@register(
    "dedup_ngram_jaccard",
    shape="per_row",
    tags=("dedup", "ngram"),
    oracle=f"""
WITH norms AS (
  SELECT doc_id, source AS bucket, {_NORM_SQL} AS nrm FROM documents
), grams AS (
  SELECT doc_id, bucket,
         list_distinct(CASE WHEN len(nrm) >= 4 THEN
           list_transform(range(1, len(nrm) - 2), i -> substr(nrm, i, 4))
           ELSE [] END) AS g
  FROM norms
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(5e-10 + len(list_intersect(a.g, b.g)) * 1.0 /
             greatest(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)), 1),
             6) AS jaccard
FROM grams a JOIN grams b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE round(5e-10 + len(list_intersect(a.g, b.g)) * 1.0 /
            greatest(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)), 1),
            6) >= 0.4
ORDER BY a_id, b_id
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-4-gram Jaccard within provenance buckets (bounded
    quadratic cost per bucket; bucket keys the join distribution)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=4, bucket_col="source", threshold=0.4)


_NGRAM_EDGES_SQL = f"""
norms AS MATERIALIZED (
  SELECT doc_id, source AS bucket, {_NORM_SQL} AS nrm FROM documents
), grams AS MATERIALIZED (
  SELECT doc_id, bucket,
         list_distinct(CASE WHEN len(nrm) >= 4 THEN
           list_transform(range(1, len(nrm) - 2), i -> substr(nrm, i, 4))
           ELSE [] END) AS g
  FROM norms
), edges AS MATERIALIZED (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM grams a JOIN grams b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.g, b.g)) * 1.0 /
        greatest(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)), 1) >= 0.4
)"""


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_NGRAM_EDGES_SQL},
sym AS MATERIALIZED (
  SELECT a_id AS a, b_id AS b FROM edges
  UNION SELECT b_id, a_id FROM edges
), reach(node, lbl) AS (
  SELECT a, a FROM (SELECT a FROM sym UNION SELECT b FROM sym) n(a)
  UNION
  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
), comp AS (
  SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node
)
SELECT node AS doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       node = cluster_id AS is_canonical
FROM comp
ORDER BY doc_id
"""


@register(
    "dedup_clusters",
    shape="per_row",
    tags=("dedup", "clusters"),
    oracle=_CLUSTERS_ORACLE,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: n-gram-Jaccard pairs (≥0.4, same source
    bucket) → connected components → canonical id (min doc in
    component) + cluster size.  The end-product of a dedup pipeline:
    keep is_canonical, drop the rest.  Oracle: recursive-CTE reachability
    in DuckDB over identical edges."""
    from pyspark.sql import Window as W

    from redis_streams_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, n=4, bucket_col="source", threshold=0.4)
    comp = connected_components(edges.select("a_id", "b_id"))
    return (
        comp.select(
            F.col("node").alias("doc_id"),
            "cluster_id",
            F.count(F.lit(1))
            .over(W.partitionBy("cluster_id"))
            .alias("cluster_size"),
            (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
        )
    )


@register(
    "dedup_clusters_star",
    shape="per_row",
    tags=("dedup", "clusters", "iterative"),
    oracle=_CLUSTERS_ORACLE,
)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical clusters to dedup_clusters, computed by the alternating
    large-star/small-star contraction instead of min-label propagation —
    O(log n) rounds regardless of component diameter, the shape that
    survives adversarial near-dup chains (template drift across a crawl)
    at 100 TB.  Same recursive-reachability oracle: both algorithms must
    produce the same components."""
    from pyspark.sql import Window as W

    from redis_streams_spark.operators.dedup import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, n=4, bucket_col="source", threshold=0.4)
    comp = connected_components_star(edges.select("a_id", "b_id"))
    return (
        comp.select(
            F.col("node").alias("doc_id"),
            "cluster_id",
            F.count(F.lit(1))
            .over(W.partitionBy("cluster_id"))
            .alias("cluster_size"),
            (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
        )
    )


def _lsh_star_clusters_oracle() -> str:
    return f"""
WITH RECURSIVE {minhash_bands_cte()},
star AS MATERIALIZED (
  SELECT DISTINCT a_id, b_id FROM (
    SELECT min(doc_id) OVER (PARTITION BY band_idx, band_hash) AS a_id,
           doc_id AS b_id
    FROM bands) t
  WHERE a_id <> b_id
), edges AS MATERIALIZED (
  SELECT s.a_id, s.b_id
  FROM star s
  JOIN sh sa ON sa.doc_id = s.a_id
  JOIN sh sb ON sb.doc_id = s.b_id
  WHERE len(list_intersect(sa.s, sb.s)) * 1.0 /
        greatest(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)), 1)
        >= 0.3
), sym AS MATERIALIZED (
  SELECT a_id AS a, b_id AS b FROM edges
  UNION SELECT b_id, a_id FROM edges
), reach(node, lbl) AS (
  SELECT a, a FROM (SELECT a FROM sym UNION SELECT b FROM sym) n(a)
  UNION
  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
), comp AS (
  SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node
)
SELECT node AS doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       node = cluster_id AS is_canonical
FROM comp
ORDER BY doc_id
"""


@register(
    "dedup_clusters_lsh",
    shape="per_row",
    tags=("dedup", "clusters", "lsh"),
    oracle=_lsh_star_clusters_oracle(),
)
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup clusters via STAR edges (round-7 verdict ask
    #1): per band bucket only (bucket-min, member) edges are emitted and
    Jaccard-verified — linear in corpus size, not C(clique,2) — then
    connected components assigns cluster_id = component minimum.  This
    is the clustering path the composed LLM pipeline uses at scale
    (tools/bench_pipeline.py); the all-pairs form stays available for
    pair-report queries (dedup_minhash_lsh, dedup_threshold_curve).
    Oracle: identical star construction + recursive-CTE reachability in
    DuckDB."""
    from pyspark.sql import Window as W

    from redis_streams_spark.operators.dedup import (
        connected_components,
        minhash_lsh_star_edges,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_lsh_star_edges(docs, n=3, threshold=0.3)
    comp = connected_components(edges)
    return comp.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(W.partitionBy("cluster_id")).alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
    )


_BATCH_PRED = "doc_id % 10 = 7"


def _incremental_oracle(src: str = "documents", hashed: bool = False) -> str:
    """The ingest-dedup oracle body.  ``hashed=True`` verifies on
    h32-hashed shingle sets (the persisted dedup index's stored form —
    operators/dupindex.py); bands and everything else are identical."""
    jac = (
        "round(5e-10 + len(list_intersect(sa.s, sb.s)) * 1.0 / "
        "greatest(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)), 1), 6)"
    )
    # hashed verify: the same h32 the signature stage uses, applied to
    # the shingle sets themselves (list_distinct: collisions merge)
    hs_cte = (
        f""", hs AS (
  SELECT doc_id, list_distinct(list_transform(s, x -> {h32_sql('x')})) AS s
  FROM sh
)"""
        if hashed
        else ""
    )
    verify_rel = "hs" if hashed else "sh"
    return f"""
WITH {minhash_bands_cte(src)}{hs_cte}, ch AS (
  SELECT doc_id, md5({_NORM_SQL}) AS content_hash FROM {src}
), exact AS (
  SELECT b.doc_id, min(h.doc_id) AS exact_match
  FROM ch b JOIN ch h ON b.content_hash = h.content_hash
  WHERE b.{_BATCH_PRED} AND NOT h.{_BATCH_PRED}
  GROUP BY b.doc_id
), cands AS (
  SELECT DISTINCT a.doc_id, b.doc_id AS h_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.{_BATCH_PRED} AND NOT b.{_BATCH_PRED}
), near AS (
  SELECT c.doc_id, min(c.h_id) AS near_match
  FROM cands c
  JOIN {verify_rel} sa ON sa.doc_id = c.doc_id
  JOIN {verify_rel} sb ON sb.doc_id = c.h_id
  WHERE {jac} >= 0.3
  GROUP BY c.doc_id
)
SELECT d.doc_id,
       CASE WHEN e.exact_match IS NOT NULL THEN 'exact_dup'
            WHEN n.near_match IS NOT NULL THEN 'near_dup'
            ELSE 'keep' END AS verdict,
       -- sentinel -1 for 'keep' rows: a nullable BIGINT column gets
       -- float-promoted by pandas-based canonicalizers (NaN), breaking
       -- the int-vs-float type-family check against Spark's bigint
       coalesce(e.exact_match, n.near_match, -1) AS match_id
FROM {src} d
LEFT JOIN exact e ON e.doc_id = d.doc_id
LEFT JOIN near n ON n.doc_id = d.doc_id
WHERE d.{_BATCH_PRED}
ORDER BY d.doc_id
"""


@register("dedup_incremental", shape="bounded", tags=("dedup", "lsh", "ingest"), oracle=_incremental_oracle())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch dedup against the accumulated corpus (batch form of
    the streaming near-dup path): docs with ``doc_id % 10 = 7`` play the
    incoming batch, the rest the history; each batch doc gets
    exact_dup / near_dup / keep + the matched history doc."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.expr(_BATCH_PRED))
    history = docs.where(~F.expr(_BATCH_PRED))
    out = incremental_dedup(history, batch, n=3, threshold=0.3)
    # sentinel -1 (query surface only — the operator keeps NULL semantics
    # for the streaming path): see the oracle comment on match_id
    return out.withColumn("match_id", F.coalesce("match_id", F.lit(-1)))


@register(
    "dedup_apply_report",
    shape="bounded",
    tags=("dedup", "llm-pipeline"),
    oracle=f"""
WITH ch AS (
  SELECT doc_id, source, n_chars, md5({_NORM_SQL}) AS content_hash
  FROM documents
), keepers AS (
  SELECT content_hash, min(doc_id) AS keeper FROM ch GROUP BY content_hash
)
SELECT source,
       count(*) AS n_docs,
       sum(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN doc_id = keeper THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
       sum(CASE WHEN doc_id = keeper THEN n_chars ELSE 0 END)::BIGINT AS chars_kept,
       round(5e-10 + sum(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END) * 100.0
             / count(*), 4) AS keep_pct
FROM ch JOIN keepers USING (content_hash)
GROUP BY source
ORDER BY source
""",
)
def dedup_apply_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply exact dedup corpus-wide (keeper = min doc_id per normalized
    content hash, exactly :func:`exact_dedup`'s canonical rule) and report
    the per-source retention — the accounting step after pair/cluster
    detection, answering "what did dedup actually remove from each
    domain".

    Scale shape: one hash-groupBy keyed on the 32-byte digest to find
    keepers (shuffles digests, never documents), one digest-keyed
    equi-join back (AQE-broadcastable when the corpus is mostly unique),
    then a domain-cardinality aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    ch = exact_dedup(docs).select("doc_id", "content_hash").join(
        docs.select("doc_id", "source", "n_chars"), "doc_id"
    )
    keepers = ch.groupBy("content_hash").agg(F.min("doc_id").alias("keeper"))
    kept = F.when(F.col("doc_id") == F.col("keeper"), 1).otherwise(0)
    return (
        ch.join(keepers, "content_hash")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum(kept)).cast("long").alias("n_dropped"),
            F.sum(kept * F.col("n_chars")).cast("long").alias("chars_kept"),
            rnd(F.sum(kept) * 100.0 / F.count(F.lit(1)), 4).alias("keep_pct"),
        )
        .orderBy("source")
    )


@register(
    "dedup_fuzzy_names",
    shape="per_row",
    tags=("dedup", "fuzzy", "entity-resolution"),
    oracle="""
WITH names AS (
  SELECT c_custkey, c_name, substr(c_name, length(c_name) - 5, 6) AS suffix
  FROM customer
), grams AS (
  SELECT c_custkey, c_name,
         unnest(generate_series(1, 4)) AS gpos, suffix
  FROM names
), posted AS (
  SELECT c_custkey, c_name, gpos, substr(suffix, gpos, 3) AS gram FROM grams
), cands AS (
  SELECT DISTINCT a.c_custkey AS a_key, b.c_custkey AS b_key,
         a.c_name AS a_name, b.c_name AS b_name
  FROM posted a JOIN posted b
    ON a.gpos = b.gpos AND a.gram = b.gram AND a.c_custkey < b.c_custkey
)
SELECT a_key, b_key, levenshtein(a_name, b_name)::BIGINT AS dist
FROM cands
WHERE levenshtein(a_name, b_name) <= 1
ORDER BY a_key, b_key
""",
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity-resolution family): customer
    names within Levenshtein distance 1, found via positional-3-gram
    blocking over the 6-char name suffix — a single substitution leaves
    at least one of the 4 positional grams intact (pigeonhole), so the
    candidate join is an equi-join on (position, gram), never an
    all-pairs cross.  Exact levenshtein verifies candidates.

    Scale: the blocking index shuffles 3-char postings; candidate volume
    tracks true near-matches (shared grams), and the verify step runs
    only on candidates — the standard q-gram prefilter shape for
    edit-distance joins at corpus scale."""
    cust = load_table(spark, sf_dir, "customer")
    names = cust.select(
        "c_custkey",
        "c_name",
        F.expr("substr(c_name, length(c_name) - 5, 6)").alias("suffix"),
    )
    posted = names.select(
        "c_custkey",
        "c_name",
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("gpos"),
        "suffix",
    ).select(
        "c_custkey", "c_name", "gpos", F.expr("substr(suffix, gpos, 3)").alias("gram")
    )
    a, b = posted.alias("a"), posted.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.gpos") == F.col("b.gpos"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("a_key"),
            F.col("b.c_custkey").alias("b_key"),
            F.col("a.c_name").alias("a_name"),
            F.col("b.c_name").alias("b_name"),
        )
        .distinct()
    )
    dist = F.levenshtein("a_name", "b_name")
    return (
        cands.withColumn("dist", dist.cast("long"))
        .where(F.col("dist") <= 1)
        .select("a_key", "b_key", "dist")
    )
