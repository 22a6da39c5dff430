"""Round-6 dedup diagnostics: per-source duplicate rates and the
near-dup threshold tuning curve.

Both are REPORTS over the existing dedup machinery (exact digests;
MinHash-LSH verified pairs) — the knobs-and-dials surface an operator
of the dedup family ships with: how much each source would shrink, and
how the near-dup threshold choice moves the pair count.

Reference basis: none (north-star dedup extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.dedup import _NORM_SQL, minhash_bands_cte
from redis_streams_spark.session import load_table


@register(
    "dedup_rate_by_source",
    shape="bounded",
    tags=("dedup", "mixing", "llm-pipeline"),
    oracle=f"""
WITH h AS (
  SELECT doc_id, source, md5({_NORM_SQL}) AS digest FROM documents
), g AS (
  SELECT h.*,
         count(*) OVER (PARTITION BY digest) AS group_size,
         row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rnk
  FROM h
)
SELECT source, count(*) AS n_docs,
       count(*) FILTER (group_size > 1) AS n_in_dup_groups,
       count(*) FILTER (rnk > 1) AS n_removed,
       {rnd_sql('count(*) FILTER (rnk > 1) * 100.0 / count(*)', 4)} AS removal_pct
FROM g GROUP BY source ORDER BY source
""",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate pressure per source: how many of each source's
    documents sit in a corpus-wide duplicate group, and how many the
    min-doc_id-keeper policy would remove — the per-source shrink
    numbers a mixing stage needs BEFORE reweighting (a source that is
    40% duplicates contributes far fewer effective tokens than its raw
    count suggests).

    Scale shape: one digest projection, digest-partitioned windows
    (16-byte keys), one source-keyed aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    # exact_dedup IS the canonical digest + windows (and fanout
    # rebalance); this report only joins the source back on and
    # aggregates — one definition of "exact duplicate" repo-wide
    g = exact_dedup(docs).join(docs.select("doc_id", "source"), "doc_id")
    return (
        g.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("count_if(group_size > 1)").alias("n_in_dup_groups"),
            F.expr("count_if(dup_rank > 1)").alias("n_removed"),
            rnd(
                F.expr("count_if(dup_rank > 1)") * 100.0 / F.count(F.lit(1)), 4
            ).alias("removal_pct"),
        )
        .orderBy("source")
    )


_THRESHOLDS = (0.3, 0.5, 0.7, 0.9)


def _pairs_cte() -> str:
    """Shared MinHash-LSH CTE body (queries/dedup.py's single source of
    the oracle math) plus the candidate-pair + exact-Jaccard suffix."""
    return f"""{minhash_bands_cte()}, cands AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
), pairs AS (
  SELECT c.a_id, c.b_id,
         round(5e-10 + len(list_intersect(sa.s, sb.s)) * 1.0 /
               greatest(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)), 1),
               6) AS jaccard
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
)"""


@register(
    "dedup_threshold_curve",
    shape="bounded",
    tags=("dedup", "lsh", "tuning", "llm-pipeline"),
    oracle=f"""
WITH {_pairs_cte()}
SELECT t.threshold::DOUBLE AS threshold,
       count(*) FILTER (p.jaccard >= t.threshold) AS n_pairs,
       count(DISTINCT CASE WHEN p.jaccard >= t.threshold THEN p.b_id END)
         AS n_docs_removable
FROM (VALUES (0.3), (0.5), (0.7), (0.9)) t(threshold)
CROSS JOIN pairs p
GROUP BY t.threshold ORDER BY t.threshold
""",
)
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold tuning curve: for each candidate Jaccard
    threshold, how many verified LSH pairs qualify and how many
    documents a remove-the-larger-id policy would drop — the
    one-glance answer to "what does moving the dedup knob cost?".

    Scale shape: the expensive part (candidate generation + exact
    verify) runs ONCE via the shared minhash operator; the curve itself
    is a 4-row broadcast threshold frame aggregated over the verified
    pairs."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs).select("a_id", "b_id", "jaccard")
    th = docs.sparkSession.createDataFrame(
        [(t,) for t in _THRESHOLDS], "threshold DOUBLE"
    )
    return (
        pairs.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.expr("count_if(jaccard >= threshold)").alias("n_pairs"),
            F.countDistinct(
                F.when(F.col("jaccard") >= F.col("threshold"), F.col("b_id"))
            ).alias("n_docs_removable"),
        )
        .orderBy("threshold")
    )
