"""Round-9 multiple-testing operator: Benjamini-Hochberg FDR
correction over a family of per-group hypothesis tests.

Closes the loop on the hypothesis-test toolkit this engine already
carries (``stats.py``, ``q_ab_test``, ``q_chisq_independence``): those
emit per-group p-values — BH is how you decide WHICH of the 25
simultaneous "brand differs" claims survive at a controlled
false-discovery rate.  Scale discipline as in stats.py: the corpus
reduces to a bounded per-group moment frame first; every global window
runs over that frame only (≤ |groups| rows, above the Aggregate — the
gate-admitted shape).

Reference basis: none (redis-streams has no analytics surface); the
formula is the textbook step-up procedure (Benjamini & Hochberg 1995).
The normal CDF uses the Bowling et al. logistic approximation
1/(1+exp(-(0.07056·z³+1.5976·z))) — both engines compute the identical
closed form from the identically-rounded z, so the p-values (and
therefore the BH decisions) are cross-engine exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_ALPHA = 0.05


@register(
    "q_benjamini_hochberg",
    shape="bounded",
    tags=("stats", "hypothesis-test", "multiple-testing"),
    oracle=f"""
WITH b AS (
  SELECT p.p_brand AS brand, count(*)::DOUBLE AS n_b,
         avg(l.l_extendedprice::DOUBLE) AS mean_b
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
), g AS (
  SELECT avg(l_extendedprice::DOUBLE) AS mean_g,
         stddev_samp(l_extendedprice::DOUBLE) AS sd_g
  FROM lineitem
), z AS (
  SELECT brand, n_b::BIGINT AS n,
         {rnd_sql('(mean_b - g.mean_g) / (g.sd_g / sqrt(n_b))', 6)} AS z_score
  FROM b CROSS JOIN g
), p AS (
  SELECT brand, n, z_score,
         {rnd_sql(
             '2.0 / (1.0 + exp(0.07056 * abs(z_score) * abs(z_score)'
             ' * abs(z_score) + 1.5976 * abs(z_score)))', 8)} AS p_value
  FROM z
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_value, brand) AS bh_rank,
         count(*) OVER () AS m
  FROM p
), thr AS (
  SELECT *, {rnd_sql(f'bh_rank * {_ALPHA} / m', 8)} AS bh_threshold
  FROM ranked
), cut AS (
  SELECT *, max(CASE WHEN p_value <= bh_threshold THEN bh_rank END)
              OVER () AS cut_rank
  FROM thr
)
SELECT brand, n, z_score, p_value, bh_rank, bh_threshold,
       bh_rank <= coalesce(cut_rank, 0) AS rejected
FROM cut ORDER BY bh_rank
""",
)
def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction (α=0.05) over the family of 25
    simultaneous per-brand mean-price z-tests: rank p-values ascending,
    reject every hypothesis up to the LARGEST rank whose p ≤ rank·α/m —
    the step-up procedure that controls the expected fraction of false
    discoveries when you test many groups at once (naive per-test α
    would flag ~1 brand in 20 by chance alone).

    Scale shape: one corpus-scale aggregate per brand (count + mean,
    partial-mergeable), one broadcast 1-row global-moment frame, then
    every window (rank, m, step-up cutoff) runs over the 25-row brand
    frame above the Aggregate.  p-values derive from the 6dp-rounded z
    through the logistic normal-CDF approximation, so the ranking and
    the rejection set are cross-engine exact."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    x = F.col("l_extendedprice").cast("double")
    b = (
        li.join(F.broadcast(pt.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_b"),
            F.avg(x).alias("mean_b"),
        )
    )
    g = li.agg(
        F.avg(x).alias("mean_g"), F.stddev_samp(x).alias("sd_g")
    )
    z = b.crossJoin(F.broadcast(g)).select(
        "brand",
        F.col("n_b").cast("long").alias("n"),
        rnd(
            (F.col("mean_b") - F.col("mean_g"))
            / (F.col("sd_g") / F.sqrt(F.col("n_b"))),
            6,
        ).alias("z_score"),
    )
    az = F.abs(F.col("z_score"))
    p = z.select(
        "brand",
        "n",
        "z_score",
        rnd(
            F.lit(2.0)
            / (F.lit(1.0) + F.exp(F.lit(0.07056) * az * az * az + F.lit(1.5976) * az)),
            8,
        ).alias("p_value"),
    )
    from redis_streams_spark.operators.mtest import bh_stepup

    return bh_stepup(p, p_col="p_value", alpha=_ALPHA, tie_cols=("brand",)).orderBy(
        "bh_rank"
    )
