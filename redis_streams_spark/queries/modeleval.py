"""Round-8 model-evaluation family: ROC AUC, calibration bins, and a
precision/recall curve — the metrics a training-data pipeline computes
after every filter-model iteration (quality classifiers, dedup
verifiers, contamination detectors).

The binary task used throughout: does ``value`` separate purchase
events from the rest?  (A stand-in score/label pair on the shared
tables; the algebra is the product.)  All three are aggregation-only:
no per-row sort survives except inside bounded frames.

Reference basis: none (SURVEY §2.2 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.operators.prefix import (
    EVENTS_VALUE_BUCKET,
    bucketed_cumsum,
)
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_N_CAL_BINS = 10
_PR_KS = (100, 500, 1000, 5000, 20000)
# Prefix-sum bucket width over the score axis (events.value spans
# ~0-560, so ~70 buckets; per-bucket work is |distinct scores in
# bucket|, independent of corpus row count for a fixed score domain).
_SCORE_BUCKET = EVENTS_VALUE_BUCKET

_LABELED = """
labeled AS (
  SELECT value AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
)"""


@register(
    "q_roc_auc",
    shape="bounded+prefix_sum",
    tags=("model-eval", "stats"),
    oracle=f"""
WITH {_LABELED},
by_score AS (
  SELECT score,
         sum(label) AS pos,
         count(*) - sum(label) AS neg
  FROM labeled GROUP BY score
), cum AS (
  SELECT pos, neg,
         coalesce(sum(neg) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM by_score
), tot AS (
  SELECT sum(pos) AS n_pos, sum(neg) AS n_neg FROM by_score
)
SELECT t.n_pos::BIGINT AS n_pos, t.n_neg::BIGINT AS n_neg,
       {rnd_sql("sum(c.pos * (c.neg_below + c.neg / 2.0)) / (t.n_pos * t.n_neg)", 6)}
         AS auc
FROM cum c CROSS JOIN tot t
GROUP BY t.n_pos, t.n_neg
""",
)
def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC via the rank-sum identity: AUC = P(score_pos > score_neg)
    + ½P(tie), computed from per-DISTINCT-SCORE positive/negative counts
    (the histogram-rank design of q_mann_whitney: AUC = U/(n₁n₀)).  The
    below-score negative count is an exact bucketed two-phase prefix sum
    (operators/prefix.py): scores bucket by floor(score/width), cumulate
    within buckets in parallel, add broadcast bucket-level offsets — the
    plan contains NO empty-partition window, so the single-task frame a
    continuous score column would otherwise grow with corpus size never
    exists."""
    ev = load_table(spark, sf_dir, "events")
    labeled = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    by_score = labeled.groupBy("score").agg(
        F.sum("label").alias("pos"),
        (F.count(F.lit(1)) - F.sum("label")).alias("neg"),
    )
    cum = bucketed_cumsum(
        by_score, "score", [("neg", "neg_below", False)], _SCORE_BUCKET
    ).select("pos", "neg", "neg_below")
    tot = by_score.agg(
        F.sum("pos").alias("n_pos"), F.sum("neg").alias("n_neg")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_pos", "n_neg")
        .agg(
            rnd(
                F.sum(
                    F.col("pos") * (F.col("neg_below") + F.col("neg") / 2.0)
                )
                / (F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("auc")
        )
        .select(
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            "auc",
        )
    )


@register(
    "q_calibration_bins",
    shape="bounded",
    tags=("model-eval", "stats"),
    oracle=f"""
WITH {_LABELED},
rng AS (SELECT min(score) AS lo, max(score) AS hi FROM labeled),
binned AS (
  SELECT least(floor((l.score - r.lo) / ((r.hi - r.lo) / {_N_CAL_BINS}))::BIGINT,
               {_N_CAL_BINS - 1}) AS bin,
         l.score, l.label
  FROM labeled l CROSS JOIN rng r
)
SELECT bin,
       count(*)::BIGINT AS n,
       {rnd_sql('avg(score)', 6)} AS mean_score,
       {rnd_sql('avg(label)', 6)} AS frac_positive
FROM binned
GROUP BY bin
ORDER BY bin
""",
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: equal-width score bins vs observed positive
    rate — the calibration check behind every threshold choice a filter
    model makes.  The min/max range is a 1-row broadcast; binning is a
    scan-stage expression; output is {_N_CAL_BINS} rows regardless of
    corpus size."""
    ev = load_table(spark, sf_dir, "events")
    labeled = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    rng = labeled.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / _N_CAL_BINS
    binned = labeled.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor((F.col("score") - F.col("lo")) / width).cast("long"),
            F.lit(_N_CAL_BINS - 1),
        ).alias("bin"),
        "score",
        "label",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.avg("score"), 6).alias("mean_score"),
            rnd(F.avg("label"), 6).alias("frac_positive"),
        )
        .orderBy("bin")
    )


def _pr_oracle() -> str:
    ks = ", ".join(f"({k})" for k in _PR_KS)
    return f"""
WITH {_LABELED},
by_score AS (
  SELECT score, sum(label) AS pos, count(*) AS cnt
  FROM labeled GROUP BY score
), cum AS (
  SELECT score, pos, cnt,
         sum(cnt) OVER (ORDER BY score DESC) AS cnt_incl,
         coalesce(sum(cnt) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnt_excl,
         coalesce(sum(pos) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos_excl
  FROM by_score
), tot AS (SELECT sum(label) AS n_pos, count(*) AS n FROM labeled)
SELECT k.k::BIGINT AS k,
       least(k.k, t.n)::BIGINT AS eff_k,
       {rnd_sql(
           "c.pos_excl + (least(k.k, t.n) - c.cnt_excl) * c.pos * 1.0 / c.cnt",
           4,
       )} AS tp,
       {rnd_sql(
           "(c.pos_excl + (least(k.k, t.n) - c.cnt_excl) * c.pos * 1.0 / c.cnt)"
           " / least(k.k, t.n)",
           6,
       )} AS precision_at_k,
       {rnd_sql(
           "(c.pos_excl + (least(k.k, t.n) - c.cnt_excl) * c.pos * 1.0 / c.cnt)"
           " / t.n_pos",
           6,
       )} AS recall_at_k
FROM (VALUES {ks}) k(k)
CROSS JOIN tot t
JOIN cum c ON c.cnt_excl < least(k.k, t.n) AND least(k.k, t.n) <= c.cnt_incl
ORDER BY k
"""


@register("q_pr_curve", shape="bounded+prefix_sum", tags=("model-eval", "stats"), oracle=_pr_oracle())
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall at k cutoffs WITHOUT a global per-row sort: the
    same distinct-score histogram frame as q_roc_auc, cumulated from the
    top via the bucketed two-phase prefix sum (operators/prefix.py,
    descending — no empty-partition window in the plan); a cutoff
    landing inside a tie run apportions that run's positives
    FRACTIONALLY (the standard interpolated P/R, and the only tie
    semantics that is deterministic without ordering equal scores).
    Cutoffs beyond the corpus clamp to n (eff_k).  The only joins are a
    5-row cutoff frame against the score-cardinality cumulative table."""
    ev = load_table(spark, sf_dir, "events")
    labeled = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    by_score = labeled.groupBy("score").agg(
        F.sum("label").alias("pos"), F.count(F.lit(1)).alias("cnt")
    )
    cum = bucketed_cumsum(
        by_score,
        "score",
        [
            ("cnt", "cnt_incl", True),
            ("cnt", "cnt_excl", False),
            ("pos", "pos_excl", False),
        ],
        _SCORE_BUCKET,
        descending=True,
    ).select("score", "pos", "cnt", "cnt_incl", "cnt_excl", "pos_excl")
    tot = labeled.agg(F.sum("label").alias("n_pos"), F.count(F.lit(1)).alias("n"))
    ks = ev.sparkSession.createDataFrame([(k,) for k in _PR_KS], "k LONG")
    eff_k = F.least(F.col("k"), F.col("n"))
    tp = F.col("pos_excl") + (eff_k - F.col("cnt_excl")) * F.col("pos") * 1.0 / F.col(
        "cnt"
    )
    return (
        cum.join(
            # broadcast the 5-row cutoff×totals frame explicitly — the
            # inequality join must be a BNLJ with the tiny side as build,
            # never a cartesian over the histogram
            F.broadcast(ks.crossJoin(F.broadcast(tot))),
            (F.col("cnt_excl") < eff_k) & (eff_k <= F.col("cnt_incl")),
        )
        .select(
            "k",
            eff_k.cast("long").alias("eff_k"),
            rnd(tp, 4).alias("tp"),
            rnd(tp / eff_k, 6).alias("precision_at_k"),
            rnd(tp / F.col("n_pos"), 6).alias("recall_at_k"),
        )
        .orderBy("k")
    )


@register(
    "q_zonemap_prune_audit",
    shape="bounded",
    tags=("layout", "pruning", "storage"),
    oracle=f"""
WITH zones AS (
  SELECT epoch_ms(ts) // 86400000 AS day,
         min(value) AS zmin, max(value) AS zmax, count(*) AS n_rows
  FROM events GROUP BY 1
), preds AS (
  SELECT * FROM (VALUES (50.0), (100.0), (200.0), (400.0)) p(cutoff)
)
SELECT p.cutoff::DOUBLE AS cutoff,
       count(*)::BIGINT AS n_zones,
       sum(CASE WHEN z.zmax <= p.cutoff THEN 1 ELSE 0 END)::BIGINT
         AS n_pruned,
       sum(CASE WHEN z.zmax <= p.cutoff THEN z.n_rows ELSE 0 END)::BIGINT
         AS rows_skipped,
       {rnd_sql("sum(CASE WHEN z.zmax <= p.cutoff THEN z.n_rows ELSE 0 END)"
                " * 1.0 / sum(z.n_rows)", 6)} AS skip_fraction
FROM preds p CROSS JOIN zones z
GROUP BY p.cutoff
ORDER BY cutoff
""",
)
def q_zonemap_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) pruning audit: build per-day-zone
    min/max over ``value`` — exactly what parquet row groups store —
    and report, for each ``value > cutoff`` predicate, how many zones
    and rows a stats-based reader skips outright.  The number that
    decides whether a table is worth re-sorting (see q_zorder_scan for
    the multi-column layout counterpart).  One aggregate to
    day-cardinality zones; the audit itself is a 4-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr("unix_millis(cast(ts as timestamp))") / F.lit(86400000)).cast(
        "long"
    )
    zones = ev.groupBy(day.alias("day")).agg(
        F.min("value").alias("zmin"),
        F.max("value").alias("zmax"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    preds = ev.sparkSession.createDataFrame(
        [(c,) for c in (50.0, 100.0, 200.0, 400.0)], "cutoff DOUBLE"
    )
    pruned = F.when(F.col("zmax") <= F.col("cutoff"), 1).otherwise(0)
    skipped = F.when(F.col("zmax") <= F.col("cutoff"), F.col("n_rows")).otherwise(0)
    return (
        zones.crossJoin(F.broadcast(preds))
        .groupBy("cutoff")
        .agg(
            F.count(F.lit(1)).alias("n_zones"),
            F.sum(pruned).alias("n_pruned"),
            F.sum(skipped).alias("rows_skipped"),
            rnd(F.sum(skipped) * 1.0 / F.sum("n_rows"), 6).alias("skip_fraction"),
        )
        .orderBy("cutoff")
    )
