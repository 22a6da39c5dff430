"""Round-9 model-evaluation completion: log loss, Brier decomposition,
confusion matrices at thresholds, and the KS separation statistic —
rounding out the r08 family (ROC AUC / calibration / P-R curve in
modeleval.py) to the full metric sheet a filter-model iteration reports.

Shared frame: ``events.value`` as the raw score, purchase as the
positive label, min-max normalized to a probability surrogate p (the
range is a 1-row broadcast; the normalization is scalar arithmetic,
bit-identical across engines, so threshold comparisons never flake).
Everything is aggregation-only or bucketed-prefix-sum shaped — no
global window, no sort, no per-row Python.

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

_EPS = 1e-6
_N_BINS = 10
_THRESHOLDS = (0.2, 0.4, 0.6, 0.8)
_SCORE_BUCKET = EVENTS_VALUE_BUCKET  # same prefix-sum width as modeleval.py

# labeled + min-max normalized probability surrogate, clamped to
# [eps, 1-eps] so log terms stay finite
_NORM = f"""
labeled AS (
  SELECT value AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
), rng AS (SELECT min(score) AS lo, max(score) AS hi FROM labeled),
norm AS (
  SELECT l.label,
         greatest(least(CASE WHEN r.hi > r.lo
                             THEN (l.score - r.lo) / (r.hi - r.lo)
                             ELSE 0.5 END, 1 - {_EPS}), {_EPS}) AS p
  FROM labeled l CROSS JOIN rng r
)"""


def _norm_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    labeled = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    rng = labeled.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    p = F.when(
        F.col("hi") > F.col("lo"),
        (F.col("score") - F.col("lo")) / (F.col("hi") - F.col("lo")),
    ).otherwise(0.5)
    return labeled.crossJoin(F.broadcast(rng)).select(
        "label",
        F.greatest(F.least(p, F.lit(1 - _EPS)), F.lit(_EPS)).alias("p"),
    )


@register(
    "q_log_loss",
    shape="bounded",
    tags=("model-eval", "stats"),
    oracle=f"""
WITH {_NORM}
SELECT count(*)::BIGINT AS n,
       {rnd_sql('-avg(label * ln(p) + (1 - label) * ln(1 - p))', 6)}
         AS log_loss
FROM norm
""",
)
def q_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary cross-entropy of the normalized score against the label —
    the loss a calibration-sensitive filter model is actually trained
    on.  One scan-stage expression + one avg; the min-max range is a
    broadcast scalar."""
    norm = _norm_frame(spark, sf_dir)
    ll = F.col("label") * F.log("p") + (1 - F.col("label")) * F.log(
        F.lit(1.0) - F.col("p")
    )
    return norm.agg(
        F.count(F.lit(1)).alias("n"),
        rnd(-F.avg(ll), 6).alias("log_loss"),
    )


@register(
    "q_brier_decomposition",
    shape="bounded",
    tags=("model-eval", "stats", "calibration"),
    oracle=f"""
WITH {_NORM},
binned AS (
  SELECT least(floor(p * {_N_BINS})::BIGINT, {_N_BINS - 1}) AS bin, p, label
  FROM norm
), b AS (
  SELECT bin, count(*)::BIGINT AS n_b, avg(p) AS pbar, avg(label) AS ybar_b
  FROM binned GROUP BY bin
), o AS (
  SELECT count(*)::BIGINT AS n, avg(label) AS ybar,
         avg((p - label) * (p - label)) AS brier
  FROM binned
)
SELECT o.n, {rnd_sql('any_value(o.brier)', 6)} AS brier,
       {rnd_sql(
           'sum(b.n_b * (b.pbar - b.ybar_b) * (b.pbar - b.ybar_b)) / o.n', 6
       )} AS reliability,
       {rnd_sql(
           'sum(b.n_b * (b.ybar_b - o.ybar) * (b.ybar_b - o.ybar)) / o.n', 6
       )} AS resolution,
       {rnd_sql('any_value(o.ybar * (1 - o.ybar))', 6)} AS uncertainty
FROM b CROSS JOIN o
GROUP BY o.n
""",
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy decomposition (reliability −
    resolution + uncertainty over {_N_BINS} equal-width bins): raw Brier
    says how wrong the probabilities are; the decomposition says whether
    to fix CALIBRATION (reliability) or DISCRIMINATION (resolution) —
    the actionable split.  Per-bin aggregate ({_N_BINS} rows) × a 1-row
    overall frame; identity holds exactly only for bin-mean forecasts,
    so raw brier is reported alongside the components (standard
    practice)."""
    norm = _norm_frame(spark, sf_dir)
    binned = norm.select(
        F.least(
            F.floor(F.col("p") * _N_BINS).cast("long"), F.lit(_N_BINS - 1)
        ).alias("bin"),
        "p",
        "label",
    )
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.avg("p").alias("pbar"),
        F.avg("label").alias("ybar_b"),
    )
    o = binned.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("label").alias("ybar"),
        F.avg((F.col("p") - F.col("label")) * (F.col("p") - F.col("label"))).alias(
            "brier"
        ),
    )
    j = b.crossJoin(F.broadcast(o))
    rel = (
        F.sum(
            F.col("n_b")
            * (F.col("pbar") - F.col("ybar_b"))
            * (F.col("pbar") - F.col("ybar_b"))
        )
        / F.first("n")
    )
    res = (
        F.sum(
            F.col("n_b")
            * (F.col("ybar_b") - F.col("ybar"))
            * (F.col("ybar_b") - F.col("ybar"))
        )
        / F.first("n")
    )
    return j.groupBy("n").agg(
        rnd(F.first("brier"), 6).alias("brier"),
        rnd(rel, 6).alias("reliability"),
        rnd(res, 6).alias("resolution"),
        rnd(F.first(F.col("ybar") * (1 - F.col("ybar"))), 6).alias(
            "uncertainty"
        ),
    )


@register(
    "q_confusion_thresholds",
    shape="bounded",
    tags=("model-eval", "stats"),
    oracle=f"""
WITH {_NORM},
ts AS (SELECT * FROM (VALUES {", ".join(f"({t})" for t in _THRESHOLDS)}) ts(t))
SELECT ts.t::DOUBLE AS threshold,
       sum(CASE WHEN p >= ts.t AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
       sum(CASE WHEN p >= ts.t AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
       sum(CASE WHEN p < ts.t AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS fn,
       sum(CASE WHEN p < ts.t AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
       {rnd_sql(
           '''CASE WHEN sum(CASE WHEN p >= ts.t THEN 1 ELSE 0 END) > 0
              THEN sum(CASE WHEN p >= ts.t AND label = 1 THEN 1 ELSE 0 END)
                   * 1.0 / sum(CASE WHEN p >= ts.t THEN 1 ELSE 0 END) END''', 6
       )} AS precision,
       {rnd_sql(
           '''sum(CASE WHEN p >= ts.t AND label = 1 THEN 1 ELSE 0 END)
              * 1.0 / sum(label)''', 6
       )} AS recall
FROM norm CROSS JOIN ts
GROUP BY ts.t
ORDER BY threshold
""",
)
def q_confusion_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall at fixed probability
    thresholds — the operating-point sheet next to q_pr_curve's rank
    cutoffs.  The corpus crossJoins a broadcast 4-row threshold frame
    and aggregates; the normalization is scalar-identical across
    engines, so the >= comparisons are deterministic.  Precision is NULL
    when a threshold predicts nothing positive (guarded division)."""
    norm = _norm_frame(spark, sf_dir)
    ts = norm.sparkSession.createDataFrame(
        [(t,) for t in _THRESHOLDS], "t double"
    )
    pos = F.col("p") >= F.col("t")
    tp = F.sum((pos & (F.col("label") == 1)).cast("long"))
    fp = F.sum((pos & (F.col("label") == 0)).cast("long"))
    fn = F.sum(((~pos) & (F.col("label") == 1)).cast("long"))
    tn = F.sum(((~pos) & (F.col("label") == 0)).cast("long"))
    npred = F.sum(pos.cast("long"))
    return (
        norm.crossJoin(F.broadcast(ts))
        .groupBy(F.col("t").alias("threshold"))
        .agg(
            tp.alias("tp"),
            fp.alias("fp"),
            fn.alias("fn"),
            tn.alias("tn"),
            rnd(
                F.when(npred > 0, tp * 1.0 / npred), 6
            ).alias("precision"),
            rnd(tp * 1.0 / F.sum("label"), 6).alias("recall"),
        )
        .orderBy("threshold")
    )


@register(
    "q_score_ks_separation",
    shape="bounded+prefix_sum",
    tags=("model-eval", "stats", "distribution"),
    oracle="""
WITH labeled AS (
  SELECT value AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
), h AS (
  SELECT score AS val,
         sum(label)::BIGINT AS cp,
         (count(*) - sum(label))::BIGINT AS cn
  FROM labeled GROUP BY 1
), c AS (
  SELECT val,
         sum(cp) OVER w AS cum_p, sum(cn) OVER w AS cum_n
  FROM h
  WINDOW w AS (ORDER BY val ROWS UNBOUNDED PRECEDING)
), t AS (SELECT sum(label)::BIGINT AS n_pos,
                (count(*) - sum(label))::BIGINT AS n_neg FROM labeled)
SELECT t.n_pos, t.n_neg,
       round(5e-10 + max(abs(c.cum_p * 1.0 / t.n_pos
                             - c.cum_n * 1.0 / t.n_neg)), 6) AS ks_stat
FROM c CROSS JOIN t
GROUP BY t.n_pos, t.n_neg
""",
)
def q_score_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS separation statistic — max gap between the positive-class and
    negative-class score ECDFs — the credit-scoring cousin of ROC AUC
    (KS picks the single best cutoff; AUC integrates all of them).
    Same bucketed-prefix-sum histogram frame as q_roc_auc: cumulative
    class counts over distinct scores, one max; no empty-partition
    window, no sort.  The max needs no argmax tie-break (it is a value,
    not a row selection), so cross-engine floats agree to the 6 dp
    rounding."""
    ev = load_table(spark, sf_dir, "events")
    labeled = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    h = labeled.groupBy(F.col("score").alias("val")).agg(
        F.sum("label").alias("cp"),
        (F.count(F.lit(1)) - F.sum("label")).alias("cn"),
    )
    c = bucketed_cumsum(
        h, "val", [("cp", "cum_p", True), ("cn", "cum_n", True)], _SCORE_BUCKET
    )
    tot = labeled.agg(
        F.sum("label").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).alias("n_neg"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .groupBy("n_pos", "n_neg")
        .agg(
            rnd(
                F.max(
                    F.abs(
                        F.col("cum_p") * 1.0 / F.col("n_pos")
                        - F.col("cum_n") * 1.0 / F.col("n_neg")
                    )
                ),
                6,
            ).alias("ks_stat")
        )
        .select(
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            "ks_stat",
        )
    )


_GOF_WIDTH = 50.0
_GOF_BINS = 12  # [0,50) ... [550, inf)


@register(
    "q_exp_fit_gof",
    shape="bounded",
    tags=("stats", "distribution", "model-eval"),
    oracle=f"""
WITH t AS (
  SELECT count(*)::BIGINT AS n, 1.0 / avg(value) AS lam FROM events
), binned AS (
  SELECT least(floor(value / {_GOF_WIDTH})::BIGINT, {_GOF_BINS - 1}) AS bin,
         count(*)::BIGINT AS obs
  FROM events GROUP BY 1
), model AS (
  -- materialize ALL {_GOF_BINS} model bins: an empty bin still owes its
  -- (0 - n*p)^2 / (n*p) = n*p term to the chi-square, and dropping it
  -- biases the statistic low exactly when the fit is poor in the tail
  SELECT s.bin, coalesce(b.obs, 0)::BIGINT AS obs, t.n, t.lam,
         exp(-t.lam * (s.bin * {_GOF_WIDTH}))
         - CASE WHEN s.bin < {_GOF_BINS - 1}
                THEN exp(-t.lam * ((s.bin + 1) * {_GOF_WIDTH}))
                ELSE 0.0 END AS p
  FROM (SELECT unnest(range(0, {_GOF_BINS})) AS bin) s
  CROSS JOIN t
  LEFT JOIN binned b ON b.bin = s.bin
)
SELECT any_value(n) AS n,
       {rnd_sql('any_value(lam)', 6)} AS lambda,
       {rnd_sql(
           '''sum(CASE WHEN obs > 0 AND p > 0
                  THEN (obs * 1.0 / n) * ln((obs * 1.0 / n) / p) END)''', 6
       )} AS kl_divergence,
       {rnd_sql(
           '''sum(CASE WHEN p > 0
                  THEN (obs - n * p) * (obs - n * p) / (n * p) END)''', 4
       )} AS chi2_stat
FROM model
""",
)
def q_exp_fit_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric distribution-fit audit: fit an exponential
    (λ = 1/mean) to ``events.value``, bin observed mass on a fixed
    50-wide grid (12 bins, last open), and report KL divergence and
    the chi-square GOF statistic against the model probabilities — the
    "is this still exponential-ish" alarm a sampling or synthetic-data
    pipeline runs per batch, complementing the nonparametric drift
    family (PSI/JS/KS) with a closed-form null.  One moment aggregate +
    one 12-row binned aggregate; the model probabilities are scalar
    arithmetic on the broadcast (n, λ) row.  ALL 12 model bins are
    materialized (spine exploded from the moment row, observed counts
    left-joined): an empty bin still owes its n·p expected-count term
    to the chi-square — dropping it understates the statistic exactly
    when the fit is poor in the tail (r09 review finding).  Terms guard
    on p > 0 on both engines (an underflowed model tail would otherwise
    be NULL in Spark but inf in DuckDB)."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.agg(
        F.count(F.lit(1)).alias("n"),
        (F.lit(1.0) / F.avg("value")).alias("lam"),
    )
    binned = ev.groupBy(
        F.least(
            F.floor(F.col("value") / _GOF_WIDTH).cast("long"),
            F.lit(_GOF_BINS - 1),
        ).alias("bin")
    ).agg(F.count(F.lit(1)).alias("obs"))
    spine = t.select(
        F.explode(F.sequence(F.lit(0), F.lit(_GOF_BINS - 1))).alias("bin"),
        "n",
        "lam",
    ).select(F.col("bin").cast("long").alias("bin"), "n", "lam")
    lo = F.col("bin") * _GOF_WIDTH
    hi = (F.col("bin") + 1) * _GOF_WIDTH
    p = F.exp(-F.col("lam") * lo) - F.when(
        F.col("bin") < _GOF_BINS - 1, F.exp(-F.col("lam") * hi)
    ).otherwise(0.0)
    model = spine.join(binned, "bin", "left").select(
        "bin",
        F.coalesce(F.col("obs"), F.lit(0)).alias("obs"),
        "n",
        "lam",
        p.alias("p"),
    )
    obs_frac = F.col("obs") * 1.0 / F.col("n")
    return model.agg(
        F.first("n").alias("n"),
        rnd(F.first("lam"), 6).alias("lambda"),
        rnd(
            F.sum(
                F.when(
                    (F.col("obs") > 0) & (F.col("p") > 0),
                    obs_frac * F.log(obs_frac / F.col("p")),
                )
            ),
            6,
        ).alias("kl_divergence"),
        rnd(
            F.sum(
                F.when(
                    F.col("p") > 0,
                    (F.col("obs") - F.col("n") * F.col("p"))
                    * (F.col("obs") - F.col("n") * F.col("p"))
                    / (F.col("n") * F.col("p")),
                )
            ),
            4,
        ).alias("chi2_stat"),
    )
