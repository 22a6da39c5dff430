"""Third-wave analytics: observability percentile bands, robust (MAD)
anomaly gates, CUSUM change-point location, seasonal profiles, windowed
funnels, Welch A/B testing, and Pareto/Gini concentration via the
two-phase distributed cumulative sum (SURVEY §2.2 extension; the
reference has no analytics surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_DAY_MS = 86_400_000
_HOUR_MS = 3_600_000
_STEP_WINDOW_MS = 24 * _HOUR_MS
_MAD_K = 5.0


@register(
    "q_latency_bands",
    shape="bounded",
    tags=("observability", "percentiles"),
    oracle=f"""
SELECT (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_start_ms,
       event_type,
       count(*) AS n,
       round(5e-10 + quantile_cont(value, 0.50), 4) AS p50,
       round(5e-10 + quantile_cont(value, 0.95), 4) AS p95,
       round(5e-10 + quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY 1, 2
ORDER BY day_start_ms, event_type
""",
)
def q_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p95/p99 bands per event type — the SLO dashboard
    primitive.  Exact percentiles (not sketches) so the oracle is
    value-tight; the approximate path for wide groups is q_approx_aggs.

    Scale shape: one aggregation keyed on (day, type) — percentile state
    is per-group, never global.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / _DAY_MS).cast("long") * _DAY_MS
    return (
        ev.groupBy(day.alias("day_start_ms"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
            rnd(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            rnd(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("day_start_ms", "event_type")
    )


@register(
    "q_mad_anomaly",
    shape="bounded",
    tags=("observability", "robust"),
    oracle=f"""
WITH med AS (
  SELECT event_type,
         round(5e-10 + quantile_cont(value, 0.5), 6) AS m
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type,
         round(5e-10 + quantile_cont(abs(e.value - med.m), 0.5), 6) AS mad,
         any_value(med.m) AS m
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type,
       count(*) AS n,
       sum(CASE WHEN abs(e.value - mad.m) > {_MAD_K} * mad.mad
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       round(5e-10 + any_value(mad.m), 6) AS median_value,
       round(5e-10 + any_value(mad.mad), 6) AS mad
FROM events e JOIN mad USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
""",
)
def q_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly gate per event type: median / MAD (median absolute
    deviation) and the count of points beyond 5×MAD — the outlier
    detector that, unlike the z-score (q_zscore_anomaly), is not itself
    dragged by the outliers it hunts.

    Cross-engine note: median and MAD are ROUNDED at 6 dp on both
    engines before the threshold compare so the outlier decision is
    bit-identical (same stance as q_winsorize's bounds).

    Scale shape: two per-type percentile aggregations (the second over
    |rows| re-joined to the |types|-row broadcast), one counting pass.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        rnd(F.expr("percentile(value, 0.5)"), 6).alias("m")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            rnd(F.expr("percentile(abs(value - m), 0.5)"), 6).alias("mad"),
            F.first("m").alias("m"),
        )
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("m")) > _MAD_K * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
            rnd(F.first("m"), 6).alias("median_value"),
            rnd(F.first("mad"), 6).alias("mad"),
        )
        .orderBy("event_type")
    )


@register(
    "q_changepoint_cusum",
    shape="bounded",
    tags=("timeseries", "changepoint"),
    oracle=f"""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS day, sum(value) AS v
  FROM events GROUP BY 1, 2
), dev AS (
  SELECT event_type, day, v,
         v - avg(v) OVER (PARTITION BY event_type) AS d
  FROM daily
), cusum AS (
  SELECT event_type, day,
         round(5e-10 + sum(d) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS UNBOUNDED PRECEDING), 4) AS c
  FROM dev
), ranked AS (
  SELECT event_type, day, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(c) DESC, day) AS rn
  FROM cusum
)
SELECT event_type,
       day * {_DAY_MS} AS change_day_ms,
       round(5e-10 + abs(c), 4) AS max_abs_cusum
FROM ranked WHERE rn = 1
ORDER BY event_type
""",
)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point locator per event type: cumulative sum of
    daily deviations from the series mean; the day where |CUSUM| peaks
    is the most likely level-shift point (Page's test statistic).

    Cross-engine note: CUSUM values are rounded at 4 dp BEFORE the
    argmax ranking (day as tie-break) so the located day is identical
    under last-ulp summation drift.

    Scale shape: all windows run over the |days|×|types| daily
    AGGREGATE, partitioned by type — the raw scan reduces first.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", (F.expr(_MS) / _DAY_MS).cast("long").alias("day")
    ).agg(F.sum("value").alias("v"))
    dev = daily.withColumn(
        "d", F.col("v") - F.avg("v").over(W.partitionBy("event_type"))
    )
    cusum = dev.withColumn(
        "c",
        rnd(
            F.sum("d").over(
                W.partitionBy("event_type")
                .orderBy("day")
                .rowsBetween(W.unboundedPreceding, 0)
            ),
            4,
        ),
    )
    ranked = cusum.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.abs("c").desc(), "day")
        ),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            "event_type",
            (F.col("day") * _DAY_MS).alias("change_day_ms"),
            rnd(F.abs("c"), 4).alias("max_abs_cusum"),
        )
        .orderBy("event_type")
    )


@register(
    "q_seasonal_profile",
    shape="bounded",
    tags=("timeseries", "seasonality"),
    oracle=f"""
WITH g AS (
  SELECT ((epoch_ms(ts) // {_DAY_MS}) + 4) % 7 AS dow,
         (epoch_ms(ts) % {_DAY_MS}) // {_HOUR_MS} AS hour,
         value
  FROM events
), c AS (
  SELECT dow, hour, count(*) AS n_events,
         round(5e-10 + sum(value), 2) AS sum_value
  FROM g GROUP BY dow, hour
)
SELECT dow, hour, n_events, sum_value,
       round(5e-10 + n_events * 1.0 / sum(n_events) OVER (), 6) AS share
FROM c
ORDER BY dow, hour
""",
)
def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × day-of-week activity heatmap with each cell's share
    of total traffic — the seasonality profile behind staffing /
    autoscaling decisions.  Day-of-week is computed from epoch days
    ((days + 4) mod 7, 0 = Sunday) so both engines agree without
    locale-dependent date functions.

    Scale shape: one aggregation to the fixed 168-cell grid; the share
    window runs over that aggregate.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    g = ev.select(
        (((ms / _DAY_MS).cast("long") + 4) % 7).alias("dow"),
        ((ms % _DAY_MS) / _HOUR_MS).cast("long").alias("hour"),
        "value",
    )
    c = g.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.sum("value"), 2).alias("sum_value"),
    )
    return c.select(
        "dow",
        "hour",
        "n_events",
        "sum_value",
        rnd(
            F.col("n_events") * 1.0 / F.sum("n_events").over(W.partitionBy()), 6
        ).alias("share"),
    ).orderBy("dow", "hour")


@register(
    "q_funnel_windowed",
    shape="bounded",
    tags=("analytics", "funnel"),
    oracle=f"""
WITH v AS (
  SELECT user_id, min(epoch_ms(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click'
    AND epoch_ms(e.ts) >= v.t1
    AND epoch_ms(e.ts) <= v.t1 + {_STEP_WINDOW_MS}
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_ms(e.ts) >= c.t2
    AND epoch_ms(e.ts) <= c.t2 + {_STEP_WINDOW_MS}
  GROUP BY e.user_id
), stages AS (
  SELECT 1 AS stage, 'view' AS step, count(*) AS n_users FROM v
  UNION ALL SELECT 2, 'click_24h', count(*) FROM c
  UNION ALL SELECT 3, 'purchase_24h', count(*) FROM p
)
SELECT stage, step, n_users,
       round(5e-10 + n_users * 1.0 /
             greatest(coalesce(lag(n_users) OVER (ORDER BY stage), n_users),
                      1), 6)
         AS conversion_from_prev
FROM stages
ORDER BY stage
""",
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel view→click→purchase where each step must occur
    within 24 h of the PREVIOUS step's earliest qualifying time — the
    attribution-honest funnel (q_funnel's unbounded chaining overcounts
    long-delayed conversions).

    Scale shape: one shuffle on user_id per step (min-aggregation, then
    an equi-join back to the event stream with the window as a residual
    predicate); the stage summary is 3 rows.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(ms).alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", ms.alias("t"))
        .join(v, "user_id")
        .where((F.col("t") >= F.col("t1")) & (F.col("t") <= F.col("t1") + _STEP_WINDOW_MS))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", ms.alias("t"))
        .join(c, "user_id")
        .where((F.col("t") >= F.col("t2")) & (F.col("t") <= F.col("t2") + _STEP_WINDOW_MS))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    stages = (
        v.agg(F.lit(1).alias("stage"), F.lit("view").alias("step"), F.count(F.lit(1)).alias("n_users"))
        .unionAll(
            c.agg(F.lit(2).alias("stage"), F.lit("click_24h").alias("step"), F.count(F.lit(1)).alias("n_users"))
        )
        .unionAll(
            p.agg(F.lit(3).alias("stage"), F.lit("purchase_24h").alias("step"), F.count(F.lit(1)).alias("n_users"))
        )
    )
    return stages.select(
        "stage",
        "step",
        "n_users",
        rnd(
            F.col("n_users")
            * 1.0
            / F.greatest(
                F.coalesce(
                    F.lag("n_users").over(W.orderBy("stage")),
                    F.col("n_users"),
                ),
                F.lit(1),
            ),
            6,
        ).alias("conversion_from_prev"),
    ).orderBy("stage")


@register(
    "q_ab_test",
    shape="bounded",
    tags=("analytics", "stats"),
    oracle="""
WITH s AS (
  SELECT event_type,
         count(*)::DOUBLE AS n,
         avg(value) AS m,
         var_samp(value) AS v
  FROM events GROUP BY event_type
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       a.n::BIGINT AS n_a, b.n::BIGINT AS n_b,
       round(5e-10 + a.m - b.m, 4) AS mean_diff,
       round(5e-10 + (a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
       abs(round(5e-10 + (a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4)) > 1.96
         AS significant
FROM s a JOIN s b ON a.event_type < b.event_type
ORDER BY type_a, type_b
""",
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test between every pair of event types' value
    distributions: mean difference, t statistic, and the |t| > 1.96
    call — the experimentation-platform primitive.

    Cross-engine note: the significance boolean compares the
    4dp-STABILIZED t (abs(rnd(t, 4)) > 1.96, matching the inline
    comment and the oracle) — comparing the raw t would let a sub-ulp
    Spark/DuckDB quotient difference flip the boolean when |t| sits
    exactly at the threshold.

    Scale shape: one moment aggregation (n, mean, variance per type),
    then a |types|² join over that tiny frame.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = s.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = s.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    t = (F.col("ma") - F.col("mb")) / F.sqrt(
        F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            rnd(F.col("ma") - F.col("mb"), 4).alias("mean_diff"),
            rnd(t, 4).alias("t_stat"),
            # round-before-threshold: compare the 4dp-stabilized t
            (F.abs(rnd(t, 4)) > 1.96).alias("significant"),
        )
        .orderBy("type_a", "type_b")
    )


_REV_BUCKET = 1000.0


@register(
    "q_pareto_gini",
    shape="bounded",
    tags=("analytics", "concentration", "prefix-sum"),
    oracle="""
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS r FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, r,
         row_number() OVER (ORDER BY r DESC, o_custkey) AS rk,
         sum(r) OVER (ORDER BY r DESC, o_custkey
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(r) OVER () AS tot,
         count(*) OVER () AS n
  FROM rev
)
SELECT n::BIGINT AS n_customers,
       round(5e-10 + any_value(tot), 2) AS total_revenue,
       round(5e-10 + min(CASE WHEN round(5e-10 + cum / tot, 6) >= 0.8
                              THEN rk END) * 1.0 / n, 6) AS pareto_frac_80,
       round(5e-10 + 1.0 + 1.0 / n
             - 2.0 * sum(r * (n - rk + 1)) / (n * any_value(tot)), 6) AS gini
FROM ranked
GROUP BY n
""",
)
def q_pareto_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the customer fraction covering 80% of
    revenue (Pareto cut) and the Gini coefficient — computed over the
    globally revenue-ranked customer list WITHOUT a global sort, via the
    same two-phase prefix-sum shape as q_systematic_sample: customers
    bucket by floor(revenue/1000) (a monotone function of the sort key,
    so bucket-major order IS the global descending order), rank and
    cumulate within buckets in parallel, then add tiny bucket-level
    offsets.  Gini uses the rank identity
    G = 1 + 1/n − 2·Σ r_i·(n−rk_i+1) / (n·Σr) (ascending-rank form
    rewritten for the descending ranking).

    Cross-engine note: the Pareto 80% threshold compares the 6
    dp-rounded cumulative share on both engines.

    Reference basis: none."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    b = rev.withColumn(
        "bucket", F.floor(F.col("r") / _REV_BUCKET).cast("long")
    )
    # phase 1: rank + cumulative revenue within each revenue bucket
    wloc = (
        W.partitionBy("bucket")
        .orderBy(F.desc("r"), "o_custkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    loc = b.select(
        "o_custkey",
        "r",
        "bucket",
        F.count(F.lit(1)).over(wloc).alias("lrk"),
        F.sum("r").over(wloc).alias("lcum"),
    )
    # phase 2: per-bucket totals -> exclusive prefix offsets (desc bucket
    # order), a window over the tiny bucket aggregate only
    btot = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("bc"), F.sum("r").alias("br")
    )
    woff = W.orderBy(F.desc("bucket")).rowsBetween(W.unboundedPreceding, -1)
    off = btot.select(
        "bucket",
        F.coalesce(F.sum("bc").over(woff), F.lit(0)).alias("rk_off"),
        F.coalesce(F.sum("br").over(woff), F.lit(0.0)).alias("cum_off"),
    )
    tot = rev.agg(
        F.sum("r").alias("tot"), F.count(F.lit(1)).cast("long").alias("n")
    )
    ranked = (
        loc.join(F.broadcast(off), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            (F.col("rk_off") + F.col("lrk")).alias("rk"),
            (F.col("cum_off") + F.col("lcum")).alias("cum"),
            "tot",
            "n",
        )
    )
    return ranked.groupBy("n").agg(
        rnd(F.first("tot"), 2).alias("total_revenue"),
        rnd(
            F.min(
                F.when(rnd(F.col("cum") / F.col("tot"), 6) >= 0.8, F.col("rk"))
            )
            * 1.0
            / F.first("n"),
            6,
        ).alias("pareto_frac_80"),
        rnd(
            F.lit(1.0)
            + 1.0 / F.first("n")
            - 2.0
            * F.sum(F.col("r") * (F.col("n") - F.col("rk") + 1))
            / (F.first("n") * F.first("tot")),
            6,
        ).alias("gini"),
    ).select(
        F.col("n").alias("n_customers"),
        "total_revenue",
        "pareto_frac_80",
        "gini",
    )


_PATH_STEPS = 8
_TOP_PATHS = 20


@register(
    "q_top_paths",
    shape="bounded",
    tags=("analytics", "paths"),
    oracle=f"""
WITH seq AS (
  SELECT user_id,
         epoch_ms(ts) // {_DAY_MS} AS day,
         event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id, epoch_ms(ts) // {_DAY_MS}
                            ORDER BY ts, event_id) AS rn
  FROM events
), paths AS (
  SELECT user_id, day,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM seq WHERE rn <= {_PATH_STEPS}
  GROUP BY user_id, day
), counted AS (
  SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
), ranked AS (
  SELECT path, n_sessions,
         row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
  FROM counted
)
SELECT rk, path, n_sessions FROM ranked
WHERE rk <= {_TOP_PATHS}
ORDER BY rk
""",
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each (user, day) session becomes its ordered
    event-type path (first 8 steps), ranked by frequency — the path-
    analysis primitive behind "how do users actually reach purchase?".

    Scale shape: one (user, day)-partitioned window + one path
    aggregation; the final ranking window runs over the DISTINCT-path
    aggregate (bounded by |types|^steps in theory, tiny in practice —
    at genuinely huge path cardinality the rank would move to a top-k
    per partition pre-filter like operators/skew.py's two-phase top-k).

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / _DAY_MS).cast("long")
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", day.alias("day"), "event_type", "ts", "event_id"
    ).withColumn("rn", F.row_number().over(w))
    paths = (
        seq.where(F.col("rn") <= _PATH_STEPS)
        .groupBy("user_id", "day")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    # sort by the rn already ranked over (ts, event_id) —
                    # the FULL-microsecond order the oracle's string_agg
                    # uses; sorting by unix_millis here would diverge on
                    # same-millisecond events (caught in review by a
                    # cross-engine repro)
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("rn").alias("rn"),
                                F.col("event_type").alias("t"),
                            )
                        )
                    ),
                    lambda x: x.t,
                ),
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    ranked = counted.withColumn(
        "rk",
        F.row_number().over(W.orderBy(F.desc("n_sessions"), "path")),
    )
    return (
        ranked.where(F.col("rk") <= _TOP_PATHS)
        .select("rk", "path", "n_sessions")
        .orderBy("rk")
    )


@register(
    "q_dwell_time",
    shape="bounded",
    tags=("analytics", "transitions"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER w AS prev_type,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_type, event_type AS next_type,
       count(*) AS n,
       round(5e-10 + avg(gap_ms), 1) AS avg_gap_ms,
       round(5e-10 + quantile_cont(gap_ms, 0.5), 1) AS median_gap_ms,
       max(gap_ms) AS max_gap_ms
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
""",
)
def q_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time matrix: for every event-type transition, the count and
    gap statistics (mean / median / max ms between the two events per
    user) — where q_event_transitions gives WHERE users go, this gives
    HOW LONG they linger on the way.

    Scale shape: one user-partitioned lag() window, one
    |types|²-key aggregation.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.expr(_MS)
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (ms - F.lag(ms).over(w)).alias("gap_ms"),
    ).where(F.col("prev_type").isNotNull())
    return (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.avg("gap_ms"), 1).alias("avg_gap_ms"),
            rnd(F.expr("percentile(gap_ms, 0.5)"), 1).alias("median_gap_ms"),
            F.max("gap_ms").alias("max_gap_ms"),
        )
        .orderBy("prev_type", "next_type")
    )
