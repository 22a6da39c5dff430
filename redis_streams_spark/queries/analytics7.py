"""Round-6 third wave, analytics side: chi-square independence,
behavioral entropy, local peak detection, linear interpolation,
time-to-convert, and DAU/MAU stickiness.

Reference basis: none.  All shapes are aggregate-first; the only
unpartitioned windows run over day-bounded aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_DAY_MS = 86_400_000
_HOUR_MS = 3_600_000


@register(
    "q_chisq_independence",
    shape="bounded",
    tags=("statistics", "data-quality"),
    oracle=f"""
WITH g AS (
  SELECT event_type, ((epoch_ms(ts) // {_DAY_MS}) + 4) % 7 AS dow FROM events
), o AS (
  SELECT event_type, dow, count(*) * 1.0 AS obs FROM g GROUP BY 1, 2
), m AS (
  SELECT o.*,
         sum(obs) OVER (PARTITION BY event_type) AS row_tot,
         sum(obs) OVER (PARTITION BY dow) AS col_tot,
         sum(obs) OVER () AS n
  FROM o
)
SELECT event_type, dow, obs::BIGINT AS observed,
       {rnd_sql('row_tot * col_tot / n', 4)} AS expected,
       {rnd_sql('pow(obs - row_tot * col_tot / n, 2) / (row_tot * col_tot / n)', 6)}
         AS chi2_term
FROM m ORDER BY event_type, dow
""",
)
def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test terms for the event_type ×
    day-of-week contingency table (observed vs expected under
    independence) — "does behavior depend on weekday?", the first
    question behind any seasonality-aware split.

    Scale shape: one aggregation to the ≤ 5×7 contingency table; the
    marginal windows run over that bounded aggregate."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    g = ev.select(
        "event_type", (((ms / _DAY_MS).cast("long") + 4) % 7).alias("dow")
    )
    o = g.groupBy("event_type", "dow").agg(
        (F.count(F.lit(1)) * 1.0).alias("obs")
    )
    m = o.select(
        "event_type",
        "dow",
        "obs",
        F.sum("obs").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("obs").over(W.partitionBy("dow")).alias("col_tot"),
        F.sum("obs").over(W.partitionBy()).alias("n"),
    )
    expected = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return m.select(
        "event_type",
        "dow",
        F.col("obs").cast("long").alias("observed"),
        rnd(expected, 4).alias("expected"),
        rnd(F.pow(F.col("obs") - expected, 2) / expected, 6).alias("chi2_term"),
    ).orderBy("event_type", "dow")


@register(
    "q_behavior_entropy",
    shape="per_row",
    tags=("analytics", "entropy"),
    oracle=f"""
WITH c AS (
  SELECT user_id, event_type, count(*) * 1.0 AS n
  FROM events GROUP BY 1, 2
), t AS (
  SELECT c.*, sum(n) OVER (PARTITION BY user_id) AS tot FROM c
)
SELECT user_id, sum(n)::BIGINT AS n_events,
       count(*) AS n_types,
       {rnd_sql('sum(-(n / tot) * ln(n / tot))', 6)} AS type_entropy
FROM t GROUP BY user_id ORDER BY user_id
""",
)
def q_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — 0 for
    single-behavior users, ln(5) for perfectly mixed usage; the
    behavioral-diversity feature (the events-side sibling of
    text_entropy).

    Scale shape: one (user, type) count aggregate; the per-user total
    is a user-partitioned window over that aggregate (≤ |types| rows
    per user); one final user-keyed aggregation."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        (F.count(F.lit(1)) * 1.0).alias("n")
    )
    t = c.withColumn("tot", F.sum("n").over(W.partitionBy("user_id")))
    p = F.col("n") / F.col("tot")
    return (
        t.groupBy("user_id")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            rnd(F.sum(-p * F.log(p)), 6).alias("type_entropy"),
        )
    )


@register(
    "q_local_peaks",
    shape="bounded",
    tags=("timeseries", "peaks"),
    oracle=f"""
WITH d AS (
  SELECT (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_ms, sum(value) AS v
  FROM events GROUP BY 1
), r AS (
  SELECT day_ms, {rnd_sql('v', 2)} AS v FROM d
), n AS (
  SELECT day_ms, v,
         lag(v) OVER (ORDER BY day_ms) AS prev,
         lead(v) OVER (ORDER BY day_ms) AS next
  FROM r
)
SELECT day_ms, v AS value
FROM n
WHERE prev IS NOT NULL AND next IS NOT NULL AND v > prev AND v > next
ORDER BY day_ms
""",
)
def q_local_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local maxima in the daily value series (strictly above both
    neighbors, boundaries excluded) — the spike-candidate detector that
    feeds anomaly triage.

    Scale shape: aggregate to one row per day first; the lag/lead
    window is unpartitioned but runs over that day-bounded series."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    # peak membership compares the 2dp-STABILIZED sums: a strict > on
    # raw double sums could flip on a ~1-ulp cross-engine summation-
    # order difference when two days are near-tied (review finding r06)
    d = ev.groupBy(
        ((ms / _DAY_MS).cast("long") * _DAY_MS).alias("day_ms")
    ).agg(rnd(F.sum("value"), 2).alias("v"))
    w = W.orderBy("day_ms")
    n = d.select(
        "day_ms",
        "v",
        F.lag("v").over(w).alias("prev"),
        F.lead("v").over(w).alias("next"),
    )
    return (
        n.where(
            F.col("prev").isNotNull()
            & F.col("next").isNotNull()
            & (F.col("v") > F.col("prev"))
            & (F.col("v") > F.col("next"))
        )
        .select("day_ms", F.col("v").alias("value"))
        .orderBy("day_ms")
    )


@register(
    "q_linear_interpolate",
    shape="bounded",
    tags=("timeseries", "gap-fill"),
    oracle=f"""
WITH hours AS (
  SELECT (epoch_ms(ts) // {_HOUR_MS}) AS hr, avg(value) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), spine AS (
  SELECT unnest(range((SELECT min(hr) FROM hours),
                      (SELECT max(hr) FROM hours) + 1)) AS hr
), joined AS (
  SELECT s.hr, h.v FROM spine s LEFT JOIN hours h USING (hr)
), bounds AS (
  SELECT hr, v,
         last_value(v IGNORE NULLS) OVER (ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
             OVER (ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         first_value(v IGNORE NULLS) OVER (ORDER BY hr
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
             OVER (ORDER BY hr
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM joined
)
SELECT (hr * {_HOUR_MS})::BIGINT AS hour_ms,
       (v IS NULL) AS interpolated,
       CASE
         WHEN v IS NOT NULL THEN {rnd_sql('v', 4)}
         WHEN pv IS NULL THEN {rnd_sql('nv', 4)}
         WHEN nv IS NULL THEN {rnd_sql('pv', 4)}
         ELSE {rnd_sql('pv + (nv - pv) * (hr - ph) * 1.0 / (nh - ph)', 4)}
       END AS value
FROM bounds ORDER BY hour_ms
""",
)
def q_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by LINEAR INTERPOLATION over the hourly purchase
    series: missing hours get the value interpolated between the
    nearest observed neighbors (edges fall back to the nearest single
    neighbor) — the numeric companion to q_resample_ffill's
    step-function fill.

    Scale shape: aggregate to hours, build the hour spine (bounded by
    the time range), and run four ignore-nulls windows over that
    bounded series — same two-phase posture as the other spine
    queries."""
    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy((F.expr(_MS) / _HOUR_MS).cast("long").alias("hr"))
        .agg(F.avg("value").alias("v"))
    )
    bounds_row = hours.agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds_row.select(
        F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    joined = spine.join(hours, "hr", "left")
    wb = W.orderBy("hr").rowsBetween(W.unboundedPreceding, 0)
    wf = W.orderBy("hr").rowsBetween(0, W.unboundedFollowing)
    marked = joined.withColumn(
        "obs_hr", F.when(F.col("v").isNotNull(), F.col("hr"))
    )
    b = marked.select(
        "hr",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last("obs_hr", ignorenulls=True).over(wb).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first("obs_hr", ignorenulls=True).over(wf).alias("nh"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.col("hr") - F.col("ph")
    ) * 1.0 / (F.col("nh") - F.col("ph"))
    return b.select(
        (F.col("hr") * _HOUR_MS).alias("hour_ms"),
        F.col("v").isNull().alias("interpolated"),
        F.when(F.col("v").isNotNull(), rnd("v", 4))
        .when(F.col("pv").isNull(), rnd("nv", 4))
        .when(F.col("nv").isNull(), rnd("pv", 4))
        .otherwise(rnd(interp, 4))
        .alias("value"),
    ).orderBy("hour_ms")


@register(
    "q_time_to_convert",
    shape="bounded",
    tags=("analytics", "funnel"),
    oracle="""
WITH signup AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT s.user_id, min(epoch_us(e.ts) - epoch_us(s.s_ts)) / 1e6 AS secs
  FROM signup s JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase' AND e.ts > s.s_ts
  GROUP BY s.user_id
)
SELECT count(*) AS n_converted,
       round(5e-10 + percentile_cont(0.5) WITHIN GROUP (ORDER BY secs), 3)
         AS median_secs,
       round(5e-10 + percentile_cont(0.9) WITHIN GROUP (ORDER BY secs), 3)
         AS p90_secs,
       round(5e-10 + avg(secs), 3) AS mean_secs
FROM conv
""",
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time from first signup to first subsequent purchase, per user,
    summarized as median/p90/mean seconds — the conversion-latency
    metric (the aggregate complement of q_funnel's step counts).

    Scale shape: per-user min aggregates on both funnel steps, one
    user-keyed equi-join, exact percentiles over the converted-user
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        signup.join(purch, "user_id")
        .where(F.col("p_ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(
            (
                F.min(
                    F.unix_micros(F.col("p_ts").cast("timestamp"))
                    - F.unix_micros(F.col("s_ts").cast("timestamp"))
                )
                / 1e6
            ).alias("secs")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        rnd(F.expr("percentile(secs, 0.5)"), 3).alias("median_secs"),
        rnd(F.expr("percentile(secs, 0.9)"), 3).alias("p90_secs"),
        rnd(F.avg("secs"), 3).alias("mean_secs"),
    )


@register(
    "q_dau_mau",
    shape="bounded",
    tags=("analytics", "engagement"),
    oracle=f"""
WITH d AS (
  SELECT epoch_ms(ts) // {_DAY_MS} AS day, user_id FROM events
), daily AS (
  SELECT day, count(DISTINCT user_id) AS dau FROM d GROUP BY day
), monthly AS (
  SELECT day // 30 AS m30, count(DISTINCT user_id) AS mau FROM d GROUP BY 1
), span AS (
  SELECT min(day) AS min_day, max(day) AS max_day FROM d
)
SELECT m30 * 30 * {_DAY_MS} AS period_start_ms, mau,
       (least(span.max_day, m30 * 30 + 29) - greatest(span.min_day, m30 * 30) + 1)::BIGINT AS n_days,
       {rnd_sql('sum(dau) * 1.0 / (least(span.max_day, m30 * 30 + 29) - greatest(span.min_day, m30 * 30) + 1)', 4)} AS avg_dau,
       {rnd_sql('sum(dau) * 1.0 / (least(span.max_day, m30 * 30 + 29) - greatest(span.min_day, m30 * 30) + 1) / mau', 6)} AS stickiness
FROM daily JOIN monthly ON daily.day // 30 = monthly.m30
CROSS JOIN span
GROUP BY m30, mau, span.min_day, span.max_day ORDER BY period_start_ms
""",
)
def q_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per 30-day period: average daily actives over
    period actives — the canonical engagement ratio.  Fixed 30-day
    epochs (not calendar months) keep the bucketing pure integer math.

    The average divides by CALENDAR days the corpus actually covers in
    the period (zero-event days inside coverage count as DAU 0) — an
    avg() over only the active-day rows would silently overstate
    stickiness on sparse data (review finding r06).  BOTH partial
    periods clamp: the trailing one to max_day and the LEADING one to
    min_day, else a corpus starting mid-bucket divides its first period
    by the full 30 and understates avg_dau (ADVICE r06).

    Scale shape: two distinct-count aggregates off one (day, user)
    projection, joined on the 30-day bucket of the daily aggregate; the
    corpus max-day enters as a 1-row broadcast scalar."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        (F.expr(_MS) / _DAY_MS).cast("long").alias("day"), "user_id"
    )
    daily = d.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    monthly = d.groupBy((F.col("day") / 30).cast("long").alias("m30")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    span = d.agg(F.min("day").alias("min_day"), F.max("day").alias("max_day"))
    n_days = (
        F.least(F.col("max_day"), F.col("m30") * 30 + 29)
        - F.greatest(F.col("min_day"), F.col("m30") * 30)
        + 1
    )
    return (
        daily.withColumn("m30", (F.col("day") / 30).cast("long"))
        .join(monthly, "m30")
        .crossJoin(F.broadcast(span))
        .groupBy("m30", "mau", "min_day", "max_day")
        .agg(F.sum("dau").alias("dau_sum"))
        .select(
            (F.col("m30") * 30 * _DAY_MS).alias("period_start_ms"),
            "mau",
            n_days.cast("long").alias("n_days"),
            rnd(F.col("dau_sum") * 1.0 / n_days, 4).alias("avg_dau"),
            rnd(
                F.col("dau_sum") * 1.0 / n_days / F.col("mau"), 6
            ).alias("stickiness"),
        )
        .orderBy("period_start_ms")
    )
