"""Product/event analytics over the ``events`` table (SURVEY §2.2: the
reference delegates ALL processing to user callbacks — these are the
canonical callback workloads a stream consumer feeds, re-expressed as
declarative Spark plans: funnels, retention cohorts, Markov transitions,
rolling engagement, gap-filled series, anomaly flags).

Conventions shared with queries.timeseries: timestamps reduce to epoch
milliseconds (BIGINT) at the engine boundary (`unix_millis` under the UTC
session pin vs DuckDB `epoch_ms`), day index = ms // 86 400 000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_DAY_MS = 86400000
_WEEK_MS = 7 * _DAY_MS


def _ev_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").withColumn("ms", F.expr(_MS))


@register(
    "q_funnel",
    shape="bounded",
    tags=("analytics", "funnel"),
    oracle="""
WITH v AS (
  SELECT user_id, min(epoch_ms(ts)) AS vms
  FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT v.user_id, min(epoch_ms(e.ts)) AS cms
  FROM v JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'click'
   AND epoch_ms(e.ts) > v.vms
  GROUP BY v.user_id
), p AS (
  SELECT c.user_id, min(epoch_ms(e.ts)) AS pms
  FROM c JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase'
   AND epoch_ms(e.ts) > c.cms
  GROUP BY c.user_id
)
SELECT * FROM (
  SELECT 1::BIGINT AS step, 'view' AS step_name, count(*) AS n_users FROM v
  UNION ALL
  SELECT 2::BIGINT, 'click', count(*) FROM c
  UNION ALL
  SELECT 3::BIGINT, 'purchase', count(*) FROM p
) ORDER BY step
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel view→click→purchase: a user advances a step
    only with an event STRICTLY AFTER their previous step's first hit
    (min-ts chaining, the standard funnel semantics).

    Scale shape: three user_id-keyed aggregations; the per-step join
    re-uses the user_id shuffle key so AQE plans sort-merge joins with no
    extra exchange on the big side, and each step's output only shrinks."""
    ev = _ev_ms(spark, sf_dir)
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ms").alias("vms"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ms") > F.col("vms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("cms"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ms") > F.col("cms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("pms"))
    )

    def step(df: DataFrame, n: int, label: str) -> DataFrame:
        return df.agg(
            F.lit(n).cast("long").alias("step"),
            F.lit(label).alias("step_name"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return step(v, 1, "view").unionAll(step(c, 2, "click")).unionAll(
        step(p, 3, "purchase")
    ).orderBy("step")


@register(
    "q_retention_cohorts",
    shape="bounded",
    tags=("analytics", "retention"),
    oracle=f"""
WITH act AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // {_WEEK_MS} AS w FROM events
), firstw AS (
  SELECT user_id, min(w) AS cohort_week FROM act GROUP BY user_id
)
SELECT f.cohort_week, a.w - f.cohort_week AS week_offset,
       count(*) AS n_users
FROM firstw f JOIN act a USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = first-active week, cell =
    distinct users of that cohort active again `week_offset` weeks later.

    Scale shape: one distinct (user, week) projection feeds BOTH the
    cohort min-agg and the activity side, so the expensive distinct runs
    once; everything after is user_id-keyed (same shuffle key reused)."""
    ev = _ev_ms(spark, sf_dir)
    act = (
        ev.select(
            "user_id", (F.col("ms") / F.lit(_WEEK_MS)).cast("long").alias("w")
        )
        .distinct()
    )
    firstw = act.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    return (
        act.join(firstw, "user_id")
        .groupBy(
            "cohort_week", (F.col("w") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q_event_transitions",
    shape="bounded",
    tags=("analytics", "markov"),
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS nxt
  FROM events
)
SELECT event_type AS src, nxt AS dst, count(*) AS n_transitions,
       round(5e-10 + count(*)::DOUBLE /
             sum(count(*)) OVER (PARTITION BY event_type), 4) AS p
FROM s WHERE nxt IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences
    (lead over (ms, event_id) — the deterministic total order), with the
    row-normalized transition probability.

    Scale shape: ONE user_id shuffle for the sequence window; the bigram
    count is a tiny |types|² aggregate, and the normalizing sum is a
    window over that aggregate (no second pass over the data)."""
    ev = _ev_ms(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ms", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    counts = s.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    wsrc = W.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n_transitions",
        rnd(
            F.col("n_transitions").cast("double") / F.sum("n_transitions").over(wsrc),
            4,
        ).alias("p"),
    ).orderBy("src", "dst")


@register(
    "q_gap_fill",
    shape="bounded",
    tags=("analytics", "gap-fill"),
    oracle=f"""
WITH daily AS (
  SELECT epoch_ms(ts) // {_DAY_MS} AS day_idx, event_type,
         count(*) AS n, round(5e-10 + sum(value), 2) AS s
  FROM events GROUP BY 1, 2
), b AS (
  SELECT min(day_idx) AS d0, max(day_idx) AS d1 FROM daily
), grid AS (
  SELECT gs.day_idx, et.event_type
  FROM (SELECT unnest(generate_series(d0, d1)) AS day_idx FROM b) gs
  CROSS JOIN (SELECT DISTINCT event_type FROM daily) et
)
SELECT g.day_idx, g.event_type,
       coalesce(d.n, 0)::BIGINT AS n_events,
       coalesce(d.s, 0.0) AS sum_value,
       (d.day_idx IS NULL) AS filled
FROM grid g LEFT JOIN daily d USING (day_idx, event_type)
ORDER BY 1, 2
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per event_type: a generated day grid
    LEFT-joined to the sparse daily aggregate, zero-filling (and
    flagging) missing days — the standard pre-step for rolling metrics
    that must see absent days as zeros.

    Scale shape: the grid is days × types (tiny — thousands of rows even
    for years), built with `sequence`/`explode` and BROADCAST to the
    aggregated side; raw events are touched exactly once."""
    ev = _ev_ms(spark, sf_dir)
    daily = (
        ev.groupBy(
            (F.col("ms") / F.lit(_DAY_MS)).cast("long").alias("day_idx"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("value"), 2).alias("s"))
    )
    bounds = daily.agg(
        F.min("day_idx").alias("d0"), F.max("day_idx").alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day_idx")
    )
    types = daily.select("event_type").distinct()
    grid = days.crossJoin(types)
    return (
        F.broadcast(grid)
        .join(daily, ["day_idx", "event_type"], "left")
        .select(
            "day_idx",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("s", F.lit(0.0)).alias("sum_value"),
            F.col("n").isNull().alias("filled"),
        )
        .orderBy("day_idx", "event_type")
    )


@register(
    "q_rolling_wau",
    shape="bounded",
    tags=("analytics", "rolling-distinct"),
    oracle=f"""
WITH du AS (
  SELECT DISTINCT epoch_ms(ts) // {_DAY_MS} AS day_idx, user_id FROM events
), days AS (
  SELECT DISTINCT day_idx FROM du
), dau AS (
  SELECT day_idx, count(*) AS dau FROM du GROUP BY 1
), wau AS (
  SELECT d.day_idx, count(DISTINCT u.user_id) AS wau
  FROM days d JOIN du u ON u.day_idx BETWEEN d.day_idx - 6 AND d.day_idx
  GROUP BY 1
)
SELECT d.day_idx, dau.dau::BIGINT AS dau, wau.wau::BIGINT AS wau,
       round(5e-10 + dau.dau::DOUBLE / wau.wau, 4) AS stickiness
FROM days d JOIN dau USING (day_idx) JOIN wau USING (day_idx)
ORDER BY day_idx
""",
)
def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users (WAU) per day, plus DAU and the
    DAU/WAU stickiness ratio.  Distinct-over-sliding-window does NOT
    decompose into a window frame (distinct isn't subtractable), so the
    scalable form is a range join of the tiny day spine against the
    deduped (day, user) projection, then count-distinct per spine day.

    Scale shape: (day, user) is deduped ONCE (the only big shuffle); the
    day spine is a few thousand rows broadcast to it — each (day,user)
    row fans out to ≤7 spine days, so the joined size stays ~7×|du|,
    independent of raw event volume."""
    ev = _ev_ms(spark, sf_dir)
    du = (
        ev.select(
            (F.col("ms") / F.lit(_DAY_MS)).cast("long").alias("day_idx"),
            "user_id",
        )
        .distinct()
        .persist()
        # lifecycle: consumed by dau + the range join below within this
        # plan; session-LRU bounded ((day,user) pairs only).
    )
    days = du.select("day_idx").distinct()
    dau = du.groupBy("day_idx").agg(F.count(F.lit(1)).alias("dau"))
    spine = days.select(F.col("day_idx").alias("spine_day"))
    wau = (
        F.broadcast(spine)
        .join(
            du,
            (F.col("day_idx") >= F.col("spine_day") - 6)
            & (F.col("day_idx") <= F.col("spine_day")),
        )
        .groupBy("spine_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("spine_day", "day_idx")
    )
    return (
        days.join(dau, "day_idx")
        .join(wau, "day_idx")
        .select(
            "day_idx",
            "dau",
            "wau",
            rnd(F.col("dau").cast("double") / F.col("wau"), 4).alias("stickiness"),
        )
        .orderBy("day_idx")
    )


@register(
    "q_weighted_ma",
    shape="bounded",
    tags=("analytics", "moving-average"),
    oracle=f"""
WITH daily AS (
  SELECT epoch_ms(ts) // {_DAY_MS} AS day_idx, event_type,
         sum(value) AS s
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT day_idx, event_type, s,
         lag(s, 1) OVER w AS s1, lag(s, 2) OVER w AS s2,
         lag(s, 3) OVER w AS s3, lag(s, 4) OVER w AS s4,
         lag(s, 5) OVER w AS s5, lag(s, 6) OVER w AS s6
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)
)
SELECT day_idx, event_type, round(5e-10 + s, 2) AS sum_value,
       round(5e-10 +
         (7*s + 6*coalesce(s1,0) + 5*coalesce(s2,0) + 4*coalesce(s3,0)
          + 3*coalesce(s4,0) + 2*coalesce(s5,0) + 1*coalesce(s6,0))
         / (7 + CASE WHEN s1 IS NULL THEN 0 ELSE 6 END
              + CASE WHEN s2 IS NULL THEN 0 ELSE 5 END
              + CASE WHEN s3 IS NULL THEN 0 ELSE 4 END
              + CASE WHEN s4 IS NULL THEN 0 ELSE 3 END
              + CASE WHEN s5 IS NULL THEN 0 ELSE 2 END
              + CASE WHEN s6 IS NULL THEN 0 ELSE 1 END), 4) AS wma7
FROM lagged ORDER BY event_type, day_idx
""",
)
def q_weighted_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted 7-day moving average of the daily value sum per
    event_type (weight 7 for today down to 1 for six days back;
    series-head rows renormalize over the weights actually present).
    Built from explicit `lag` columns — unlike `avg OVER ROWS 6
    PRECEDING`, arbitrary per-offset weights stay expressible and the
    arithmetic is identical on both engines.

    Scale shape: the window runs over the DAILY aggregate (days × types
    rows), not raw events — one event_type-keyed shuffle of a tiny
    table after the map-side-combined daily agg."""
    ev = _ev_ms(spark, sf_dir)
    daily = ev.groupBy(
        (F.col("ms") / F.lit(_DAY_MS)).cast("long").alias("day_idx"),
        "event_type",
    ).agg(F.sum("value").alias("s"))
    w = W.partitionBy("event_type").orderBy("day_idx")
    lagged = daily.select(
        "day_idx",
        "event_type",
        "s",
        *[F.lag("s", i).over(w).alias(f"s{i}") for i in range(1, 7)],
    )
    weights = [7, 6, 5, 4, 3, 2, 1]
    num = F.lit(7) * F.col("s")
    den = F.lit(7).cast("double")
    for i in range(1, 7):
        num = num + F.lit(weights[i]) * F.coalesce(F.col(f"s{i}"), F.lit(0.0))
        den = den + F.when(F.col(f"s{i}").isNull(), F.lit(0)).otherwise(
            F.lit(weights[i])
        )
    return lagged.select(
        "day_idx",
        "event_type",
        rnd(F.col("s"), 2).alias("sum_value"),
        rnd(num / den, 4).alias("wma7"),
    ).orderBy("event_type", "day_idx")


_HOUR_MS = 3600000


@register(
    "q_resample_ffill",
    shape="bounded",
    tags=("analytics", "resample"),
    oracle=f"""
WITH hourly AS (
  SELECT epoch_ms(ts) // {_HOUR_MS} AS hour_idx, event_type,
         round(5e-10 + avg(value), 4) AS v
  FROM events GROUP BY 1, 2
), b AS (
  SELECT min(hour_idx) AS h0, max(hour_idx) AS h1 FROM hourly
), grid AS (
  SELECT gs.hour_idx, et.event_type
  FROM (SELECT unnest(generate_series(h0, h1)) AS hour_idx FROM b) gs
  CROSS JOIN (SELECT DISTINCT event_type FROM hourly) et
)
SELECT g.hour_idx, g.event_type,
       h.v AS avg_value,
       last_value(h.v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hour_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value,
       (h.v IS NULL) AS filled
FROM grid g LEFT JOIN hourly h USING (hour_idx, event_type)
ORDER BY g.event_type, g.hour_idx
""",
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with forward fill: a dense hour grid per
    event_type, empty hours carrying the last observed hourly average
    forward (leading gaps stay NULL) — the standard time-series
    regularization before feature extraction.

    Scale shape: same broadcast-grid pattern as q_gap_fill (the grid is
    hours × types, tiny at any horizon); the fill is a per-type
    `last(ignorenulls)` running window over the AGGREGATED series — the
    fill never touches raw events, and the rounded hourly average is
    filled (identical on both engines) rather than re-derived."""
    ev = _ev_ms(spark, sf_dir)
    hourly = ev.groupBy(
        (F.col("ms") / F.lit(_HOUR_MS)).cast("long").alias("hour_idx"),
        "event_type",
    ).agg(rnd(F.avg("value"), 4).alias("v"))
    bounds = hourly.agg(F.min("hour_idx").alias("h0"), F.max("hour_idx").alias("h1"))
    hours = bounds.select(F.explode(F.sequence("h0", "h1")).alias("hour_idx"))
    types = hourly.select("event_type").distinct()
    grid = hours.crossJoin(types)
    joined = F.broadcast(grid).join(hourly, ["hour_idx", "event_type"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "hour_idx",
        "event_type",
        F.col("v").alias("avg_value"),
        F.last("v", ignorenulls=True).over(w).alias("ffill_value"),
        F.col("v").isNull().alias("filled"),
    ).orderBy("event_type", "hour_idx")


@register(
    "q_zscore_anomaly",
    shape="per_row",
    tags=("analytics", "anomaly"),
    oracle="""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, round(5e-10 + e.value, 4) AS value,
       round(5e-10 + (e.value - s.mu) / s.sigma, 4) AS z
FROM events e JOIN stats s USING (event_type)
WHERE abs((e.value - s.mu) / s.sigma) > 2.5
ORDER BY e.event_id
""",
)
def q_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier flagging per event_type (|z| > 2.5):
    the batch form of the streaming anomaly detector a consumer callback
    would run — fit global per-type moments, then score every event.

    Scale shape: the per-type moments are |types| rows, broadcast back
    onto the scan; scoring is a map-only stage (no second shuffle), and
    the filter prunes output to the anomaly tail."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            rnd(F.col("value"), 4).alias("value"),
            rnd(z, 4).alias("z"),
        )
    )


@register(
    "q_user_journey",
    shape="per_row",
    tags=("analytics", "journey"),
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS rn_a,
         row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC
         ) AS rn_d
  FROM events
), agg AS (
  SELECT user_id, count(*) AS n_events,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS n_purchases
  FROM events GROUP BY user_id
)
SELECT a.user_id,
       f.event_type AS first_type,
       l.event_type AS last_type,
       a.n_events, a.n_purchases,
       (a.n_purchases > 0) AS converted
FROM agg a
JOIN (SELECT user_id, event_type FROM ranked WHERE rn_a = 1) f USING (user_id)
JOIN (SELECT user_id, event_type FROM ranked WHERE rn_d = 1) l USING (user_id)
ORDER BY a.user_id
""",
)
def q_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user journey summary: first/last touch event type (total order
    = (ms, event_id)), event count, purchase count, converted flag —
    first-touch/last-touch attribution in one pass.

    Scale shape: a single user_id-keyed aggregation using min_by/max_by
    on the (ms, event_id) struct — NO row_number sort-window, no joins;
    the oracle spells the same semantics relationally."""
    ev = _ev_ms(spark, sf_dir)
    key = F.struct(F.col("ms"), F.col("event_id"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.min_by("event_type", key).alias("first_type"),
            F.max_by("event_type", key).alias("last_type"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
        )
        .select(
            "user_id",
            "first_type",
            "last_type",
            "n_events",
            "n_purchases",
            (F.col("n_purchases") > 0).alias("converted"),
        )
    )
