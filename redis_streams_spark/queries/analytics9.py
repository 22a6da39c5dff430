"""Round-7 analytics wave 1: EWMA smoothing, rolling quantiles,
interval merging, IGNORE NULLS window semantics, deterministic mode,
and Kaplan-Meier survival.

Reference basis: none (the reference is a delivery client; SURVEY §2.2
mandates the analytic surface).  Common thread: every query is a
window/aggregate over a bounded-domain frame (days × types, users) —
the fact table is scanned once and reduced before any window runs, so
none of these sort or carry the raw 100 TB row stream through a global
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_DAY_MS = 86_400_000
_ALPHA = 0.3
_BETA = 1.0 - _ALPHA


@register(
    "q_ewma_daily",
    shape="bounded",
    tags=("timeseries", "window", "smoothing"),
    oracle=f"""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS day, avg(value) AS x
  FROM events GROUP BY 1, 2
), runs AS (
  SELECT event_type, day, x,
         list(x) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vals
  FROM daily
)
SELECT event_type, day * {_DAY_MS} AS day_ms,
       {rnd_sql('x', 6)} AS daily_mean,
       {rnd_sql(f'list_sum(list_transform(vals, (v, i) -> v * pow({_BETA}, len(vals) - i))) / list_sum(list_transform(vals, (v, i) -> pow({_BETA}, len(vals) - i)))', 6)} AS ewma
FROM runs ORDER BY event_type, day_ms
""",
)
def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.3, adjust=True: the
    weighted mean Σβ^(t-i)x_i / Σβ^(t-i)) of the daily mean value per
    event type — the classic trend smoother.

    Exactness across engines: EWMA is sequential by definition, so both
    sides fold the SAME running list in the SAME ascending order (Spark
    ``aggregate`` over a running-frame ``collect_list``, DuckDB
    ``list_transform``+``list_sum`` over a running ``list()`` window) —
    identical FP operation order, identical doubles.

    Scale shape: the fold is O(t) per row over the DAILY aggregate
    (rows = days × types, a domain-bounded frame independent of fact
    cardinality), never over raw events — the one scan of the fact
    table reduces it to that frame first.  For unbounded histories the
    upgrade path is the recursive one-state-per-key streaming form
    (``applyInPandasWithState``), not a longer fold."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", (F.expr(_MS) / _DAY_MS).cast("long").alias("day")
    ).agg(F.avg("value").alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fold = (
        f"aggregate(vals, named_struct('num', cast(0 as double), "
        f"'den', cast(0 as double), 'k', size(vals) - 1), "
        f"(acc, v) -> named_struct('num', acc.num + v * pow({_BETA}, acc.k), "
        f"'den', acc.den + pow({_BETA}, acc.k), 'k', acc.k - 1), "
        f"acc -> acc.num / acc.den)"
    )
    return (
        daily.withColumn("vals", F.collect_list("x").over(w))
        .select(
            "event_type",
            (F.col("day") * _DAY_MS).alias("day_ms"),
            rnd(F.col("x"), 6).alias("daily_mean"),
            rnd(F.expr(fold), 6).alias("ewma"),
        )
        .orderBy("event_type", "day_ms")
    )


@register(
    "q_rolling_quantile",
    shape="bounded",
    tags=("timeseries", "window", "quantile"),
    oracle=f"""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS day, sum(value) AS rev
  FROM events GROUP BY 1, 2
)
SELECT event_type, day * {_DAY_MS} AS day_ms, {rnd_sql('rev', 4)} AS rev,
       {rnd_sql('quantile_cont(rev, 0.5) OVER w7', 4)} AS p50_7d,
       {rnd_sql('quantile_cont(rev, 0.9) OVER w7', 4)} AS p90_7d
FROM daily
WINDOW w7 AS (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY event_type, day_ms
""",
)
def q_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day median and p90 of daily revenue per event type —
    the robust-statistics rolling window (a rolling mean hides spikes a
    rolling median survives).  Both engines interpolate linearly
    (``percentile`` / ``quantile_cont``).

    Scale shape: exact quantiles run over a bounded 7-row frame of the
    DAILY aggregate — per-row cost is O(frame log frame) on a
    domain-bounded table, not a sketch and not a fact-table sort."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", (F.expr(_MS) / _DAY_MS).cast("long").alias("day")
    ).agg(F.sum("value").alias("rev"))
    w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "event_type",
        (F.col("day") * _DAY_MS).alias("day_ms"),
        rnd(F.col("rev"), 4).alias("rev"),
        rnd(F.expr("percentile(rev, 0.5)").over(w7), 4).alias("p50_7d"),
        rnd(F.expr("percentile(rev, 0.9)").over(w7), 4).alias("p90_7d"),
    ).orderBy("event_type", "day_ms")


@register(
    "q_interval_merge",
    shape="per_row",
    tags=("window", "islands", "sessionize"),
    oracle=f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_ms(ts) AS s,
         epoch_ms(ts) + floor(value * 60000)::BIGINT AS e
  FROM events
), flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN s <= max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS new_island
  FROM iv
), grouped AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT user_id, min(s)::BIGINT AS merged_start_ms, max(e)::BIGINT AS merged_end_ms,
       count(*)::BIGINT AS n_intervals
FROM grouped GROUP BY user_id, island
ORDER BY user_id, merged_start_ms
""",
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals per user (each event spans
    [ts, ts + value minutes]) — the interval flavor of gaps-and-islands:
    a new island starts where an interval's start exceeds the running
    max end of everything before it, islands collapse to
    (min start, max end, count).  Touching intervals (s == prev max e)
    merge.

    Determinism: the running max-end is taken over the total order
    (s, e, event_id), so tied starts fold identically on both engines.

    Scale shape: one shuffle on user_id, then two running windows inside
    each partition and a group-by — the standard distributed interval
    union (calendar merging, session stitching, IP-range coalescing)."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.expr(_MS).alias("s"),
        (F.expr(_MS) + F.floor(F.col("value") * 60000).cast("long")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the running sum must use the SAME total order as the flag window:
    # with only (s, e) a tied duplicate interval could sort before the
    # row that opened its island and fold into the previous one
    # (review finding, round 7)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(F.col("s") <= F.max("e").over(w_prev), F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    grouped = flagged.withColumn("island", F.sum("new_island").over(w_run))
    return (
        grouped.groupBy("user_id", "island")
        .agg(
            F.min("s").alias("merged_start_ms"),
            F.max("e").alias("merged_end_ms"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .select("user_id", "merged_start_ms", "merged_end_ms", "n_intervals")
    )


@register(
    "q_window_ignore_nulls",
    shape="per_row",
    tags=("window", "null-semantics", "gallery"),
    oracle=f"""
WITH pv AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'purchase' THEN value END AS pval
  FROM events
), runs AS (
  SELECT user_id, event_id,
         last_value(pval IGNORE NULLS) OVER w AS last_p,
         first_value(pval IGNORE NULLS) OVER w AS first_p,
         nth_value(pval, 2 IGNORE NULLS) OVER w AS second_p,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM pv
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       {rnd_sql('coalesce(last_p, -1.0)', 4)} AS last_purchase,
       {rnd_sql('coalesce(first_p, -1.0)', 4)} AS first_purchase,
       {rnd_sql('coalesce(second_p, -1.0)', 4)} AS second_purchase
FROM runs WHERE rn = 1 ORDER BY user_id
""",
)
def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics gallery: per user, the latest /
    first / second purchase value carried across non-purchase rows —
    ``last/first/nth_value`` with ``ignorenulls`` over a running frame,
    the forward-fill idiom SQL:2011 standardizes and both engines
    implement.  Users with no (or one) purchase surface the documented
    ``-1.0`` sentinel (a NULL double would float-promote DuckDB's
    pandas fetch and break the type-family compare).

    Scale shape: one shuffle on user_id; the running frame never
    re-sorts the fact table globally, and the rn=1 cut returns one row
    per user."""
    ev = load_table(spark, sf_dir, "events")
    pv = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pval"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    runs = pv.select(
        "user_id",
        F.last("pval", ignorenulls=True).over(w).alias("last_p"),
        F.first("pval", ignorenulls=True).over(w).alias("first_p"),
        F.nth_value("pval", 2, ignoreNulls=True).over(w).alias("second_p"),
        F.row_number().over(w_last).alias("rn"),
    )
    return (
        runs.where(F.col("rn") == 1)
        .select(
            "user_id",
            rnd(F.coalesce(F.col("last_p"), F.lit(-1.0)), 4).alias("last_purchase"),
            rnd(F.coalesce(F.col("first_p"), F.lit(-1.0)), 4).alias("first_purchase"),
            rnd(F.coalesce(F.col("second_p"), F.lit(-1.0)), 4).alias(
                "second_purchase"
            ),
        )
    )


@register(
    "q_mode_gallery",
    shape="bounded",
    tags=("agg", "gallery", "statistics"),
    oracle=f"""
WITH hourly AS (
  SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hour, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       arg_max(hour, c * 100 + (99 - hour))::BIGINT AS modal_hour,
       max(c)::BIGINT AS modal_count,
       {rnd_sql('quantile_cont(hour, 0.5)', 2)} AS median_hour,
       count(*)::BIGINT AS n_distinct_hours
FROM hourly GROUP BY event_type ORDER BY event_type
""",
)
def q_mode_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the busiest hour-of-day per event type, with
    ties broken toward the SMALLER hour — native ``mode()`` is
    tie-arbitrary on both engines, so the mode is computed as
    ``max_by`` over the packed key ``count*100 + (99 - hour)`` (count
    dominates, smaller hour wins ties; hour < 100 keeps the packing
    collision-free).  Median hour and distinct-hour cardinality ride
    along.

    Scale shape: two-level aggregate — (type, hour) partial counts
    shuffle one row per cell of a 5×24 domain, then a 24-row argmax per
    type.  Nothing about the fact table's size reaches the second
    stage."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        ((F.expr(_MS) / 3_600_000).cast("long") % 24).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        hourly.groupBy("event_type")
        .agg(
            F.expr("max_by(hour, c * 100 + (99 - hour))").alias("modal_hour"),
            F.max("c").alias("modal_count"),
            rnd(F.expr("percentile(hour, 0.5)"), 2).alias("median_hour"),
            F.count(F.lit(1)).alias("n_distinct_hours"),
        )
        .orderBy("event_type")
    )


@register(
    "q_survival_km",
    shape="bounded",
    tags=("statistics", "survival", "window"),
    oracle=f"""
WITH firsts AS (
  SELECT user_id, min(epoch_ms(ts)) AS t0 FROM events GROUP BY user_id
), convs AS (
  SELECT user_id, min(epoch_ms(ts)) AS tc FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
), horizon AS (
  SELECT max(epoch_ms(ts)) AS tmax FROM events
), subjects AS (
  SELECT f.user_id,
         CASE WHEN c.tc IS NOT NULL AND c.tc >= f.t0
              THEN (c.tc - f.t0) // {_DAY_MS}
              ELSE (h.tmax - f.t0) // {_DAY_MS} END AS dur,
         CASE WHEN c.tc IS NOT NULL AND c.tc >= f.t0 THEN 1 ELSE 0 END AS converted
  FROM firsts f LEFT JOIN convs c USING (user_id) CROSS JOIN horizon h
), by_dur AS (
  SELECT dur, sum(converted)::BIGINT AS d, count(*)::BIGINT AS leaving
  FROM subjects GROUP BY dur
), at_risk AS (
  SELECT dur, d,
         (SELECT count(*) FROM subjects) -
           coalesce(sum(leaving) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM by_dur
), km AS (
  SELECT dur, d, n_risk,
         exp(sum(ln(greatest(1.0 - d * 1.0 / n_risk, 1e-300)))
           OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM at_risk
)
SELECT dur AS dur_days, n_risk::BIGINT AS n_risk, d AS d_events,
       {rnd_sql('s', 6)} AS survival
FROM km WHERE d > 0 ORDER BY dur_days
""",
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival: S(t) = Π(1 - d_i/n_i) over conversion
    durations, with users who never purchase CENSORED at the corpus
    horizon instead of dropped — the estimator that makes
    time-to-convert honest when observation windows truncate (plain
    conversion-lag percentiles, q_time_to_convert, silently condition
    on having converted).

    The product folds as exp(Σ ln(...)) over a cumulative window —
    associative, distributable, and identical on both engines.  The
    d = n edge (the last at-risk subject converts) clamps the factor at
    1e-300 before ln — Spark's log returns NULL at 0 while DuckDB's
    returns -inf, so the clamp is what keeps the engines agreeing; it
    rounds to the true KM value 0 at 6 dp regardless.

    Scale shape: per-user first/conversion times are two aggregates of
    the fact table; everything after runs on the duration frame (≤ one
    row per distinct day count) under a single tiny unpartitioned
    window BOUNDED by the per-duration aggregate."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    firsts = ev.groupBy("user_id").agg(F.min(ms).alias("t0"))
    convs = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(ms).alias("tc"))
    )
    horizon = ev.agg(F.max(ms).alias("tmax"))
    conv_ok = F.col("tc").isNotNull() & (F.col("tc") >= F.col("t0"))
    subjects = (
        firsts.join(convs, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(conv_ok, (F.col("tc") - F.col("t0")) / _DAY_MS)
            .otherwise((F.col("tmax") - F.col("t0")) / _DAY_MS)
            .cast("long")
            .alias("dur"),
            F.when(conv_ok, F.lit(1)).otherwise(F.lit(0)).alias("converted"),
        )
    )
    by_dur = subjects.groupBy("dur").agg(
        F.sum("converted").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    total = subjects.agg(F.count(F.lit(1)).alias("n_total"))
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = by_dur.crossJoin(F.broadcast(total)).select(
        "dur",
        "d",
        (
            F.col("n_total")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    km = at_risk.select(
        "dur",
        "d",
        "n_risk",
        F.exp(
            F.sum(
                F.log(
                    F.greatest(
                        1.0 - F.col("d") * 1.0 / F.col("n_risk"), F.lit(1e-300)
                    )
                )
            ).over(w_run)
        ).alias("s"),
    )
    return (
        km.where(F.col("d") > 0)
        .select(
            F.col("dur").alias("dur_days"),
            "n_risk",
            F.col("d").alias("d_events"),
            rnd(F.col("s"), 6).alias("survival"),
        )
        .orderBy("dur_days")
    )
