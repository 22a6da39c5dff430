"""Round-8 analytics wave 3: batch audit of the streaming quantile
sketch, a calendar-hierarchy rollup, and time-decay attribution.

Reference basis: none (SURVEY §2.2 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.binning import (
    LO_EXP as _LO,
    N_BINS as _N_BINS,
    N_PER_DECADE as _NPD,
    log_bin_index_col,
    log_bin_index_sql,
)
from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"

# bin grid shared via functions/binning (one cross-engine definition)
_QS = ((0.5, "p50"), (0.95, "p95"), (0.99, "p99"))


def _sketch_audit_oracle() -> str:
    idx_expr = log_bin_index_sql("value")
    rank_cols = ", ".join(
        f"greatest(1, ceil({q} * n)::BIGINT) AS r_{nm}" for q, nm in _QS
    )
    exact_cols = ", ".join(
        f"max(CASE WHEN v.rn = r.r_{nm} THEN v.value END) AS {nm}_exact"
        for _, nm in _QS
    )
    est_cols = ", ".join(
        f"""min(CASE WHEN h.cum >= r.r_{nm} THEN
              CASE WHEN h.idx <= 0 THEN 1e-6
                   ELSE power(10, (h.idx + {_LO * _NPD}) * 1.0 / {_NPD}) END
            END) AS {nm}_est"""
        for _, nm in _QS
    )
    ratio_cols = ", ".join(
        f"{rnd_sql(f'e.{nm}_est / x.{nm}_exact', 6)} AS {nm}_ratio"
        for _, nm in _QS
    )
    out_cols = ", ".join(
        f"{rnd_sql(f'x.{nm}_exact', 4)} AS {nm}_exact, "
        f"{rnd_sql(f'e.{nm}_est', 4)} AS {nm}_est"
        for _, nm in _QS
    )
    return f"""
WITH vals AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn
  FROM events
), nn AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY event_type
), ranks AS (
  SELECT event_type, n, {rank_cols} FROM nn
), hist AS (
  SELECT event_type, {idx_expr} AS idx, count(*) AS c
  FROM events GROUP BY 1, 2
), cumh AS (
  SELECT event_type, idx,
         sum(c) OVER (PARTITION BY event_type ORDER BY idx) AS cum
  FROM hist
), exacts AS (
  SELECT v.event_type, {exact_cols}
  FROM vals v JOIN ranks r ON r.event_type = v.event_type
  GROUP BY v.event_type
), ests AS (
  SELECT h.event_type, {est_cols}
  FROM cumh h JOIN ranks r ON r.event_type = h.event_type
  GROUP BY h.event_type
)
SELECT x.event_type, r.n::BIGINT AS n, {out_cols}, {ratio_cols}
FROM exacts x
JOIN ests e ON e.event_type = x.event_type
JOIN ranks r ON r.event_type = x.event_type
ORDER BY x.event_type
"""


@register(
    "q_quantile_sketch_audit",
    shape="bounded",
    tags=("sketch", "quantile", "streaming-parity"),
    oracle=_sketch_audit_oracle(),
)
def q_quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch audit of the streaming log-histogram quantile sketch
    (streaming/quantiles.py): rebuild the IDENTICAL 16-bins-per-decade
    histogram as a DataFrame aggregation, read p50/p95/p99 as the
    bin upper edge at rank ceil(q·n), and compare against the exact
    order statistics.  Every ratio must sit in [1, BASE≈1.155] — the
    sketch's provable value-axis bound, here verified value-for-value
    by the oracle rather than asserted in a unit test.  The histogram
    path is the 100 TB shape (map-side combine onto ≤289 cells/group);
    the exact column is the audit (per-type sort)."""
    ev = load_table(spark, sf_dir, "events")
    idx = log_bin_index_col(F.col("value"))
    wt = W.partitionBy("event_type")
    vals = ev.select(
        "event_type",
        "value",
        F.row_number().over(wt.orderBy("value", "event_id")).alias("rn"),
    )
    ranks = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    for q, nm in _QS:
        ranks = ranks.withColumn(
            f"r_{nm}", F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("n")).cast("long"))
        )
    hist = ev.groupBy("event_type", idx.alias("idx")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cumh = hist.withColumn("cum", F.sum("c").over(wt.orderBy("idx")))
    edge = F.when(F.col("idx") <= 0, 1e-6).otherwise(
        F.pow(F.lit(10.0), (F.col("idx") + _LO * _NPD) * 1.0 / _NPD)
    )
    exacts = (
        vals.join(F.broadcast(ranks), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                F.max(
                    F.when(F.col("rn") == F.col(f"r_{nm}"), F.col("value"))
                ).alias(f"{nm}_exact")
                for _, nm in _QS
            ]
        )
    )
    ests = (
        cumh.join(F.broadcast(ranks), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                F.min(
                    F.when(F.col("cum") >= F.col(f"r_{nm}"), edge)
                ).alias(f"{nm}_est")
                for _, nm in _QS
            ]
        )
    )
    out = exacts.join(ests, "event_type").join(
        F.broadcast(ranks.select("event_type", "n")), "event_type"
    )
    cols = ["event_type", F.col("n").cast("long").alias("n")]
    for _, nm in _QS:
        cols += [
            rnd(F.col(f"{nm}_exact"), 4).alias(f"{nm}_exact"),
            rnd(F.col(f"{nm}_est"), 4).alias(f"{nm}_est"),
        ]
    for _, nm in _QS:
        cols.append(
            rnd(F.col(f"{nm}_est") / F.col(f"{nm}_exact"), 6).alias(f"{nm}_ratio")
        )
    return out.select(*cols).orderBy("event_type")


@register(
    "q_time_rollup",
    shape="bounded",
    tags=("rollup", "calendar", "grouping"),
    oracle=f"""
WITH base AS (
  SELECT epoch_ms(date_trunc('year', ts)) AS year_ms,
         epoch_ms(date_trunc('month', ts)) AS month_ms,
         (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
         value
  FROM events
)
SELECT CASE WHEN day_ms IS NOT NULL THEN 'day'
            WHEN month_ms IS NOT NULL THEN 'month'
            WHEN year_ms IS NOT NULL THEN 'year'
            ELSE 'total' END AS level,
       coalesce(day_ms, month_ms, year_ms, -1) AS period_start_ms,
       count(*)::BIGINT AS n_events,
       {rnd_sql('sum(value)', 2)} AS sum_value
FROM base
GROUP BY ROLLUP (year_ms, month_ms, day_ms)
ORDER BY level, period_start_ms
""",
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy ROLLUP (day ⊂ month ⊂ year ⊂ total) in ONE
    aggregation: Spark's rollup() emits all four grains with partial
    aggregation shared across levels — vs four separate groupBys, the
    scan and the map-side combine happen once.  Level is decoded from
    the null pattern (the hierarchy key can never be null in the data,
    so null ⇔ rolled-up; -1 sentinel keys the total row).  Weeks are
    deliberately NOT a level: epoch/ISO weeks straddle calendar months,
    so a (month, week, day) rollup would emit split week fragments —
    only strictly nesting grains belong in one ROLLUP (review finding
    r08; a week report is q_tumbling_daily's 7-day twin, grouped
    independently).  Same shape as q_rollup_lineitem but over the
    event-time calendar hierarchy."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    day_idx = (F.expr(_MS) / F.lit(86400000)).cast("long")
    base = ev.select(
        F.unix_millis(F.date_trunc("year", ts)).alias("year_ms"),
        F.unix_millis(F.date_trunc("month", ts)).alias("month_ms"),
        (day_idx * 86400000).alias("day_ms"),
        "value",
    )
    level = (
        F.when(F.col("day_ms").isNotNull(), "day")
        .when(F.col("month_ms").isNotNull(), "month")
        .when(F.col("year_ms").isNotNull(), "year")
        .otherwise("total")
    )
    return (
        base.rollup("year_ms", "month_ms", "day_ms")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            level.alias("level"),
            F.coalesce("day_ms", "month_ms", "year_ms", F.lit(-1)).alias(
                "period_start_ms"
            ),
            "n_events",
            "sum_value",
        )
        .orderBy("level", "period_start_ms")
    )


_TAU_MS = 7 * 86400000  # 7-day decay constant


def _time_decay_oracle() -> str:
    return f"""
WITH seq AS (
  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
           AS journey
  FROM events
), touches AS (
  SELECT user_id, journey, event_type, ms FROM seq
  WHERE event_type <> 'purchase'
), convs AS (
  SELECT user_id, journey, value, ms AS conv_ms FROM seq
  WHERE event_type = 'purchase'
), weighted AS (
  SELECT t.event_type, c.value,
         exp(-(c.conv_ms - t.ms) * 1.0 / {_TAU_MS}) AS w,
         sum(exp(-(c.conv_ms - t.ms) * 1.0 / {_TAU_MS}))
           OVER (PARTITION BY t.user_id, t.journey) AS w_sum
  FROM touches t
  JOIN convs c ON c.user_id = t.user_id AND c.journey = t.journey
)
SELECT event_type AS channel,
       count(*)::BIGINT AS n_touches,
       {rnd_sql('sum(value * w / w_sum)', 2)} AS attributed_value
FROM weighted
GROUP BY event_type
ORDER BY channel
"""


@register(
    "q_attribution_time_decay",
    shape="bounded",
    tags=("attribution", "funnel", "window"),
    oracle=_time_decay_oracle(),
)
def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: each touch in the journey
    ending at the user's next purchase earns credit ∝ exp(-Δt/τ)
    (τ = 7 days), normalized so every purchase distributes exactly its
    value — recency-weighted, completing the attribution trio
    (first/last: q_attribution; U-shaped: q_attribution_position).
    Same journey construction: a running purchase count partitions each
    user's stream; per-user windows + one journey-keyed join."""
    ev = load_table(spark, sf_dir, "events")
    wseq = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.expr(_MS).alias("ms"),
        (
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).over(wseq),
                F.lit(0),
            )
            + 1
        ).alias("journey"),
    )
    touches = seq.where(F.col("event_type") != "purchase").select(
        "user_id", "journey", "event_type", "ms"
    )
    convs = seq.where(F.col("event_type") == "purchase").select(
        "user_id", "journey", "value", F.col("ms").alias("conv_ms")
    )
    w = F.exp(-(F.col("conv_ms") - F.col("ms")) * 1.0 / _TAU_MS)
    weighted = (
        touches.join(convs, ["user_id", "journey"])
        .withColumn("w", w)
        .withColumn(
            "w_sum", F.sum("w").over(W.partitionBy("user_id", "journey"))
        )
    )
    return (
        weighted.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            rnd(F.sum(F.col("value") * F.col("w") / F.col("w_sum")), 2).alias(
                "attributed_value"
            ),
        )
        .orderBy("channel")
    )


@register(
    "q_fano_burstiness",
    shape="bounded",
    tags=("timeseries", "stats", "monitoring"),
    oracle=f"""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         count(*) AS n, sum(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       count(*)::BIGINT AS n_days,
       {rnd_sql('avg(n)', 4)} AS mean_daily,
       {rnd_sql('var_pop(n)', 4)} AS var_daily,
       {rnd_sql('var_pop(n) / avg(n)', 6)} AS fano_factor,
       {rnd_sql('var_pop(v) / (avg(v) * avg(v))', 6)} AS cv2_value
FROM daily
GROUP BY event_type
ORDER BY event_type
""",
)
def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness diagnostics per event type: the Fano factor
    (Var/mean of daily counts — 1 for a Poisson arrival process, >1
    overdispersed/bursty, <1 regular) and the squared coefficient of
    variation of daily value sums.  The pair that decides whether
    rate-based capacity planning (q_scaler_decision) can assume Poisson
    arrivals.  Pure aggregate-of-the-daily-aggregate — corpus size only
    changes the first scan."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / F.lit(86400000)).cast("long")
    daily = ev.groupBy(F.col("event_type"), day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            rnd(F.avg("n"), 4).alias("mean_daily"),
            rnd(F.var_pop("n"), 4).alias("var_daily"),
            rnd(F.var_pop("n") / F.avg("n"), 6).alias("fano_factor"),
            rnd(F.var_pop("v") / (F.avg("v") * F.avg("v")), 6).alias("cv2_value"),
        )
        .orderBy("event_type")
    )


_ADVISOR_TARGET_BYTES = 128 * 1024 * 1024  # shuffle-partition sizing target
_BROADCAST_LIMIT = 10 * 1024 * 1024  # spark.sql.autoBroadcastJoinThreshold


def _advisor_oracle() -> str:
    # per-table estimated in-memory bytes from value-based row footprints
    tables = """
SELECT 'events' AS table_name, count(*) AS n_rows,
       sum(8 + 8 + 8 + octet_length(encode(event_type))
           + octet_length(encode(props)) + 8)::BIGINT AS est_bytes
FROM events
UNION ALL
SELECT 'lineitem', count(*),
       sum(76 + octet_length(encode(l_returnflag))
           + octet_length(encode(l_linestatus)))::BIGINT
FROM lineitem
UNION ALL
SELECT 'documents', count(*),
       sum(8 + octet_length(encode(text))
           + octet_length(encode(source)) + 8)::BIGINT
FROM documents
"""
    return f"""
WITH t AS ({tables})
SELECT table_name, n_rows::BIGINT AS n_rows, est_bytes,
       greatest(1, ceil(est_bytes * 1.0 / {_ADVISOR_TARGET_BYTES}))::BIGINT
         AS rec_shuffle_partitions,
       est_bytes <= {_BROADCAST_LIMIT} AS broadcastable
FROM t
ORDER BY table_name
"""


@register(
    "q_partition_advisor",
    shape="bounded",
    tags=("layout", "planning", "tuning"),
    oracle=_advisor_oracle(),
)
def q_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle/broadcast sizing advisor: per table, row count, estimated
    in-memory bytes (fixed-width columns + actual string byte lengths),
    the recommended shuffle-partition count at a 128 MB target, and
    whether the table fits under the 10 MB autoBroadcastJoinThreshold —
    the two knobs the 100 TB posture section says to size from data, as
    a query instead of folklore.  One aggregate per table; the string
    octet lengths ride the same scan."""

    def table_stats(name: str, fixed: int, str_cols: list[str]) -> DataFrame:
        t = load_table(spark, sf_dir, name)
        size = F.lit(fixed)
        for c in str_cols:
            size = size + F.octet_length(F.encode(F.col(c), "UTF-8"))
        return t.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(size).alias("est_bytes"),
        )

    stats = (
        table_stats("events", 8 + 8 + 8 + 8, ["event_type", "props"])
        .unionByName(
            # 3 keys + linenumber(4) + 4 doubles + shipdate = 76 fixed bytes
            table_stats("lineitem", 76, ["l_returnflag", "l_linestatus"])
        )
        .unionByName(table_stats("documents", 8 + 8, ["text", "source"]))
    )
    return stats.select(
        "table_name",
        "n_rows",
        "est_bytes",
        F.greatest(
            F.lit(1),
            F.ceil(F.col("est_bytes") * 1.0 / _ADVISOR_TARGET_BYTES),
        )
        .cast("long")
        .alias("rec_shuffle_partitions"),
        (F.col("est_bytes") <= _BROADCAST_LIMIT).alias("broadcastable"),
    ).orderBy("table_name")


_NEYMAN_BUDGET = 1000


@register(
    "q_neyman_allocation",
    shape="bounded",
    tags=("sampling", "stats", "design"),
    oracle=f"""
WITH strata AS (
  SELECT event_type, count(*) AS n_h, stddev_pop(value) AS s_h
  FROM events GROUP BY event_type
), w AS (
  SELECT event_type, n_h, s_h,
         n_h * s_h / sum(n_h * s_h) OVER () AS share
  FROM strata
)
SELECT event_type,
       n_h::BIGINT AS stratum_size,
       {rnd_sql('s_h', 6)} AS stratum_stddev,
       {rnd_sql('share', 6)} AS neyman_share,
       least(floor({_NEYMAN_BUDGET} * share)::BIGINT, n_h) AS n_alloc,
       {rnd_sql(f'least(floor({_NEYMAN_BUDGET} * share), n_h) * 1.0 / n_h', 6)}
         AS sampling_rate
FROM w
ORDER BY event_type
""",
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified-sample allocation: a 1000-row budget
    split across event types proportionally to N_h·S_h (stratum size x
    stddev) — the allocation that minimizes the estimator variance,
    vs q_stratified_sample's equal-rate design.  floor + cap-at-stratum
    keeps allocations integral and feasible; the whole design is one
    aggregate + a window over |strata| rows."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    strata = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_h"), F.stddev_pop("value").alias("s_h")
    )
    share = (F.col("n_h") * F.col("s_h")) / F.sum(
        F.col("n_h") * F.col("s_h")
    ).over(W.partitionBy())
    w = strata.withColumn("share", share)
    n_alloc = F.least(
        F.floor(_NEYMAN_BUDGET * F.col("share")).cast("long"), F.col("n_h")
    )
    return w.select(
        "event_type",
        F.col("n_h").alias("stratum_size"),
        rnd(F.col("s_h"), 6).alias("stratum_stddev"),
        rnd(F.col("share"), 6).alias("neyman_share"),
        n_alloc.alias("n_alloc"),
        rnd(n_alloc * 1.0 / F.col("n_h"), 6).alias("sampling_rate"),
    ).orderBy("event_type")
