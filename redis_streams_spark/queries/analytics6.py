"""Round-6 second wave: engine-surface galleries (bitwise, conditional
aggregation, try-semantics), data-quality audits (Benford, IQR fences,
ingest-coverage islands, join-fanout), and growth analytics (decile
lift, audience overlap, new-vs-returning).

Reference basis: none (redis-streams has no relational surface).
Everything aggregates before it analyzes; the only unpartitioned
windows run over digit/decile-bounded aggregates.
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


@register(
    "q_bitwise_gallery",
    shape="bounded",
    tags=("scalar", "bitwise"),
    oracle="""
SELECT event_type, count(*) AS n,
       sum(bit_count(event_id))::BIGINT AS popcount_total,
       bit_and(event_id & 255)::BIGINT AS and_low8,
       bit_or(event_id & 255)::BIGINT AS or_low8,
       bit_xor(event_id)::BIGINT AS xor_all,
       min(event_id << 1)::BIGINT AS min_shl1,
       max(event_id >> 2)::BIGINT AS max_shr2
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_bitwise_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression + aggregate surface: popcount, AND/OR/XOR
    aggregates, shifts, masks — the primitives behind bitmap filters,
    feature flags, and checksum folding.  Pure scan-stage expressions
    plus one partial-aggregated shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.bit_count("event_id")).alias("popcount_total"),
            F.expr("bit_and(event_id & 255)").alias("and_low8"),
            F.expr("bit_or(event_id & 255)").alias("or_low8"),
            F.expr("bit_xor(event_id)").alias("xor_all"),
            F.min(F.expr("shiftleft(event_id, 1)")).alias("min_shl1"),
            F.max(F.expr("shiftright(event_id, 2)")).alias("max_shr2"),
        )
        .orderBy("event_type")
    )


@register(
    "q_conditional_agg",
    shape="bounded",
    tags=("agg", "conditional"),
    oracle=f"""
SELECT o_orderpriority, count(*) AS n,
       count(*) FILTER (o_totalprice > 100000) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_totalprice > 400000) AS any_jumbo,
       {rnd_sql('coalesce(sum(o_totalprice) FILTER (o_totalprice < 50000), 0.0)', 2)} AS small_order_value,
       {rnd_sql("avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)", 4)} AS avg_finished_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation gallery: count_if, bool_and/bool_or
    (SQL every/any), FILTER-style conditional sums, and NULL-skipping
    conditional averages — one pass, no self-joins.  All map-side
    partial-aggregated."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("count_if(o_totalprice > 100000)").alias("n_big"),
            F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
            F.expr("bool_or(o_totalprice > 400000)").alias("any_jumbo"),
            rnd(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("o_totalprice") < 50000, F.col("o_totalprice")
                        )
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("small_order_value"),
            rnd(
                F.avg(
                    F.when(
                        F.col("o_orderstatus") == "F", F.col("o_totalprice")
                    )
                ),
                4,
            ).alias("avg_finished_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_try_semantics",
    shape="bounded",
    tags=("scalar", "error-handling", "null-semantics"),
    oracle=f"""
SELECT event_type, count(*) AS n,
       count(*) FILTER (floor(value)::BIGINT % 7 = 0) AS n_div_by_zero,
       {rnd_sql('avg(value / NULLIF(floor(value)::BIGINT % 7, 0))', 4)} AS avg_safe_div,
       count(TRY_CAST(event_type AS DOUBLE)) AS n_numeric_names,
       {rnd_sql("avg(TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT))", 4)} AS avg_prop_k
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_try_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant expression semantics: try_divide NULLs on /0
    instead of failing the job, try_cast NULLs on malformed input, and
    NULL-skipping aggregates absorb both — the contract that keeps a
    100 TB batch alive through dirty rows.  The oracle states the same
    semantics via NULLIF / TRY_CAST."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("count_if(cast(floor(value) as bigint) % 7 = 0)").alias(
                "n_div_by_zero"
            ),
            rnd(
                F.avg(F.expr("try_divide(value, cast(floor(value) as bigint) % 7)")),
                4,
            ).alias("avg_safe_div"),
            F.count(F.expr("try_cast(event_type as double)")).alias(
                "n_numeric_names"
            ),
            rnd(
                F.avg(
                    F.expr(
                        "try_cast(regexp_extract(props, '[0-9]+', 0) as bigint)"
                    )
                ),
                4,
            ).alias("avg_prop_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_ingest_gap_islands",
    shape="bounded",
    tags=("data-quality", "islands"),
    oracle=f"""
WITH days AS (
  SELECT DISTINCT event_type, epoch_ms(ts) // {_DAY_MS} AS day FROM events
), grp AS (
  SELECT event_type, day,
         day - row_number() OVER (PARTITION BY event_type ORDER BY day) AS g
  FROM days
)
SELECT event_type,
       (min(day) * {_DAY_MS})::BIGINT AS range_start_ms,
       (max(day) * {_DAY_MS})::BIGINT AS range_end_ms,
       count(*) AS n_days
FROM grp GROUP BY event_type, g
ORDER BY event_type, range_start_ms
""",
)
def q_ingest_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-coverage audit: contiguous day ranges with activity per
    event type (gaps-and-islands over distinct active days) — a break
    between islands is a day the pipeline delivered nothing, the first
    thing an on-call checks after a backfill.

    Scale shape: the window ranks DISTINCT (type, day) rows — an
    aggregate bounded by types × calendar days, not the event count."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "event_type", (F.expr(_MS) / _DAY_MS).cast("long").alias("day")
    ).distinct()
    w = W.partitionBy("event_type").orderBy("day")
    grp = days.withColumn("g", F.col("day") - F.row_number().over(w))
    return (
        grp.groupBy("event_type", "g")
        .agg(
            (F.min("day") * _DAY_MS).alias("range_start_ms"),
            (F.max("day") * _DAY_MS).alias("range_end_ms"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("g")
        .orderBy("event_type", "range_start_ms")
    )


@register(
    "q_benford",
    shape="bounded",
    tags=("data-quality", "statistics"),
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS d
  FROM orders WHERE o_totalprice >= 1
), c AS (
  SELECT d, count(*) AS n FROM digits GROUP BY d
), t AS (
  SELECT d, n, sum(n) OVER () AS total FROM c
)
SELECT d AS digit, n,
       {rnd_sql('n * 1.0 / total', 6)} AS observed_p,
       {rnd_sql('log10(1.0 + 1.0 / d)', 6)} AS benford_p,
       {rnd_sql('total * pow(n * 1.0 / total - log10(1.0 + 1.0 / d), 2) / log10(1.0 + 1.0 / d)', 6)}
         AS chi2_term
FROM t ORDER BY digit
""",
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals: observed vs
    expected digit frequencies with per-digit chi-square terms — the
    classic fabricated-data detector.

    Scale shape: one digit extraction in the scan, a 9-row aggregate,
    and a share window over those 9 rows."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    c = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    t = c.withColumn("total", F.sum("n").over(W.partitionBy()))
    obs = F.col("n") * 1.0 / F.col("total")
    exp = F.log10(1.0 + 1.0 / F.col("d"))
    return t.select(
        F.col("d").alias("digit"),
        "n",
        rnd(obs, 6).alias("observed_p"),
        rnd(exp, 6).alias("benford_p"),
        rnd(F.col("total") * F.pow(obs - exp, 2) / exp, 6).alias("chi2_term"),
    ).orderBy("digit")


@register(
    "q_iqr_outliers",
    shape="bounded",
    tags=("data-quality", "outliers", "percentiles"),
    oracle=f"""
WITH fences AS (
  SELECT o_orderpriority,
         percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1,
         percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       {rnd_sql('f.q1', 2)} AS q1, {rnd_sql('f.q3', 2)} AS q3,
       {rnd_sql('f.q1 - 1.5 * (f.q3 - f.q1)', 2)} AS lo_fence,
       {rnd_sql('f.q3 + 1.5 * (f.q3 - f.q1)', 2)} AS hi_fence,
       count(*) AS n,
       count(*) FILTER (o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1)
                     OR o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)) AS n_outliers
FROM orders o JOIN fences f USING (o_orderpriority)
GROUP BY o.o_orderpriority, f.q1, f.q3
ORDER BY o.o_orderpriority
""",
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR-fence outlier counts per order priority (1.5×IQR beyond
    the exact quartiles) — the robust outlier gate that precedes
    z-scores when distributions are skewed.

    Scale shape: one exact-percentile aggregate to |priorities| rows,
    broadcast back onto the scan for the fence test, one counting
    aggregate — two passes, no sort."""
    orders = load_table(spark, sf_dir, "orders")
    fences = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    j = orders.join(F.broadcast(fences), "o_orderpriority")
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    return (
        j.groupBy("o_orderpriority", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "count_if(o_totalprice < q1 - 1.5 * (q3 - q1) "
                "OR o_totalprice > q3 + 1.5 * (q3 - q1))"
            ).alias("n_outliers"),
        )
        .select(
            "o_orderpriority",
            rnd("q1", 2).alias("q1"),
            rnd("q3", 2).alias("q3"),
            rnd(lo, 2).alias("lo_fence"),
            rnd(hi, 2).alias("hi_fence"),
            "n",
            "n_outliers",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_join_fanout_audit",
    shape="bounded",
    tags=("data-quality", "skew", "join"),
    oracle=f"""
WITH k AS (
  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT sum(n * n) * 1.0 AS total_pairs FROM k
)
SELECT l_partkey, n, (n * n)::BIGINT AS est_self_join_rows,
       {rnd_sql('n * n / tot.total_pairs * 100.0', 6)} AS pct_of_join
FROM k CROSS JOIN tot
ORDER BY n DESC, l_partkey
LIMIT 20
""",
)
def q_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join fanout audit: the 20 join keys contributing the most
    rows to a hypothetical lineitem⋈lineitem-on-partkey — run BEFORE a
    fanning join to know whether it explodes and which keys need
    salting (the planning companion to q_salted_join/q_heavy_hitters).

    Scale shape: one key-count aggregate, a 1-row total as a broadcast
    scalar, and a global top-20 TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    tot = k.agg((F.sum(F.col("n") * F.col("n")) * 1.0).alias("total_pairs"))
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "n",
            (F.col("n") * F.col("n")).cast("long").alias("est_self_join_rows"),
            rnd(
                F.col("n") * F.col("n") / F.col("total_pairs") * 100.0, 6
            ).alias("pct_of_join"),
        )
        .orderBy(F.desc("n"), "l_partkey")
        .limit(20)
    )


@register(
    "q_decile_lift",
    shape="bounded",
    tags=("analytics", "lift", "percentiles"),
    oracle=f"""
WITH u AS (
  SELECT user_id, sum(value) AS total FROM events GROUP BY user_id
), b AS (
  SELECT quantile_cont(total, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bounds
  FROM u
), d AS (
  SELECT u.user_id, u.total,
         1 + len(list_filter(b.bounds, x -> x < u.total)) AS decile
  FROM u CROSS JOIN b
), agg AS (
  SELECT decile, count(*) AS n_users, sum(total) AS v FROM d GROUP BY decile
)
SELECT decile, n_users, {rnd_sql('v', 2)} AS total_value,
       {rnd_sql('v / sum(v) OVER () * 100.0', 4)} AS share_pct
FROM agg ORDER BY decile
""",
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table: users bucketed by total value into exact
    deciles, with each decile's share of all value — the
    model-evaluation / whale-analysis staple.

    Scale shape: NTILE over per-user totals would be a single-task
    global sort at 100 TB; instead the nine decile BOUNDARIES come from
    one exact-percentile aggregate (a 1-row broadcast), each user
    buckets by comparison against that array, and the share window runs
    over the 10-row decile aggregate."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.sum("value").alias("total"))
    b = u.agg(
        F.expr(
            "percentile(total, array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))"
        ).alias("bounds")
    )
    d = u.crossJoin(F.broadcast(b)).select(
        "total",
        (
            1 + F.size(F.filter("bounds", lambda x: x < F.col("total")))
        ).alias("decile"),
    )
    agg = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("total").alias("v")
    )
    return agg.select(
        "decile",
        "n_users",
        rnd("v", 2).alias("total_value"),
        rnd(F.col("v") / F.sum("v").over(W.partitionBy()) * 100.0, 4).alias(
            "share_pct"
        ),
    ).orderBy("decile")


@register(
    "q_audience_overlap",
    shape="bounded",
    tags=("analytics", "set-overlap"),
    oracle=f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), sizes AS (
  SELECT event_type, count(*) AS sz FROM ut GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, i.n_both,
       (sa.sz + sb.sz - i.n_both)::BIGINT AS n_either,
       {rnd_sql('i.n_both * 1.0 / (sa.sz + sb.sz - i.n_both)', 6)} AS jaccard
FROM inter i JOIN sizes sa ON sa.event_type = i.type_a
             JOIN sizes sb ON sb.event_type = i.type_b
ORDER BY i.type_a, i.type_b
""",
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, how many
    users do both, and the Jaccard of the two audiences — the
    cross-feature adoption signal.

    Scale shape: dedup to (user, type) first, so the self-join on
    user_id fans out at most |types| per user (bounded constant), then
    pair-keyed counting; the |types|-row size table broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("sz").alias("szb"))
    either = F.col("sza") + F.col("szb") - F.col("n_both")
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            either.cast("long").alias("n_either"),
            rnd(F.col("n_both") * 1.0 / either, 6).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q_new_vs_returning",
    shape="bounded",
    tags=("analytics", "growth"),
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) // {_DAY_MS} AS day FROM events
), first_day AS (
  SELECT user_id, min(day) AS fd FROM e GROUP BY user_id
), daily AS (
  SELECT e.day, e.user_id, f.fd
  FROM (SELECT DISTINCT day, user_id FROM e) e
  JOIN first_day f USING (user_id)
)
SELECT (day * {_DAY_MS})::BIGINT AS day_ms,
       count(*) AS n_active,
       count(*) FILTER (fd = day) AS n_new,
       count(*) FILTER (fd < day) AS n_returning
FROM daily GROUP BY day ORDER BY day_ms
""",
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active users: a user is "new" only on
    their first-ever active day — the growth-accounting split every
    activation dashboard leads with.

    Scale shape: distinct (day, user) dedup, a per-user min-day
    aggregate joined back on user_id, then one day-keyed count — all
    equi-joins on the user key."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", (F.expr(_MS) / _DAY_MS).cast("long").alias("day"))
    first_day = e.groupBy("user_id").agg(F.min("day").alias("fd"))
    daily = e.distinct().join(first_day, "user_id")
    return (
        daily.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.expr("count_if(fd = day)").alias("n_new"),
            F.expr("count_if(fd < day)").alias("n_returning"),
        )
        .select(
            (F.col("day") * _DAY_MS).alias("day_ms"),
            "n_active",
            "n_new",
            "n_returning",
        )
        .orderBy("day_ms")
    )
