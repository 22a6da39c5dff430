"""Round-7 business-analytics operators: revenue waterfall, 2-D
histogram, drawdown curve, and year-over-year decile migration.

Reference basis: none (redis-streams has no analytics surface); these
are the standard revenue-accounting / risk primitives, expressed with
the repo's scale discipline — equi-joins on composite keys, percentile
BOUNDARIES (tiny arrays) broadcast instead of global ntile sorts, and
global windows only above day-keyed aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.timeseries4 import _DAILY_SQL, _daily
from redis_streams_spark.session import load_table

_DAY_MS = 86_400_000


@register(
    "q_revenue_waterfall",
    shape="bounded",
    tags=("analytics", "revenue", "join"),
    oracle=f"""
WITH cm AS (
  SELECT o_custkey AS cust,
         year(o_orderdate) * 12 + month(o_orderdate) AS mk,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
), j AS (
  SELECT coalesce(c.mk, p.mk) AS mk,
         c.rev AS cur_rev, p.rev AS prev_rev
  FROM cm c FULL OUTER JOIN (SELECT cust, mk + 1 AS mk, rev FROM cm) p
    ON c.cust = p.cust AND c.mk = p.mk
)
SELECT printf('%04d-%02d', (mk - 1) // 12, mk - ((mk - 1) // 12) * 12)
         AS month,
       {rnd_sql('coalesce(sum(prev_rev), 0)', 2)} AS start_rev,
       {rnd_sql('coalesce(sum(CASE WHEN prev_rev IS NULL '
                'THEN cur_rev END), 0)', 2)} AS new_rev,
       {rnd_sql('coalesce(sum(CASE WHEN cur_rev > prev_rev '
                'THEN cur_rev - prev_rev END), 0)', 2)} AS expansion_rev,
       {rnd_sql('coalesce(sum(CASE WHEN cur_rev < prev_rev '
                'THEN prev_rev - cur_rev END), 0)', 2)} AS contraction_rev,
       {rnd_sql('coalesce(sum(CASE WHEN cur_rev IS NULL '
                'THEN prev_rev END), 0)', 2)} AS churned_rev,
       {rnd_sql('coalesce(sum(cur_rev), 0)', 2)} AS end_rev
FROM j GROUP BY mk ORDER BY mk
""",
)
def q_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue waterfall: each month's total decomposed
    into start (= prior-month total), new (customers with no prior-month
    revenue), expansion / contraction (customers present both months),
    and churned (prior-month customers gone) — the SaaS revenue-movement
    accounting identity start + new + expansion − contraction − churned
    = end.  The month AFTER the last data month appears as pure churn
    (everything ends), by construction.

    Scale shape: one (customer, month) aggregate, then a single
    full-outer EQUI-join of that frame to itself shifted one month —
    both sides shuffle on the same (cust, mk) key; the per-month rollup
    shuffles |months| rows."""
    o = load_table(spark, sf_dir, "orders")
    cm = o.groupBy(
        F.col("o_custkey").alias("cust"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mk"),
    ).agg(F.sum("o_totalprice").alias("rev"))
    cur = cm.select("cust", "mk", F.col("rev").alias("cur_rev"))
    prev = cm.select(
        "cust", (F.col("mk") + 1).alias("mk"), F.col("rev").alias("prev_rev")
    )
    j = cur.join(prev, ["cust", "mk"], "full_outer")
    yr = F.expr("(mk - 1) div 12")
    month = F.format_string("%04d-%02d", yr, F.col("mk") - yr * 12)
    zero = F.lit(0.0)
    return (
        j.groupBy("mk")
        .agg(
            rnd(F.coalesce(F.sum("prev_rev"), zero), 2).alias("start_rev"),
            rnd(
                F.coalesce(
                    F.sum(F.when(F.col("prev_rev").isNull(), F.col("cur_rev"))),
                    zero,
                ),
                2,
            ).alias("new_rev"),
            rnd(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("cur_rev") > F.col("prev_rev"),
                            F.col("cur_rev") - F.col("prev_rev"),
                        )
                    ),
                    zero,
                ),
                2,
            ).alias("expansion_rev"),
            rnd(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("cur_rev") < F.col("prev_rev"),
                            F.col("prev_rev") - F.col("cur_rev"),
                        )
                    ),
                    zero,
                ),
                2,
            ).alias("contraction_rev"),
            rnd(
                F.coalesce(
                    F.sum(F.when(F.col("cur_rev").isNull(), F.col("prev_rev"))),
                    zero,
                ),
                2,
            ).alias("churned_rev"),
            rnd(F.coalesce(F.sum("cur_rev"), zero), 2).alias("end_rev"),
        )
        .orderBy("mk")
        .select(
            month.alias("month"),
            "start_rev",
            "new_rev",
            "expansion_rev",
            "contraction_rev",
            "churned_rev",
            "end_rev",
        )
    )


@register(
    "q_histogram2d",
    shape="bounded",
    tags=("analytics", "histogram"),
    oracle=f"""
SELECT floor(l_extendedprice / 10000)::BIGINT AS price_bin,
       floor(l_quantity / 10)::BIGINT AS qty_bin,
       count(*)::BIGINT AS n,
       {rnd_sql('avg(l_discount)', 4)} AS avg_discount
FROM lineitem
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D binned histogram (price x quantity heatmap) over lineitem
    with per-cell mean discount — the density grid behind every
    scatter-density dashboard panel.

    Scale shape: a single groupBy on the two bin keys; the shuffle
    carries one row per occupied cell.  ``floor()`` on both engines
    (Spark's double->long CAST truncates toward zero while DuckDB's
    rounds — the cross-engine trap floor avoids)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / 10000).alias("price_bin"),
            F.floor(F.col("l_quantity") / 10).alias("qty_bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.avg("l_discount"), 4).alias("avg_discount"),
        )
        .orderBy("price_bin", "qty_bin")
    )


@register(
    "q_drawdown",
    shape="bounded",
    tags=("timeseries", "risk", "window"),
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
cum AS (
  SELECT day * {_DAY_MS} AS day_ms,
         sum(v) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rev
  FROM d
), c AS (
  SELECT day_ms, cum_rev,
         max(cum_rev) OVER (ORDER BY day_ms
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak_rev
  FROM cum
)
SELECT day_ms, {rnd_sql('cum_rev', 2)} AS cum_rev,
       {rnd_sql('peak_rev', 2)} AS peak_rev,
       {rnd_sql('(peak_rev - cum_rev) / peak_rev', 6)} AS drawdown_pct
FROM c ORDER BY day_ms
""",
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown curve of cumulative daily revenue: running total,
    running peak, and percent-below-peak per day — the risk metric
    ("how far below the high-water mark") finance monitoring tracks.

    Scale shape: both running windows sit above the day-keyed aggregate
    (≤ n_days rows); the accumulation order is identical on both engines
    (frame order), so the running sums agree bit-for-bit."""
    d = _daily(spark, sf_dir)
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = d.select(
        (F.col("day") * _DAY_MS).alias("day_ms"),
        F.sum("v").over(w).alias("cum"),
    ).select("day_ms", "cum", F.max("cum").over(
        W.orderBy("day_ms").rowsBetween(W.unboundedPreceding, W.currentRow)
    ).alias("peak"))
    return c.select(
        "day_ms",
        rnd(F.col("cum"), 2).alias("cum_rev"),
        rnd(F.col("peak"), 2).alias("peak_rev"),
        rnd((F.col("peak") - F.col("cum")) / F.col("peak"), 6).alias(
            "drawdown_pct"
        ),
    ).orderBy("day_ms")


@register(
    "q_quartile_migration",
    shape="bounded",
    tags=("analytics", "percentiles", "join"),
    oracle=f"""
WITH cy AS (
  SELECT o_custkey AS cust, year(o_orderdate) AS y, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
), b AS (
  SELECT y, quantile_cont(rev, [0.25, 0.5, 0.75]) AS bounds
  FROM cy GROUP BY y
), m AS (
  SELECT cy.cust, cy.y,
         1 + len(list_filter(b.bounds, x -> cy.rev > x)) AS q
  FROM cy JOIN b USING (y)
), p AS (
  SELECT a.q AS q_from, c.q AS q_to
  FROM m a JOIN m c ON a.cust = c.cust AND c.y = a.y + 1
), t AS (
  SELECT q_from, q_to, count(*)::BIGINT AS n_custs FROM p GROUP BY 1, 2
)
SELECT q_from, q_to, n_custs,
       {rnd_sql('n_custs::DOUBLE / sum(n_custs) OVER (PARTITION BY q_from)',
                6)} AS pct_of_from
FROM t ORDER BY q_from, q_to
""",
)
def q_quartile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue-quartile migration matrix year-over-year: which
    quartile each customer's annual revenue lands in, and the transition
    counts/shares between consecutive years — the loyalty-movement
    matrix behind "are top customers staying on top".

    Scale shape: the global-sort trap (ntile over all customers) is
    replaced by exact quartile BOUNDARIES — a 3-element percentile array
    per year (tiny aggregate), broadcast back and applied with an array
    filter, so assignment is a per-row expression after an equi-join on
    year.  The year-over-year pairing is a (cust, year) equi-join."""
    o = load_table(spark, sf_dir, "orders")
    cy = o.groupBy(
        F.col("o_custkey").alias("cust"), F.year("o_orderdate").alias("y")
    ).agg(F.sum("o_totalprice").alias("rev"))
    b = cy.groupBy("y").agg(
        F.expr("percentile(rev, array(0.25, 0.5, 0.75))").alias("bounds")
    )
    m = cy.join(F.broadcast(b), "y").select(
        "cust",
        "y",
        (
            1 + F.size(F.filter("bounds", lambda x: F.col("rev") > x))
        ).cast("long").alias("q"),
    )
    a = m.select("cust", "y", F.col("q").alias("q_from"))
    c = m.select("cust", (F.col("y") - 1).alias("y"), F.col("q").alias("q_to"))
    t = (
        a.join(c, ["cust", "y"])
        .groupBy("q_from", "q_to")
        .agg(F.count(F.lit(1)).alias("n_custs"))
    )
    wq = W.partitionBy("q_from")
    return t.select(
        "q_from",
        "q_to",
        "n_custs",
        rnd(F.col("n_custs").cast("double") / F.sum("n_custs").over(wq), 6).alias(
            "pct_of_from"
        ),
    ).orderBy("q_from", "q_to")


@register(
    "q_hhi_concentration",
    shape="bounded",
    tags=("analytics", "concentration"),
    oracle=f"""
WITH cm AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_custkey AS cust,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT month, count(*)::BIGINT AS n_custs,
       {rnd_sql('sum(rev)', 2)} AS total_rev,
       {rnd_sql('sum(rev * rev) / (sum(rev) * sum(rev))', 6)} AS hhi,
       {rnd_sql('''CASE WHEN count(*) > 1
            THEN (sum(rev * rev) / (sum(rev) * sum(rev)) - 1.0 / count(*))
                 / (1 - 1.0 / count(*))
            ELSE 1.0 END''', 6)} AS hhi_normalized
FROM cm GROUP BY month ORDER BY month
""",
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue-concentration index per month:
    sum of squared customer revenue shares (and its 0-1 normalized
    form) — the "is this month's revenue dangerously concentrated in a
    few accounts" risk monitor.

    Scale shape: identity sum(share^2) = sum(rev^2)/sum(rev)^2 turns the
    per-customer-share window into two plain sums — one (month, cust)
    aggregate, one per-month rollup, zero windows."""
    o = load_table(spark, sf_dir, "orders")
    cm = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_custkey").alias("cust"),
    ).agg(F.sum("o_totalprice").alias("rev"))
    hhi = F.sum(F.col("rev") * F.col("rev")) / (F.sum("rev") * F.sum("rev"))
    n = F.count(F.lit(1))
    return (
        cm.groupBy("month")
        .agg(
            n.alias("n_custs"),
            rnd(F.sum("rev"), 2).alias("total_rev"),
            rnd(hhi, 6).alias("hhi"),
            rnd(
                F.when(
                    n > 1,
                    (hhi - 1.0 / n) / (1 - 1.0 / n),
                ).otherwise(F.lit(1.0)),
                6,
            ).alias("hhi_normalized"),
        )
        .orderBy("month")
    )


@register(
    "q_var_cvar",
    shape="bounded",
    tags=("timeseries", "risk"),
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
v AS (SELECT quantile_cont(v, 0.05) AS var_5 FROM d)
SELECT (SELECT count(*) FROM d)::BIGINT AS n_days,
       {rnd_sql('min(v.var_5)', 2)} AS var_5,
       {rnd_sql('avg(CASE WHEN d.v <= v.var_5 THEN d.v END)', 2)} AS cvar_5,
       sum(CASE WHEN d.v <= v.var_5 THEN 1 ELSE 0 END)::BIGINT AS n_tail_days
FROM d CROSS JOIN v
""",
)
def q_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk / Conditional VaR of daily revenue at the 5% level:
    the revenue floor breached only 1 day in 20, and the mean revenue of
    those worst days (expected shortfall) — the tail-risk pair that
    complements q_drawdown's path view.

    Scale shape: one day-keyed aggregate; the 5th percentile is a 1-row
    broadcast back onto the ≤ n_days frame."""
    d = _daily(spark, sf_dir)
    v = d.agg(F.expr("percentile(v, 0.05)").alias("var_5"))
    j = d.crossJoin(F.broadcast(v))
    return j.agg(
        F.count(F.lit(1)).alias("n_days"),
        rnd(F.min("var_5"), 2).alias("var_5"),
        rnd(F.avg(F.when(F.col("v") <= F.col("var_5"), F.col("v"))), 2).alias(
            "cvar_5"
        ),
        F.sum(F.when(F.col("v") <= F.col("var_5"), 1).otherwise(0))
        .cast("long")
        .alias("n_tail_days"),
    )
