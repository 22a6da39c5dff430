"""Round-8 relational wave: bag-semantics set operations, the native
``session_window`` carrier, and a storage-encoding audit.

Each query pairs a Spark DataFrame plan with a value-identical DuckDB
oracle (driver-hash-compared).  Reference basis: none — the reference
(KissPeter/redis-streams) delegates all processing to user callbacks;
these are engine-surface extensions per SURVEY §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_GAP_MS = 30 * 60 * 1000


@register(
    "q_intersect_except_all",
    shape="per_row",
    tags=("setops", "bag-semantics"),
    oracle="""
WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
i AS (
  SELECT o_custkey, count(*)::BIGINT AS n
  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
  GROUP BY o_custkey
),
e AS (
  SELECT o_custkey, count(*)::BIGINT AS n
  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
  GROUP BY o_custkey
)
SELECT coalesce(i.o_custkey, e.o_custkey) AS custkey,
       coalesce(i.n, 0) AS n_intersect_all,
       coalesce(e.n, 0) AS n_except_all
FROM i FULL OUTER JOIN e ON e.o_custkey = i.o_custkey
ORDER BY custkey
""",
)
def q_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations (``intersectAll`` / ``exceptAll``):
    multiplicities are min(cnt_a, cnt_b) and cnt_a - cnt_b respectively —
    the multiset algebra DISTINCT set ops (q_setops_customers) cannot
    express.  Spark compiles both to an aggregate-count + generate plan
    (one shuffle each, no join explosion); output re-aggregated per key
    so the compare is order-free."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.where(F.col("o_totalprice") > 150000).select("o_custkey")
    i = (
        a.intersectAll(b)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_intersect_all"))
    )
    e = (
        a.exceptAll(b)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_except_all"))
    )
    return (
        i.join(e, "o_custkey", "full_outer")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
            F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
        )
    )


@register(
    "q_session_window_fn",
    shape="per_row",
    tags=("event-time", "session", "builtin"),
    oracle=f"""
WITH marked AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {_GAP_MS}
              OR lag(epoch_ms(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ms, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ms, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ms) AS sess_start_ms,
       count(*) AS n_events,
       round(5e-10 + sum(value), 2) AS total_value
FROM sess GROUP BY user_id, sid
ORDER BY user_id, sess_start_ms
""",
)
def q_session_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` function —
    the built-in gap-merging carrier (one aggregate, window merge inside
    the agg operator) vs q_sessionize's lag+cumsum formulation.  Same
    30-minute gap, per-session output rows; the oracle is the classic
    sessionize rewrite, proving the two formulations agree value-for-
    value.  ``session_window.start`` equals the session's first event
    time, which the oracle mirrors as min(ms)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "tstamp", F.col("ts").cast("timestamp")
    )
    return (
        ev.groupBy(F.session_window("tstamp", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("sess_start_ms"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_encoding_audit",
    shape="bounded",
    tags=("layout", "profile", "storage"),
    oracle=f"""
WITH ordered AS (
  SELECT epoch_ms(ts) // 86400000 AS day, event_type, user_id,
         row_number() OVER (PARTITION BY epoch_ms(ts) // 86400000
                            ORDER BY ts, event_id) AS rn,
         lag(event_type) OVER (PARTITION BY epoch_ms(ts) // 86400000
                               ORDER BY ts, event_id) AS prev_type,
         lag(user_id) OVER (PARTITION BY epoch_ms(ts) // 86400000
                            ORDER BY ts, event_id) AS prev_user
  FROM events
), per_col AS (
  SELECT 'event_type' AS col_name,
         count(*) AS n_rows,
         count(DISTINCT event_type)::BIGINT AS n_distinct,
         sum(CASE WHEN prev_type IS NULL OR event_type <> prev_type
                  THEN 1 ELSE 0 END)::BIGINT AS n_runs
  FROM ordered
  UNION ALL
  SELECT 'user_id',
         count(*),
         count(DISTINCT user_id)::BIGINT,
         sum(CASE WHEN prev_user IS NULL OR user_id <> prev_user
                  THEN 1 ELSE 0 END)::BIGINT
  FROM ordered
)
SELECT col_name, n_rows, n_distinct, n_runs,
       round(5e-10 + n_rows * 1.0 / n_runs, 4) AS avg_run_len,
       round(5e-10 + n_distinct * 1.0 / n_rows, 6) AS distinct_ratio
FROM per_col
ORDER BY col_name
""",
)
def q_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-encoding audit: per column, the run count in (day-
    partitioned) event-time order and the distinct ratio — the two
    numbers that decide RLE vs dictionary vs plain encoding when laying
    out parquet (low distinct_ratio → dictionary; long avg_run_len after
    the natural sort → RLE wins).  Runs are counted within day
    partitions so the window distributes (no global sort); day
    boundaries each start a new run on both engines by construction."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / F.lit(86400000)).cast("long")
    w = W.partitionBy("day").orderBy("ts", "event_id")
    ordered = ev.select(
        day.alias("day"), "event_type", "user_id", "ts", "event_id"
    ).select(
        "day",
        "event_type",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("user_id").over(w).alias("prev_user"),
    )

    def audit(col: str, prev: str) -> DataFrame:
        return ordered.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(col).alias("n_distinct"),
            F.sum(
                F.when(
                    F.col(prev).isNull() | (F.col(col) != F.col(prev)), 1
                ).otherwise(0)
            ).alias("n_runs"),
        )

    per_col = audit("event_type", "prev_type").unionByName(
        audit("user_id", "prev_user")
    )
    return per_col.select(
        "col_name",
        "n_rows",
        "n_distinct",
        "n_runs",
        rnd(F.col("n_rows") * 1.0 / F.col("n_runs"), 4).alias("avg_run_len"),
        rnd(F.col("n_distinct") * 1.0 / F.col("n_rows"), 6).alias(
            "distinct_ratio"
        ),
    ).orderBy("col_name")
