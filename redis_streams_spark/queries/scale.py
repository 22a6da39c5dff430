"""Scale-technique queries: the oracle for each salted operator is the
PLAIN (unsalted) SQL — proving the skew-safe plan computes identical
results."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.operators.skew import salted_groupby, salted_join
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q_salted_agg",
    shape="bounded",
    tags=("scale", "skew", "agg"),
    oracle="""
SELECT l_returnflag,
       round(5e-10 + sum(l_quantity), 2) AS sum_qty,
       count(*) AS cnt,
       round(5e-10 + max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (= maximally
    skewed) grouping key; oracle = the plain aggregation.  At 100 TB a
    3-value groupBy funnels everything into 3 reducers — the salt stage
    spreads each key over 8 sub-aggregations first."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_groupby(
        li,
        keys=["l_returnflag"],
        salt_source="l_orderkey",
        n_salt=8,
        partials={
            "raw_sum": (F.sum("l_quantity"), F.sum("raw_sum")),
            "cnt": (F.count(F.lit(1)), F.sum("cnt")),
            "raw_max": (F.max("l_extendedprice"), F.max("raw_max")),
        },
    )
    return (
        out.select(
            "l_returnflag",
            rnd("raw_sum", 2).alias("sum_qty"),
            "cnt",
            rnd("raw_max", 2).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_salted_join",
    shape="bounded",
    tags=("scale", "skew", "join"),
    bench=True,
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_lines,
       round(5e-10 + sum(l_extendedprice), 2) AS total
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (build side replicated 4×, probe rows routed by
    deterministic salt) aggregated after; oracle = the plain join.  This
    is the manual fallback for skew AQE can't fix (e.g. when the build
    side must broadcast-replicate)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(
        li,
        orders,
        probe_key="l_orderkey",
        build_key="o_orderkey",
        salt_source="l_linenumber",
        n_salt=4,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            rnd(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_heavy_hitters",
    shape="bounded",
    tags=("scale", "skew", "diagnostics"),
    oracle="""
WITH per_key AS (
  SELECT l_suppkey AS key, count(*) AS n
  FROM lineitem GROUP BY l_suppkey
), stats AS (
  SELECT key, n,
         sum(n) OVER () AS total,
         avg(n) OVER () AS mean_n
  FROM per_key
)
SELECT key, n,
       round(5e-10 + n * 1.0 / total, 6) AS share,
       round(5e-10 + n / mean_n, 4) AS skew_factor
FROM stats
ORDER BY n DESC, key
LIMIT 20
""",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter audit for a prospective join/agg key: top-20 keys by
    row count with corpus share and skew factor (count / mean count) —
    the diagnostic that decides WHICH keys need the salting treatment
    (`q_salted_agg`/`q_salted_join`) before a 100 TB shuffle.

    Scale shape: one partial-aggregated groupBy to key cardinality, then
    windows + top-k over the (small) per-key aggregate.  At extreme key
    cardinality the exact count can be swapped for a count-min sketch;
    the exact form is the auditable baseline."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_all = Window.partitionBy()
    return (
        per_key.select(
            "key",
            "n",
            rnd(F.col("n") * 1.0 / F.sum("n").over(w_all), 6).alias("share"),
            rnd(F.col("n") / F.avg("n").over(w_all), 4).alias("skew_factor"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(20)
    )


@register(
    "q_zorder_scan",
    shape="bounded",
    tags=("scale", "layout", "data-skipping"),
    oracle="""
WITH b AS (
  -- // = floor division (CAST would round half-even, diverging from
  -- Spark's truncating cast on *.6 boundaries)
  SELECT (max(user_id) * 3) // 10 AS ulo,
         (max(user_id) * 4) // 10 AS uhi,
         (max(event_id) * 1) // 10 AS elo,
         (max(event_id) * 3) // 10 AS ehi
  FROM events
)
SELECT event_type,
       count(*) AS n,
       round(5e-10 + sum(value), 2) AS total_value,
       min(event_id) AS min_event,
       max(event_id) AS max_event
FROM events, b
WHERE user_id BETWEEN b.ulo AND b.uhi AND event_id BETWEEN b.elo AND b.ehi
GROUP BY event_type
ORDER BY event_type
""",
)
def q_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout round trip: events are laid out as
    range-partitioned files ordered by the interleaved bits of
    (user_id, event_id), then a 2-D box predicate (data-relative: the
    30-40% user slice x the 10-30% event slice, so the box is non-empty
    at every SF) is answered from the z-ordered copy — value-identical
    to querying the source (the oracle reads the original table).  The
    LAYOUT is the point: every file gets a tight min/max range on BOTH
    columns, so parquet stats prune box predicates a single-column sort
    cannot skip on (`tests/test_zorder.py` measures candidate files for
    per-dimension boxes against a user_id-sorted baseline; at 100 TB
    this is the OPTIMIZE ZORDER BY technique, built from
    repartitionByRange + an arithmetic Morton expression).  Write-once
    cost: one range shuffle, the same class as any global sort."""
    import hashlib
    import os

    from redis_streams_spark.operators.zorder import write_zordered

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join("/tmp/spark-graft-zorder", f"{tag}-{os.getpid()}")
    # removed at interpreter exit so repeated processes don't leak /tmp
    import atexit
    import shutil

    atexit.register(shutil.rmtree, path, ignore_errors=True)
    write_zordered(ev, path, "user_id", "event_id", n_files=16)
    back = spark.read.parquet(path)
    bounds = ev.agg(
        (F.max("user_id") * 3 / 10).cast("long").alias("ulo"),
        (F.max("user_id") * 4 / 10).cast("long").alias("uhi"),
        (F.max("event_id") * 1 / 10).cast("long").alias("elo"),
        (F.max("event_id") * 3 / 10).cast("long").alias("ehi"),
    )
    return (
        back.crossJoin(F.broadcast(bounds))
        .where(
            F.col("user_id").between(F.col("ulo"), F.col("uhi"))
            & F.col("event_id").between(F.col("elo"), F.col("ehi"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("value"), 2).alias("total_value"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
        .orderBy("event_type")
    )
