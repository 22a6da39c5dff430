"""Round-6 third wave, engine-surface side: cumulative-distribution
windows, the string/regexp function galleries, and banded dimension
joins.

Reference basis: none (redis-streams has no relational surface).  The
galleries pin the Spark↔DuckDB common subset the engine guarantees:
every expression verified value-identical by the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q_cume_dist",
    shape="bounded",
    tags=("window", "distribution"),
    oracle=f"""
SELECT o_custkey, o_orderkey,
       {rnd_sql('o_totalprice', 2)} AS price,
       {rnd_sql('cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice)', 6)}
         AS price_cume,
       count(*) OVER (PARTITION BY o_custkey) AS n_orders
FROM orders
QUALIFY n_orders >= 8
ORDER BY o_custkey, o_orderkey
""",
)
def q_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist within each customer's order history (customers with 8+
    orders): where each order sits in that customer's own price
    distribution — the personalized-percentile primitive.

    Scale shape: the window partitions on o_custkey (high-cardinality,
    parallel in the key); the QUALIFY-style filter rides the same
    window, no second pass."""
    orders = load_table(spark, sf_dir, "orders")
    wp = W.partitionBy("o_custkey")
    w = wp.orderBy("o_totalprice")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            rnd("o_totalprice", 2).alias("price"),
            rnd(F.cume_dist().over(w), 6).alias("price_cume"),
            F.count(F.lit(1)).over(wp).alias("n_orders"),
        )
        .where(F.col("n_orders") >= 8)
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_string_funcs2",
    shape="bounded",
    tags=("scalar", "strings"),
    oracle="""
SELECT c_custkey,
       translate(c_name, '#', '-') AS dashed,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       split_part(c_name, '#', 2) AS name_suffix,
       reverse(left(c_name, 8)) AS rev_prefix,
       repeat(right(CAST(c_nationkey AS VARCHAR), 1), 3) AS tag,
       ascii(left(c_name, 1)) AS first_byte,
       chr(65 + (c_nationkey % 26)::INT) AS nation_letter
FROM customer
WHERE c_custkey <= 100
ORDER BY c_custkey
""",
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function gallery: translate, pad, split_part,
    reverse, left/right, repeat, ascii/chr — the cross-engine-stable
    subset beyond the first scalar gallery.  Pure scan-stage
    expressions."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.translate("c_name", "#", "-").alias("dashed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.expr("split_part(c_name, '#', 2)").alias("name_suffix"),
        F.reverse(F.expr("left(c_name, 8)")).alias("rev_prefix"),
        F.repeat(F.expr("right(cast(c_nationkey as string), 1)"), 3).alias("tag"),
        F.ascii(F.expr("left(c_name, 1)")).alias("first_byte"),
        F.expr("char(65 + cast(c_nationkey % 26 as int))").alias(
            "nation_letter"
        ),
    ).orderBy("c_custkey")


@register(
    "q_regexp_gallery",
    shape="bounded",
    tags=("scalar", "regexp"),
    oracle=f"""
SELECT event_type, count(*) AS n,
       sum(len(regexp_extract_all(props, '[0-9]')))::BIGINT AS total_digits,
       count(*) FILTER (regexp_matches(props, '"k": [0-9]{{2}}}}')) AS two_digit_k,
       min(regexp_extract(props, '([0-9]+)', 1)) AS min_k_str,
       {rnd_sql("avg(length(regexp_replace(props, '[0-9]', '', 'g')))", 4)} AS avg_nondigit_len
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_regexp_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp-function gallery over the JSON-ish props column:
    regexp_count, boolean match, group extraction, global replace — all
    in the RE2 ∩ Java common subset so both engines compute identical
    values.  Scan-stage expressions + one aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("regexp_count(props, '[0-9]')")).alias("total_digits"),
            F.expr(
                """count_if(props rlike '"k": [0-9]{2}\\\\}')"""
            ).alias("two_digit_k"),
            F.min(F.regexp_extract("props", "([0-9]+)", 1)).alias("min_k_str"),
            rnd(
                F.avg(F.length(F.regexp_replace("props", "[0-9]", ""))), 4
            ).alias("avg_nondigit_len"),
        )
        .orderBy("event_type")
    )


# value bands: a broadcast literal dimension the fact scans join against
_BANDS = [
    ("micro", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("medium", 50.0, 90.0),
    ("large", 90.0, 1e18),
]
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@register(
    "q_band_join",
    shape="bounded",
    tags=("join", "banded"),
    oracle=f"""
WITH bands(band, lo, hi) AS (VALUES {_BANDS_SQL})
SELECT b.band, count(*) AS n,
       {rnd_sql('sum(e.value)', 2)} AS total_value,
       {rnd_sql('avg(e.value)', 4)} AS avg_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band ORDER BY b.band
""",
)
def q_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded dimension join: each event lands in its value band
    ([lo, hi) ranges from a literal dimension) — the rate-card /
    tiered-pricing join pattern.

    Scale shape: the band table is a broadcast literal, so the range
    join is a nested-loop against 4 rows evaluated map-side in the fact
    scan — never a shuffle of the fact table.  (With thousands of
    bands the scalable form is a bucketized equi-join on a
    band-id = floor(value/width) prefix; 4 rows does not need it.)"""
    ev = load_table(spark, sf_dir, "events")
    bands = ev.sparkSession.createDataFrame(
        _BANDS, "band STRING, lo DOUBLE, hi DOUBLE"
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("value"), 2).alias("total_value"),
            rnd(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("band")
    )
