"""Association analytics: market-basket co-occurrence rules and mutual
information between categorical columns (SURVEY §2.2 extension; the
reference has no analytics surface — payloads pass through opaque,
`/root/reference/redis_streams/consumer.py`).

Both operators share the shape that makes them 100 TB-safe: the heavy
work is keyed equi-joins / aggregations on natural distribution keys
(order key, category pair), and every per-category total is a TINY
aggregate (|brands|, |lang×source| rows) that broadcasts or windows
over the aggregate, never over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MIN_CO = 50

_BASKET_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
), n AS (
  SELECT count(DISTINCT ok)::DOUBLE AS n FROM baskets
), cnt AS (
  SELECT b, count(*)::DOUBLE AS c FROM baskets GROUP BY b
), pairs AS (
  SELECT a.b AS brand_a, bb.b AS brand_b, count(*)::DOUBLE AS co
  FROM baskets a JOIN baskets bb ON a.ok = bb.ok AND a.b < bb.b
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, co::BIGINT AS n_co,
       round(5e-10 + co / n.n, 6) AS support,
       round(5e-10 + co / ca.c, 6) AS conf_a_b,
       round(5e-10 + co / cb.c, 6) AS conf_b_a,
       round(5e-10 + co * n.n / (ca.c * cb.c), 6) AS lift
FROM pairs
JOIN cnt ca ON ca.b = pairs.brand_a
JOIN cnt cb ON cb.b = pairs.brand_b
CROSS JOIN n
WHERE co >= {_MIN_CO}
ORDER BY brand_a, brand_b
"""


@register("q_basket_rules", shape="bounded", tags=("assoc", "basket"), oracle=_BASKET_ORACLE)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over brand pairs co-occurring in
    an order: support, both conditional confidences, and lift — the
    frequent-itemset/association-rule primitive at pair (2-itemset)
    depth.

    Scale shape: baskets (distinct order→brand) shuffle once on the
    order key; the pair self-join reuses that key so Σ_o C(brands(o), 2)
    bounds the work — per-basket width, not |brands|².  Brand totals
    (|brands| rows) broadcast; the corpus total is a 1-row broadcast
    scalar (the cheap BroadcastNestedLoopJoin).

    Reference basis: none."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    n = baskets.agg(F.countDistinct("ok").cast("double").alias("n"))
    cnt = baskets.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("c"))
    a = baskets.select("ok", F.col("b").alias("brand_a"))
    bb = baskets.select("ok", F.col("b").alias("brand_b"))
    pairs = (
        a.join(bb, "ok")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("double").alias("co"))
        .where(F.col("co") >= _MIN_CO)
    )
    ca = cnt.select(F.col("b").alias("brand_a"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("b").alias("brand_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("co").cast("long").alias("n_co"),
            rnd(F.col("co") / F.col("n"), 6).alias("support"),
            rnd(F.col("co") / F.col("ca"), 6).alias("conf_a_b"),
            rnd(F.col("co") / F.col("cb"), 6).alias("conf_b_a"),
            rnd(F.col("co") * F.col("n") / (F.col("ca") * F.col("cb")), 6).alias(
                "lift"
            ),
        )
        .orderBy("brand_a", "brand_b")
    )


_MI_ORACLE = """
WITH c AS (
  SELECT lang, source, count(*)::DOUBLE AS n FROM documents GROUP BY 1, 2
), t AS (
  SELECT lang, source, n,
         sum(n) OVER () AS tot,
         sum(n) OVER (PARTITION BY lang) AS nl,
         sum(n) OVER (PARTITION BY source) AS ns
  FROM c
)
SELECT lang, source, n::BIGINT AS n_docs,
       round(5e-10 + log2((n * tot) / (nl * ns)), 6) AS pmi,
       round(5e-10 + (n / tot) * log2((n * tot) / (nl * ns)), 6) AS mi_contrib
FROM t
ORDER BY lang, source
"""


@register("q_mutual_info", shape="bounded", tags=("assoc", "mi"), oracle=_MI_ORACLE)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between document language and
    source, plus each cell's contribution to the total mutual
    information — the standard dataset-audit check for unwanted
    correlation between two categorical features (e.g. "is my German
    data all from one crawl?").

    Scale shape: ONE map-side-combined aggregation over the data; the
    marginals are windows over the |lang|×|source| AGGREGATE (tens of
    rows), so the unpartitioned window never sees row-level data.

    Reference basis: none."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    t = c.select(
        "lang",
        "source",
        "n",
        F.sum("n").over(W.partitionBy()).alias("tot"),
        F.sum("n").over(W.partitionBy("lang")).alias("nl"),
        F.sum("n").over(W.partitionBy("source")).alias("ns"),
    )
    ratio = (F.col("n") * F.col("tot")) / (F.col("nl") * F.col("ns"))
    return t.select(
        "lang",
        "source",
        F.col("n").cast("long").alias("n_docs"),
        rnd(F.log2(ratio), 6).alias("pmi"),
        rnd((F.col("n") / F.col("tot")) * F.log2(ratio), 6).alias("mi_contrib"),
    ).orderBy("lang", "source")
