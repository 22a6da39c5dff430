"""Mergeable-sketch operators: a Count-Min sketch built as a DataFrame
computation, with VALUE-exact oracle verification.

Complements q_approx_aggs (HLL distinct + quantile sketch, whose engine
sketches are compared through bounded-error booleans) with the third
classic mergeable sketch — and because this CMS is constructed from
md5-derived hash rows rather than an opaque engine primitive, BOTH
engines compute identical counter tables and identical estimates, so the
driver gate hash-compares the actual estimated frequencies.

Scale shape (the whole point of CMS at 100 TB): the sketch build is a
scan-stage explode to ``depth`` (row, bucket) cells followed by ONE
partial-aggregated groupBy onto depth x width = 2048 cells — map-side
combine collapses every partition to <= 2048 rows before the exchange,
so the shuffle is O(cells), not O(keys).  Counters are mergeable across
partitions, executors, and days by construction (they are just sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_DEPTH = 4
_WIDTH = 512
_TOP_K = 10


def cms_cells(df: DataFrame, key: str) -> DataFrame:
    """Count-Min counter table for ``df[key]``: one row per (depth row i,
    bucket) cell with its counter.  bucket_i(k) = h32(i ':' k) % width —
    the same deterministic md5-derived hashing every cross-engine
    operator in this repo uses, so an oracle can rebuild the identical
    sketch."""
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(_DEPTH - 1))).alias("i"),
        (
            h32(F.concat(F.col("i").cast("string"), F.lit(":"), F.col(key).cast("string")))
            % _WIDTH
        ).alias("bucket"),
    )
    return rows.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("counter"))


def cms_estimate(cells: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """Point-query the sketch for each row of ``keys``: recompute the
    depth bucket positions for the key, broadcast-join the (tiny) counter
    table, take the min counter — the standard CMS estimate."""
    probes = keys.select(
        key,
        F.explode(F.sequence(F.lit(0), F.lit(_DEPTH - 1))).alias("i"),
    ).withColumn(
        "bucket",
        h32(F.concat(F.col("i").cast("string"), F.lit(":"), F.col(key).cast("string")))
        % _WIDTH,
    )
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("est_n"))
    )


_BUCKET_SQL = "({h} % {w})".format(
    h=h32_sql("i::VARCHAR || ':' || user_id::VARCHAR"), w=_WIDTH
)


@register(
    "q_cms_heavy_hitters",
    tags=("sketch", "approx", "scale"),
    oracle=f"""
WITH cells AS (
  SELECT {_BUCKET_SQL} AS bucket, i, count(*) AS counter
  FROM events, (SELECT unnest(range(0, {_DEPTH})) AS i) ds
  GROUP BY i, bucket
),
per_key AS (
  SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id
),
top AS (
  SELECT user_id, exact_n,
         row_number() OVER (ORDER BY exact_n DESC, user_id) AS rank
  FROM per_key QUALIFY rank <= {_TOP_K}
),
probes AS (
  SELECT t.user_id, t.exact_n, t.rank, ds.i, {_BUCKET_SQL} AS bucket
  FROM top t, (SELECT unnest(range(0, {_DEPTH})) AS i) ds
),
est AS (
  SELECT p.user_id, p.exact_n, p.rank,
         min(coalesce(c.counter, 0))::BIGINT AS est_n
  FROM probes p LEFT JOIN cells c ON c.i = p.i AND c.bucket = p.bucket
  GROUP BY p.user_id, p.exact_n, p.rank
)
SELECT user_id, exact_n, rank::BIGINT AS rank, est_n,
       (est_n >= exact_n) AS no_undercount
FROM est
ORDER BY rank
""",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy-hitter audit over ``events.user_id``: the sketch
    is built distributively as a {_DEPTH}x{_WIDTH} counter table (scan-
    stage hashing, ONE map-side-combined groupBy onto <= 2048 cells), the
    exact top-{_TOP_K} keys are ranked for the audit, and each hot key's
    CMS estimate (min over depth rows) rides along — VALUE-exact against
    the oracle's identically-hashed sketch, plus the structural
    ``estimate >= exact`` guarantee as a named boolean.  At 100 TB the
    counter table replaces exact per-key counting wherever bounded
    over-count is acceptable: the shuffle carries cells, not keys, and
    counters merge across any partitioning of the data."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cells = cms_cells(ev, "user_id")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    top = per_key.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("exact_n"), "user_id")).cast("long")
    ).where(F.col("rank") <= _TOP_K)
    est = cms_estimate(cells, top.select("user_id"), "user_id")
    return (
        top.join(F.broadcast(est), "user_id")
        .select(
            "user_id",
            "exact_n",
            "rank",
            "est_n",
            (F.col("est_n") >= F.col("exact_n")).alias("no_undercount"),
        )
        .orderBy("rank")
    )
