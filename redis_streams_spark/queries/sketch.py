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
from redis_streams_spark.functions.rounding import rnd
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
    shape="bounded",
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


_HLL_M = 256  # registers (2^8); bucket = top 8 hash bits' complement split
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256)  # alpha_m for m = 256
_HLL_AMM = _HLL_ALPHA * _HLL_M * _HLL_M  # embedded as one double literal


_HLL_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT {h32_sql("user_id::VARCHAR")} AS hv FROM events
), parts AS (
  SELECT hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w FROM h
), rho AS (
  SELECT bucket,
         CASE WHEN w = 0 THEN 25
              ELSE 25 - length(bin(w)) END AS r
  FROM parts
), regs AS (
  SELECT bucket, max(r) AS m FROM rho GROUP BY bucket
), s AS (
  SELECT sum(pow(2.0, -m)) AS sp, count(*) AS npresent FROM regs
), ex AS (
  SELECT count(DISTINCT user_id) AS n_exact FROM events
), est AS (
  SELECT ex.n_exact,
         ({_HLL_M} - s.npresent)::BIGINT AS n_zero_registers,
         {_HLL_AMM!r}::DOUBLE
           / (s.sp + ({_HLL_M} - s.npresent)) AS e_raw
  FROM s CROSS JOIN ex
)
SELECT n_exact, n_zero_registers,
       round(5e-10 + CASE WHEN e_raw <= 2.5 * {_HLL_M} AND n_zero_registers > 0
             THEN {_HLL_M} * ln({_HLL_M} * 1.0 / n_zero_registers)
             ELSE e_raw END, 4) AS hll_estimate,
       round(5e-10 + abs(CASE WHEN e_raw <= 2.5 * {_HLL_M} AND n_zero_registers > 0
             THEN {_HLL_M} * ln({_HLL_M} * 1.0 / n_zero_registers)
             ELSE e_raw END - n_exact) / n_exact, 6) AS rel_error,
       abs(CASE WHEN e_raw <= 2.5 * {_HLL_M} AND n_zero_registers > 0
             THEN {_HLL_M} * ln({_HLL_M} * 1.0 / n_zero_registers)
             ELSE e_raw END - n_exact) / n_exact < 0.10 AS within_10pct
FROM est
"""


@register("q_hll_distinct", shape="bounded", tags=("sketch", "hll"), oracle=_HLL_ORACLE)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count of users, built as a DataFrame
    computation from the repo's md5-derived h32 (Flajolet et al. 2007,
    with the standard small-range linear-counting correction) — both
    engines construct IDENTICAL register tables, so unlike
    q_approx_aggs' engine-opaque HLL sketch this one hash-compares the
    actual estimate.  Completes the mergeable-sketch family: CMS
    (frequency), bloom (membership, tools/bloom_filter_demo.py), HLL
    (distinct) — all built from sums/maxima, so they merge across
    partitions, executors, and days by construction.

    Scale shape: one distinct-hash aggregation (the only data-sized
    shuffle, keyed on the hash), then register maxima onto ≤256 cells
    with map-side combine — the exchange carries O(registers), not
    O(keys).

    Reference basis: none (published algorithm)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(h32(F.col("user_id").cast("string")).alias("hv")).distinct()
    parts = h.select(
        (F.col("hv") % _HLL_M).alias("bucket"),
        F.floor(F.col("hv") / _HLL_M).cast("long").alias("w"),
    )
    # bit length via bin() string length — PURE INTEGER extraction on
    # both engines; floor(log2(w)) was 1-ulp-hazardous at exact powers
    # of two (Spark computes log2 as log(x)/log(2)) — review finding
    rho = parts.select(
        "bucket",
        F.when(F.col("w") == 0, F.lit(25))
        .otherwise(F.lit(25) - F.length(F.bin("w")).cast("long"))
        .alias("r"),
    )
    regs = rho.groupBy("bucket").agg(F.max("r").alias("m"))
    s = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("sp"),
        F.count(F.lit(1)).alias("npresent"),
    )
    ex = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    est = s.crossJoin(F.broadcast(ex)).select(
        "n_exact",
        (F.lit(_HLL_M) - F.col("npresent")).cast("long").alias("n_zero_registers"),
        (
            F.lit(_HLL_AMM)
            / (F.col("sp") + (F.lit(_HLL_M) - F.col("npresent")))
        ).alias("e_raw"),
    )
    corrected = F.when(
        (F.col("e_raw") <= 2.5 * _HLL_M) & (F.col("n_zero_registers") > 0),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / F.col("n_zero_registers")),
    ).otherwise(F.col("e_raw"))
    return est.select(
        "n_exact",
        "n_zero_registers",
        rnd(corrected, 4).alias("hll_estimate"),
        rnd(F.abs(corrected - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_error"
        ),
        (
            F.abs(corrected - F.col("n_exact")) / F.col("n_exact") < 0.10
        ).alias("within_10pct"),
    )


def _hll_regs(ev: DataFrame, etype: str) -> DataFrame:
    """(bucket, m) register table for the distinct user set of one event
    type — the mergeable unit: registers from different slices (types,
    days, executors) combine by elementwise max."""
    h = (
        ev.where(F.col("event_type") == etype)
        .select(h32(F.col("user_id").cast("string")).alias("hv"))
        .distinct()
    )
    parts = h.select(
        (F.col("hv") % _HLL_M).alias("bucket"),
        F.floor(F.col("hv") / _HLL_M).cast("long").alias("w"),
    )
    rho = parts.select(
        "bucket",
        F.when(F.col("w") == 0, F.lit(25))
        .otherwise(F.lit(25) - F.length(F.bin("w")).cast("long"))
        .alias("r"),
    )
    return rho.groupBy("bucket").agg(F.max("r").alias("m"))


def _hll_regs_sql(etype: str) -> str:
    return f"""(
  SELECT hv % {_HLL_M} AS bucket,
         max(CASE WHEN hv // {_HLL_M} = 0 THEN 25
                  ELSE 25 - length(bin(hv // {_HLL_M})) END) AS m
  FROM (SELECT DISTINCT {h32_sql("user_id::VARCHAR")} AS hv
        FROM events WHERE event_type = '{etype}')
  GROUP BY 1
)"""


def _est_sql(sp: str = "sp", np: str = "np") -> str:
    """Stabilized HLL estimate (raw + linear-counting correction) over a
    register-stat row with columns ``sp`` (Σ2^-m) and ``np`` (registers
    present) — identical literals to the Spark side."""
    amm, m = repr(_HLL_AMM), _HLL_M
    return f"""round(5e-10 + CASE
  WHEN {amm}::DOUBLE / ({sp} + ({m} - {np})) <= 2.5 * {m} AND ({m} - {np}) > 0
  THEN {m} * ln({m} * 1.0 / ({m} - {np}))
  ELSE {amm}::DOUBLE / ({sp} + ({m} - {np})) END, 4)"""


@register(
    "q_hll_merge",
    shape="bounded",
    tags=("sketch", "hll", "merge"),
    oracle=f"""
WITH ra AS {_hll_regs_sql("click")},
rb AS {_hll_regs_sql("purchase")},
merged AS (
  SELECT coalesce(ra.bucket, rb.bucket) AS bucket,
         greatest(coalesce(ra.m, 0), coalesce(rb.m, 0)) AS m
  FROM ra FULL OUTER JOIN rb ON ra.bucket = rb.bucket
), stats AS (
  SELECT 'a' AS s, sum(pow(2.0, -m)) AS sp, count(*) AS np FROM ra
  UNION ALL
  SELECT 'b', sum(pow(2.0, -m)), count(*) FROM rb
  UNION ALL
  SELECT 'u', sum(pow(2.0, -m)), count(*) FROM merged
), ests AS (
  SELECT s, {_est_sql("stats.sp", "stats.np")} AS e
  FROM stats
), ex AS (
  SELECT count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
           AS exact_a,
         count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
           AS exact_b,
         count(DISTINCT CASE WHEN event_type IN ('click', 'purchase')
                             THEN user_id END) AS exact_union
  FROM events
)
SELECT ex.exact_a, ex.exact_b, ex.exact_union,
       (SELECT e FROM ests WHERE s = 'a') AS est_a,
       (SELECT e FROM ests WHERE s = 'b') AS est_b,
       (SELECT e FROM ests WHERE s = 'u') AS est_union,
       round(5e-10 + (SELECT e FROM ests WHERE s = 'a')
                   + (SELECT e FROM ests WHERE s = 'b')
                   - (SELECT e FROM ests WHERE s = 'u'), 4) AS est_intersect,
       abs((SELECT e FROM ests WHERE s = 'u') - ex.exact_union)
         / ex.exact_union < 0.10 AS union_within_10pct
FROM ex
""",
)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY demonstrated end-to-end: build separate register
    tables for the click-user and purchase-user sets, merge them by
    elementwise register max — the exact operation that combines
    per-partition / per-day / per-executor sketches — and estimate
    |A|, |B|, |A∪B| plus |A∩B| by inclusion–exclusion, against exact
    counts.  Register merge is a |buckets|-row full-outer join; nothing
    about the merge touches row-level data.

    Reference basis: none (published algorithm)."""
    ev = load_table(spark, sf_dir, "events")
    ra = _hll_regs(ev, "click")
    rb = _hll_regs(ev, "purchase")
    merged = (
        ra.select(F.col("bucket"), F.col("m").alias("ma"))
        .join(
            rb.select(F.col("bucket"), F.col("m").alias("mb")),
            "bucket",
            "full_outer",
        )
        .select(
            "bucket",
            F.greatest(
                F.coalesce(F.col("ma"), F.lit(0)),
                F.coalesce(F.col("mb"), F.lit(0)),
            ).alias("m"),
        )
    )

    def est(regs: DataFrame, name: str) -> DataFrame:
        s = regs.agg(
            F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("sp"),
            F.count(F.lit(1)).alias("np"),
        )
        e_raw = F.lit(_HLL_AMM) / (F.col("sp") + (F.lit(_HLL_M) - F.col("np")))
        zeros = F.lit(_HLL_M) - F.col("np")
        corrected = F.when(
            (e_raw <= 2.5 * _HLL_M) & (zeros > 0),
            F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros),
        ).otherwise(e_raw)
        return s.select(rnd(corrected, 4).alias(name))

    ex = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("exact_a"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_b"),
        F.countDistinct(
            F.when(
                F.col("event_type").isin("click", "purchase"), F.col("user_id")
            )
        ).alias("exact_union"),
    )
    out = (
        ex.crossJoin(F.broadcast(est(ra, "est_a")))
        .crossJoin(F.broadcast(est(rb, "est_b")))
        .crossJoin(F.broadcast(est(merged, "est_union")))
    )
    return out.select(
        "exact_a",
        "exact_b",
        "exact_union",
        "est_a",
        "est_b",
        "est_union",
        rnd(
            F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
        ).alias("est_intersect"),
        (
            F.abs(F.col("est_union") - F.col("exact_union"))
            / F.col("exact_union")
            < 0.10
        ).alias("union_within_10pct"),
    )
