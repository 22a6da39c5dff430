"""Round-8 sketch wave: KMV distinct-set intersection, bloom-filter
join prefiltering, and a hash-replicate bootstrap — all built from the
cross-engine md5 ``h32`` so BOTH engines compute identical sketch
contents and the driver hash-compares actual values, not error bounds.

Scale rationale (SURVEY §2.2 sketch row): these are the three sketch
shapes a 100 TB engine reaches for —
- KMV: mergeable distinct sketches whose set algebra (Jaccard,
  intersection size) works on K-row summaries instead of the sets;
- bloom prefilter: ship a few KB of bits to the probe side of a
  semi-join instead of shuffling the probe rows;
- hash-replicate bootstrap: B resampled aggregates in ONE scan (no B
  passes, no driver-side RNG state).

Reference basis: none (client library delegates processing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_K = 64  # KMV sketch size
_BLOOM_M = 4096
_BLOOM_K = 3
_BOOT_B = 32


def _kmv_oracle() -> str:
    return f"""
WITH hashes AS (
  SELECT DISTINCT event_type, {h32_sql("user_id::VARCHAR")} AS h FROM events
), sk AS (
  SELECT event_type, h
  FROM (SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
        FROM hashes) t
  WHERE r <= {_K}
), types AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a JOIN types b ON a.event_type < b.event_type
), flagged AS (
  SELECT p.ta, p.tb, s.h,
         max(CASE WHEN s.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p
  JOIN sk s ON s.event_type IN (p.ta, p.tb)
  GROUP BY p.ta, p.tb, s.h
), merged AS (
  SELECT ta, tb, in_a, in_b,
         row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS r
  FROM flagged
), est AS (
  SELECT ta, tb,
         sum(in_a * in_b)::BIGINT AS k_both
  FROM merged WHERE r <= {_K}
  GROUP BY ta, tb
), exact_flag AS (
  SELECT p.ta, p.tb, u.user_id,
         max(CASE WHEN u.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN u.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p
  JOIN (SELECT DISTINCT event_type, user_id FROM events) u
    ON u.event_type IN (p.ta, p.tb)
  GROUP BY p.ta, p.tb, u.user_id
), exact AS (
  SELECT ta, tb,
         sum(in_a * in_b)::BIGINT AS n_inter,
         count(*)::BIGINT AS n_union
  FROM exact_flag GROUP BY ta, tb
)
SELECT e.ta AS type_a, e.tb AS type_b,
       {rnd_sql(f"s.k_both * 1.0 / {_K}", 6)} AS est_jaccard,
       {rnd_sql("e.n_inter * 1.0 / e.n_union", 6)} AS exact_jaccard,
       {rnd_sql(f"abs(s.k_both * 1.0 / {_K} - e.n_inter * 1.0 / e.n_union)", 6)}
         AS abs_err
FROM exact e JOIN est s ON s.ta = e.ta AND s.tb = e.tb
ORDER BY type_a, type_b
"""


@register("q_kmv_jaccard", shape="bounded", tags=("sketch", "distinct", "jaccard"), oracle=_kmv_oracle())
def q_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketches: keep the K smallest
    user-id hashes per event type; for each type pair, the K smallest of
    the merged sketch estimate Jaccard as |both| / K — set algebra on
    64-row summaries.  The exact Jaccard column is the built-in audit
    (at 100 TB you'd sample it); sketches are mergeable across
    partitions/days by construction (min-hash sets union).  Identical
    md5 hashing on both engines → the driver compares exact values."""
    ev = load_table(spark, sf_dir, "events")
    hashes = ev.select(
        "event_type", h32(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    wk = W.partitionBy("event_type").orderBy("h")
    sk = (
        hashes.withColumn("r", F.row_number().over(wk))
        .where(F.col("r") <= _K)
        .select("event_type", "h")
    )
    types = ev.select("event_type").distinct()
    # persist: the pair frame is referenced four times below (two sketch
    # sides, two exact sides) and each reference would otherwise replay
    # the full events scan + distinct behind it
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .persist()
    )
    # union-of-equijoins, not one OR-join: an OR condition forces a
    # nested-loop strategy; two hash joins on the type key stay linear
    side_a = pairs.join(F.broadcast(sk), sk.event_type == F.col("ta"))
    side_b = pairs.join(F.broadcast(sk), sk.event_type == F.col("tb"))
    flagged = (
        side_a.unionByName(side_b)
        .groupBy("ta", "tb", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("ta"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("tb"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    wm = W.partitionBy("ta", "tb").orderBy("h")
    est = (
        flagged.withColumn("r", F.row_number().over(wm))
        .where(F.col("r") <= _K)
        .groupBy("ta", "tb")
        .agg(F.sum(F.col("in_a") * F.col("in_b")).alias("k_both"))
    )
    users = ev.select("event_type", "user_id").distinct()
    ua = users.join(F.broadcast(pairs), users.event_type == F.col("ta"))
    ub = users.join(F.broadcast(pairs), users.event_type == F.col("tb"))
    exact = (
        ua.unionByName(ub)
        .groupBy("ta", "tb", "user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("ta"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("tb"), 1).otherwise(0)
            ).alias("in_b"),
        )
        .groupBy("ta", "tb")
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter"),
            F.count(F.lit(1)).alias("n_union"),
        )
    )
    est_j = F.col("k_both") * 1.0 / _K
    exact_j = F.col("n_inter") * 1.0 / F.col("n_union")
    return (
        exact.join(est, ["ta", "tb"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            rnd(est_j, 6).alias("est_jaccard"),
            rnd(exact_j, 6).alias("exact_jaccard"),
            rnd(F.abs(est_j - exact_j), 6).alias("abs_err"),
        )
        .orderBy("type_a", "type_b")
    )


def _bloom_oracle() -> str:
    pos_h = h32_sql("i::VARCHAR || ':' || k::VARCHAR")
    pos = f"{pos_h} % {_BLOOM_M}"
    return f"""
WITH promo AS (
  SELECT DISTINCT p_partkey AS k FROM part WHERE p_type LIKE 'PROMO%'
), bloom AS (
  SELECT DISTINCT {pos} AS bit
  FROM promo, (SELECT unnest(range(0, {_BLOOM_K})) AS i) hs
), probe AS (
  SELECT DISTINCT l_partkey AS k FROM lineitem
), probe_bits AS (
  SELECT k, {pos} AS bit
  FROM probe, (SELECT unnest(range(0, {_BLOOM_K})) AS i) hs
), cand AS (
  SELECT pb.k,
         count(b.bit)::BIGINT AS n_hit
  FROM probe_bits pb LEFT JOIN bloom b ON b.bit = pb.bit
  GROUP BY pb.k
), verdict AS (
  SELECT c.k,
         c.n_hit = {_BLOOM_K} AS candidate,
         p.k IS NOT NULL AS member
  FROM cand c LEFT JOIN promo p ON p.k = c.k
)
SELECT count(*)::BIGINT AS n_probed,
       sum(CASE WHEN candidate THEN 1 ELSE 0 END)::BIGINT AS n_candidates,
       sum(CASE WHEN member THEN 1 ELSE 0 END)::BIGINT AS n_members,
       sum(CASE WHEN candidate AND NOT member THEN 1 ELSE 0 END)::BIGINT
         AS n_false_pos,
       sum(CASE WHEN member AND NOT candidate THEN 1 ELSE 0 END)::BIGINT
         AS n_false_neg,
       {rnd_sql(
           "sum(CASE WHEN candidate AND NOT member THEN 1 ELSE 0 END) * 1.0 /"
           " greatest(count(*) - sum(CASE WHEN member THEN 1 ELSE 0 END), 1)",
           6,
       )} AS fp_rate
FROM verdict
"""


@register(
    "q_bloom_prefilter_audit",
    shape="bounded",
    tags=("sketch", "bloom", "join-prefilter"),
    oracle=_bloom_oracle(),
)
def q_bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join prefiltering, audited: build an m=4096/k=3
    bloom over promo part keys, probe every distinct lineitem partkey,
    and report candidate/member/false-positive counts and the FP rate.
    n_false_neg is the correctness invariant — a bloom filter NEVER
    misses a member, so it must be 0 on both engines.  At 100 TB the
    bloom bitset (a few KB) broadcasts to the probe side and drops
    non-member rows BEFORE the join shuffle; this query measures exactly
    how much it would drop.  Identical md5-derived bit positions on both
    engines → value-exact compare."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    promo = (
        part.where(F.col("p_type").like("PROMO%"))
        .select(F.col("p_partkey").alias("k"))
        .distinct()
    )
    idx = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("i")
    pos = (
        h32(
            F.concat(
                F.col("i").cast("string"), F.lit(":"), F.col("k").cast("string")
            )
        )
        % _BLOOM_M
    )
    bloom = promo.select("k", idx).select(pos.alias("bit")).distinct()
    probe = li.select(F.col("l_partkey").alias("k")).distinct()
    probe_bits = probe.select("k", idx).select("k", pos.alias("bit"))
    cand = (
        probe_bits.join(F.broadcast(bloom), "bit", "left_semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    verdict = (
        probe.join(cand, "k", "left")
        .join(
            F.broadcast(promo.withColumn("member", F.lit(True))), "k", "left"
        )
        .select(
            (F.coalesce("n_hit", F.lit(0)) == _BLOOM_K).alias("candidate"),
            F.coalesce("member", F.lit(False)).alias("member"),
        )
    )
    fp = F.sum(F.when(F.col("candidate") & ~F.col("member"), 1).otherwise(0))
    members = F.sum(F.when(F.col("member"), 1).otherwise(0))
    return verdict.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.when(F.col("candidate"), 1).otherwise(0)).alias("n_candidates"),
        members.alias("n_members"),
        fp.alias("n_false_pos"),
        F.sum(F.when(F.col("member") & ~F.col("candidate"), 1).otherwise(0)).alias(
            "n_false_neg"
        ),
        rnd(
            fp * 1.0 / F.greatest(F.count(F.lit(1)) - members, F.lit(1)), 6
        ).alias("fp_rate"),
    )


def _bootstrap_oracle() -> str:
    inc_h = h32_sql("o_orderkey::VARCHAR || ':' || b::VARCHAR")
    inc = f"{inc_h} % 1000 < 632"
    return f"""
WITH reps AS (
  SELECT b, avg(o_totalprice) AS rep_mean
  FROM orders, (SELECT unnest(range(0, {_BOOT_B})) AS b) bs
  WHERE {inc}
  GROUP BY b
)
SELECT (SELECT count(*) FROM reps)::BIGINT AS n_reps,
       (SELECT {rnd_sql("avg(o_totalprice)", 2)} FROM orders) AS point_mean,
       {rnd_sql("quantile_cont(rep_mean, 0.025)", 2)} AS ci_lo,
       {rnd_sql("quantile_cont(rep_mean, 0.975)", 2)} AS ci_hi
FROM reps
"""


@register(
    "q_bootstrap_ci",
    shape="bounded",
    tags=("stats", "bootstrap", "sketch"),
    oracle=_bootstrap_oracle(),
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-replicate bootstrap CI for mean order value: replicate b
    includes order o iff h32(okey:b) % 1000 < 632 (the 1-1/e Poisson-
    bootstrap inclusion probability, derandomized through the shared
    md5 hash), B=32 replicate means in ONE scan via an explode —
    no B passes over the data, no driver RNG.  CI bounds are the
    2.5/97.5 percentiles of the replicate means (exact interpolation on
    both engines).  The scan fans out x32 map-side but aggregates to 32
    rows before the exchange — shuffle is O(B), not O(rows)."""
    orders = load_table(spark, sf_dir, "orders")
    reps = (
        orders.select(
            "o_orderkey",
            "o_totalprice",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        )
        .where(
            h32(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            )
            % 1000
            < 632
        )
        .groupBy("b")
        .agg(F.avg("o_totalprice").alias("rep_mean"))
    )
    point = orders.agg(rnd(F.avg("o_totalprice"), 2).alias("point_mean"))
    return reps.agg(
        F.count(F.lit(1)).alias("n_reps"),
        rnd(F.expr("percentile(rep_mean, 0.025)"), 2).alias("ci_lo"),
        rnd(F.expr("percentile(rep_mean, 0.975)"), 2).alias("ci_hi"),
    ).crossJoin(point).select("n_reps", "point_mean", "ci_lo", "ci_hi")
