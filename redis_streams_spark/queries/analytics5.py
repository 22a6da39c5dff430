"""Round-6 analytics operators: deterministic weighted sampling,
mergeable partial-aggregate rollups, CDC log compaction, marketing
attribution, graph degree profiling, domain rebalancing, and
max-inner-product search.

Reference basis: none (redis-streams has no relational surface); the
weighted sample follows Efraimidis & Spirakis 2006 ("Weighted random
sampling with a reservoir"), the rollup-merge is the standard mergeable
aggregation-state pattern (count/sum/sumsq/min/max compose), and MIPS
top-k is the exact baseline for the norm-augmentation reduction
(Bachrach et al. 2014).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import words_sql, words
from redis_streams_spark.operators.similarity import dot_topk
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_U32 = 4294967296.0  # 2^32: h32 values map into (0, 1] via (h+1)/2^32


@register(
    "q_weighted_sample",
    shape="bounded",
    tags=("sampling", "mixing"),
    oracle=f"""
WITH keyed AS (
  SELECT o_orderkey, o_totalprice,
         {rnd_sql(f'exp(ln(({h32_sql("o_orderkey::VARCHAR")} + 1) / {_U32}) / o_totalprice)', 9)} AS sample_key
  FROM orders
)
SELECT o_orderkey, o_totalprice, sample_key
FROM keyed
ORDER BY sample_key DESC, o_orderkey
LIMIT 20
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement, k=20, weight = o_totalprice —
    Efraimidis-Spirakis: each row draws key u^(1/w) from a DETERMINISTIC
    hash uniform u = (h32(key)+1)/2^32, and the k largest keys are the
    sample.  Inclusion probability is proportional to weight; the hash
    uniform makes the sample stable across runs, engines, and partition
    layouts (same property as q_hash_sample, extended to weights).

    Scale shape: one scan computing the key per row, then a global top-k
    TakeOrdered (per-partition heads merged on the driver) — THE
    distributed weighted-sampling pattern: no sort, no shuffle of the
    full table.  Keys are ranked at 9 dp (identical on both engines) with
    the orderkey as the total tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    u = (h32(F.col("o_orderkey").cast("string")) + 1) / F.lit(_U32)
    keyed = orders.select(
        "o_orderkey",
        "o_totalprice",
        rnd(F.exp(F.log(u) / F.col("o_totalprice")), 9).alias("sample_key"),
    )
    return keyed.orderBy(F.desc("sample_key"), "o_orderkey").limit(20)


@register(
    "q_incremental_rollup",
    shape="bounded",
    tags=("agg", "incremental", "mergeable-state"),
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, event_type,
         count(*) AS cnt, sum(value) AS s, sum(value * value) AS ss,
         min(value) AS mn, max(value) AS mx
  FROM events GROUP BY 1, 2
), monthly AS (
  SELECT strftime(date_trunc('month', day), '%Y-%m') AS month, event_type,
         sum(cnt)::BIGINT AS n, sum(s) AS s, sum(ss) AS ss,
         min(mn) AS mn, max(mx) AS mx
  FROM daily GROUP BY 1, 2
)
SELECT month, event_type, n,
       {rnd_sql('s', 2)} AS total_value,
       {rnd_sql('s / n', 4)} AS avg_value,
       {rnd_sql('sqrt((ss - s * s / n) / (n - 1))', 4)} AS stddev_value,
       {rnd_sql('mn', 2)} AS min_value,
       {rnd_sql('mx', 2)} AS max_value
FROM monthly ORDER BY month, event_type
""",
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: daily PARTIAL STATES
    (count/sum/sumsq/min/max) merged into monthly stats — avg and stddev
    reconstructed from the merged moments, never from raw rows.

    This is the pattern that makes 100 TB rollups incremental: each
    day's partition is aggregated once when it lands; month (or year)
    queries merge |days| constant-size states instead of re-scanning the
    fact table.  Both aggregation levels partial-aggregate map-side."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    monthly = daily.groupBy(
        F.date_format(F.date_trunc("month", "day"), "yyyy-MM").alias("month"),
        "event_type",
    ).agg(
        F.sum("cnt").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    return monthly.select(
        "month",
        "event_type",
        "n",
        rnd("s", 2).alias("total_value"),
        rnd(F.col("s") / F.col("n"), 4).alias("avg_value"),
        rnd(
            F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)),
            4,
        ).alias("stddev_value"),
        rnd("mn", 2).alias("min_value"),
        rnd("mx", 2).alias("max_value"),
    ).orderBy("month", "event_type")


@register(
    "q_cdc_compact",
    shape="per_row",
    tags=("cdc", "compaction"),
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, value, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
)
SELECT user_id, event_type AS last_event_type,
       round(5e-10 + value, 2) AS last_value,
       epoch_us(ts) AS last_ts_us, n_changes,
       (event_type = 'error') AS is_tombstone
FROM ranked WHERE rn = 1
ORDER BY user_id
""",
)
def q_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: collapse the per-user change stream to its net
    effect — last-writer-wins on (ts, event_id), with 'error' as the
    tombstone marker (the MERGE-source compaction step that runs before
    applying a day's changes to a 100 TB table).

    Scale shape: ONE partial-aggregated groupBy on the key — max_by over
    the composite (ts, event_id) struct picks the survivor without a
    sort, unlike the window-rank formulation the oracle uses (same
    result; the agg form is the one that scales)."""
    ev = load_table(spark, sf_dir, "events")
    okey = F.struct("ts", "event_id")
    last = F.max_by(
        F.struct("event_type", "value", "ts"), okey
    ).alias("last")
    return (
        ev.groupBy("user_id")
        .agg(last, F.count(F.lit(1)).alias("n_changes"))
        .select(
            "user_id",
            F.col("last.event_type").alias("last_event_type"),
            rnd(F.col("last.value"), 2).alias("last_value"),
            F.unix_micros(F.col("last.ts").cast("timestamp")).alias("last_ts_us"),
            "n_changes",
            (F.col("last.event_type") == "error").alias("is_tombstone"),
        )
    )


@register(
    "q_attribution",
    shape="bounded",
    tags=("attribution", "funnel", "window"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, value, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), ft AS (
  SELECT user_id, event_type AS first_channel FROM seq WHERE rn = 1
), purchases AS (
  SELECT s.user_id, s.value, coalesce(s.prev_type, 'direct') AS last_channel
  FROM seq s WHERE s.event_type = 'purchase'
), ft_rev AS (
  SELECT f.first_channel AS channel, sum(p.value) AS rev
  FROM purchases p JOIN ft f USING (user_id) GROUP BY 1
), lt_rev AS (
  SELECT last_channel AS channel, sum(value) AS rev FROM purchases GROUP BY 1
)
SELECT coalesce(a.channel, b.channel) AS channel,
       round(5e-10 + coalesce(a.rev, 0.0), 2) AS first_touch_revenue,
       round(5e-10 + coalesce(b.rev, 0.0), 2) AS last_touch_revenue
FROM ft_rev a FULL OUTER JOIN lt_rev b ON a.channel = b.channel
ORDER BY channel
""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch revenue attribution: each purchase's
    value credited to (a) the user's first-ever event type and (b) the
    event type immediately preceding the purchase ('direct' when the
    purchase opens the journey).

    Scale shape: both models are per-user windows (partitioned by
    user_id — parallel in the key) followed by channel-cardinality
    aggregates; the ft/lt join is a tiny full-outer on |channels| rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    ft = seq.where(F.col("rn") == 1).select(
        "user_id", F.col("event_type").alias("first_channel")
    )
    purchases = seq.where(F.col("event_type") == "purchase").select(
        "user_id",
        "value",
        F.coalesce("prev_type", F.lit("direct")).alias("last_channel"),
    )
    ft_rev = (
        purchases.join(ft, "user_id")
        .groupBy(F.col("first_channel").alias("channel"))
        .agg(F.sum("value").alias("rev_ft"))
    )
    lt_rev = purchases.groupBy(F.col("last_channel").alias("channel")).agg(
        F.sum("value").alias("rev_lt")
    )
    return (
        ft_rev.join(lt_rev, "channel", "full_outer")
        .select(
            "channel",
            rnd(F.coalesce("rev_ft", F.lit(0.0)), 2).alias("first_touch_revenue"),
            rnd(F.coalesce("rev_lt", F.lit(0.0)), 2).alias("last_touch_revenue"),
        )
        .orderBy("channel")
    )


@register(
    "q_degree_distribution",
    shape="bounded",
    tags=("graph", "histogram"),
    oracle="""
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), und AS (
  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
), deg AS (
  SELECT u AS node, count(*)::BIGINT AS d FROM und GROUP BY u
)
SELECT length(bin(d))::BIGINT AS degree_bucket,
       count(*) AS n_nodes, min(d) AS min_degree, max(d) AS max_degree
FROM deg GROUP BY 1 ORDER BY degree_bucket
""",
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree histogram of the part co-purchase graph —
    the power-law fingerprint that decides whether skew handling
    (salting, degree-ordered joins) is needed before any heavier graph
    op.  Bucket = number of binary digits of the degree (floor(log2)+1
    computed EXACTLY via bin-string length, immune to the float-log2
    ulp hazard).

    Scale shape: the edge build is the same per-order self-join as
    q_triangles (bounded by order size), then two partial-aggregated
    shuffles (degree, bucket)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e0 = (
        a.join(b, "ok")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    und = e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    return (
        deg.groupBy(F.length(F.bin("d")).cast("long").alias("degree_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("d").alias("min_degree"),
            F.max("d").alias("max_degree"),
        )
        .orderBy("degree_bucket")
    )


@register(
    "mix_domain_targets",
    shape="bounded",
    tags=("mixing", "llm-pipeline"),
    oracle=f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         sum(len({words_sql('text')}))::BIGINT AS tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(tokens) * 1.0 AS t, count(*) * 1.0 AS k FROM per_src
)
SELECT source, n_docs, tokens,
       {rnd_sql('tokens / tot.t', 6)} AS actual_share,
       {rnd_sql('least(greatest((1.0 / tot.k) / (tokens / tot.t), 0.1), 10.0)', 4)} AS resample_factor,
       floor(tokens * least(greatest((1.0 / tot.k) / (tokens / tot.t), 0.1), 10.0))::BIGINT
         AS projected_tokens
FROM per_src CROSS JOIN tot
ORDER BY source
""",
)
def mix_domain_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain rebalancing factors toward a UNIFORM token share across
    sources: factor = target_share / actual_share, clipped to [0.1, 10]
    (the up/down-sampling multipliers a mixing stage feeds into weighted
    sampling — complement of mix_temperature's exponent scaling).

    Scale shape: one token-count aggregate per source, totals as a 1-row
    broadcast scalar, arithmetic on |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words("text"))).alias("tokens"),
    )
    tot = per_src.agg(
        F.sum("tokens").cast("double").alias("t"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    factor = F.least(
        F.greatest(
            (1.0 / F.col("k")) / (F.col("tokens") / F.col("t")), F.lit(0.1)
        ),
        F.lit(10.0),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "tokens",
            rnd(F.col("tokens") / F.col("t"), 6).alias("actual_share"),
            rnd(factor, 4).alias("resample_factor"),
            F.floor(F.col("tokens") * factor).cast("long").alias(
                "projected_tokens"
            ),
        )
        .orderBy("source")
    )


_DOT_SQL = (
    "list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),"
    " (x, y) -> x + y)"
)


@register(
    "sim_dot_topk",
    shape="per_row",
    tags=("similarity", "mips"),
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 25 = 0
), scored AS (
  SELECT q.query_id, e.vec_id AS cand_id,
         {rnd_sql(_DOT_SQL.format(a='q.qv', b='e.v'), 6)} AS dot_product
  FROM q JOIN e ON e.vec_id <> q.query_id
)
SELECT query_id, cand_id, dot_product, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot_product DESC, cand_id) AS rank
      FROM scored) t
WHERE rank <= 10
ORDER BY query_id, rank
""",
)
def sim_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (MIPS) top-10 — recommendation-model
    retrieval scores by RAW dot product, where cosine's normalization is
    wrong.  This is the exact baseline; at index scale MIPS reduces to
    cosine ANN via norm augmentation (append sqrt(M²-|x|²) as an extra
    dimension), after which sim_ivf_topk / sim_lsh_topk apply unchanged.

    Scale shape: same as sim_bruteforce_topk — queries broadcast,
    candidates stream, per-query ranking window (left-fold dot product,
    bit-identical to the oracle's list_reduce); shared operator
    ``operators.similarity.dot_topk`` (also the RRF fusion input), no
    presentation sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dot_topk(emb, k=10, query_mod=25)
