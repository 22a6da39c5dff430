"""Round-8 similarity wave: MMR (maximal marginal relevance)
re-ranking — the diversity-aware top-k used between ANN retrieval and a
RAG prompt, as a fixed-step unrolled greedy with a CTE-unrolled oracle.

Reference basis: none (SURVEY §2.2 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.operators.similarity import cosine
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_QUERY_MOD = 97
_POOL_K = 8
_LAMBDA = 0.7

_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),"
    " (x, y) -> x + y)"
)


def _cos(av: str, an: str, bv: str, bn: str) -> str:
    return f"round(5e-10 + {_DOT.format(a=av, b=bv)} / ({an} * {bn}), 6)"


def _mmr_oracle() -> str:
    lam, om = _LAMBDA, 1 - _LAMBDA
    return f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> x::DOUBLE) AS v,
         sqrt(list_reduce(list_transform(embedding, x -> (x::DOUBLE) * (x::DOUBLE)),
                          (a, b) -> a + b)) AS norm
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, label, v AS qv, norm AS qn
  FROM e WHERE vec_id % {_QUERY_MOD} = 0
), pool AS (
  SELECT query_id, cand_id, rel, cv, cn FROM (
    SELECT q.query_id, e.vec_id AS cand_id,
           {_cos('q.qv', 'q.qn', 'e.v', 'e.norm')} AS rel,
           e.v AS cv, e.norm AS cn,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_cos('q.qv', 'q.qn', 'e.v', 'e.norm')} DESC,
                      e.vec_id) AS r
    FROM q JOIN e ON e.label = q.label AND e.vec_id <> q.query_id) t
  WHERE r <= {_POOL_K}
), sims AS (
  SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
         {_cos('a.cv', 'a.cn', 'b.cv', 'b.cn')} AS sim
  FROM pool a JOIN pool b
    ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
), s1 AS (
  SELECT query_id, cand_id, rel, rel AS mmr_score FROM (
    SELECT query_id, cand_id, rel,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, cand_id) AS r
    FROM pool) t WHERE r = 1
), s2 AS (
  SELECT query_id, cand_id, rel, mmr_score FROM (
    SELECT p.query_id, p.cand_id, p.rel,
           {lam} * p.rel - {om} * s.sim AS mmr_score,
           row_number() OVER (PARTITION BY p.query_id
             ORDER BY {lam} * p.rel - {om} * s.sim DESC, p.cand_id) AS r
    FROM pool p
    JOIN s1 ON s1.query_id = p.query_id AND s1.cand_id <> p.cand_id
    JOIN sims s ON s.query_id = p.query_id AND s.ca = p.cand_id
              AND s.cb = s1.cand_id) t
  WHERE r = 1
), s3 AS (
  SELECT query_id, cand_id, rel, mmr_score FROM (
    SELECT p.query_id, p.cand_id, p.rel,
           {lam} * p.rel - {om} * greatest(sa.sim, sb.sim) AS mmr_score,
           row_number() OVER (PARTITION BY p.query_id
             ORDER BY {lam} * p.rel - {om} * greatest(sa.sim, sb.sim) DESC,
                      p.cand_id) AS r
    FROM pool p
    JOIN s1 ON s1.query_id = p.query_id AND s1.cand_id <> p.cand_id
    JOIN s2 ON s2.query_id = p.query_id AND s2.cand_id <> p.cand_id
    JOIN sims sa ON sa.query_id = p.query_id AND sa.ca = p.cand_id
               AND sa.cb = s1.cand_id
    JOIN sims sb ON sb.query_id = p.query_id AND sb.ca = p.cand_id
               AND sb.cb = s2.cand_id) t
  WHERE r = 1
)
SELECT query_id, position, cand_id, rel,
       {rnd_sql('mmr_score', 6)} AS mmr_score
FROM (
  SELECT query_id, 1 AS position, cand_id, rel, mmr_score FROM s1
  UNION ALL SELECT query_id, 2, cand_id, rel, mmr_score FROM s2
  UNION ALL SELECT query_id, 3, cand_id, rel, mmr_score FROM s3
)
ORDER BY query_id, position
"""


@register(
    "sim_mmr_rerank",
    shape="bounded",
    tags=("similarity", "ann", "rerank", "llm-pipeline"),
    oracle=_mmr_oracle(),
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-ranking of an ANN candidate pool: greedily pick 3 of the
    top-8 same-cell candidates maximizing λ·relevance − (1−λ)·max
    similarity to already-picked (λ=0.7) — the standard diversity pass
    between retrieval and a RAG context window.  The greedy loop is
    UNROLLED (3 fixed steps of window-argmax + equi-joins on the
    64-row-per-query sim table), so it distributes per query with no
    driver iteration; the oracle replays the identical unroll as chained
    CTEs.  Cosines round to 6dp BEFORE selection on both engines, making
    every argmax tie-break deterministic cross-engine."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                F.transform("v", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ),
    )
    q = e.where(F.col("vec_id") % _QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    wp = W.partitionBy("query_id")
    pool = (
        e.join(F.broadcast(q), (F.col("label") == F.col("qlabel")))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("norm")).alias(
                "rel"
            ),
            F.col("v").alias("cv"),
            F.col("norm").alias("cn"),
        )
        .withColumn(
            "r", F.row_number().over(wp.orderBy(F.desc("rel"), "cand_id"))
        )
        .where(F.col("r") <= _POOL_K)
        .drop("r")
        .persist()
    )
    sims = (
        pool.alias("a")
        .join(
            pool.alias("b"),
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.cand_id") != F.col("b.cand_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.cand_id").alias("ca"),
            F.col("b.cand_id").alias("cb"),
            cosine(
                F.col("a.cv"), F.col("a.cn"), F.col("b.cv"), F.col("b.cn")
            ).alias("sim"),
        )
        .persist()
    )
    slim = pool.select("query_id", "cand_id", "rel")
    lam, om = _LAMBDA, 1 - _LAMBDA

    def argmax(df: DataFrame, score) -> DataFrame:
        return (
            df.withColumn("mmr_score", score)
            .withColumn(
                "r",
                F.row_number().over(wp.orderBy(F.desc("mmr_score"), "cand_id")),
            )
            .where(F.col("r") == 1)
            .select("query_id", "cand_id", "rel", "mmr_score")
        )

    s1 = argmax(slim, F.col("rel"))
    p1 = s1.select("query_id", F.col("cand_id").alias("pick1"))
    # sims row where ca = the candidate under consideration, cb = pick1
    rest1 = (
        slim.join(F.broadcast(p1), "query_id")
        .where(F.col("cand_id") != F.col("pick1"))
        .join(
            sims.select(
                "query_id",
                F.col("ca").alias("cand_id"),
                F.col("cb").alias("pick1"),
                "sim",
            ),
            ["query_id", "cand_id", "pick1"],
        )
    )
    s2 = argmax(rest1, lam * F.col("rel") - om * F.col("sim"))
    p2 = s2.select("query_id", F.col("cand_id").alias("pick2"))
    rest2 = (
        slim.join(F.broadcast(p1), "query_id")
        .join(F.broadcast(p2), "query_id")
        .where(
            (F.col("cand_id") != F.col("pick1"))
            & (F.col("cand_id") != F.col("pick2"))
        )
        .join(
            sims.select(
                "query_id",
                F.col("ca").alias("cand_id"),
                F.col("cb").alias("pick1"),
                F.col("sim").alias("sim1"),
            ),
            ["query_id", "cand_id", "pick1"],
        )
        .join(
            sims.select(
                "query_id",
                F.col("ca").alias("cand_id"),
                F.col("cb").alias("pick2"),
                F.col("sim").alias("sim2"),
            ),
            ["query_id", "cand_id", "pick2"],
        )
    )
    s3 = argmax(
        rest2, lam * F.col("rel") - om * F.greatest(F.col("sim1"), F.col("sim2"))
    )
    out = (
        s1.withColumn("position", F.lit(1))
        .unionByName(s2.withColumn("position", F.lit(2)))
        .unionByName(s3.withColumn("position", F.lit(3)))
    )
    return out.select(
        "query_id",
        "position",
        "cand_id",
        "rel",
        rnd("mmr_score", 6).alias("mmr_score"),
    ).orderBy("query_id", "position")


_HAM_MOD = 83
_RECALL_K = 5

_SIG_SQL = """
  list_reduce(list_transform(range(1, 33),
      i -> CASE WHEN {v}[i] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END),
      (a, b) -> a + b) AS lo,
  list_reduce(list_transform(range(33, 65),
      i -> CASE WHEN {v}[i] > 0 THEN (1::BIGINT << (i - 33)) ELSE 0 END),
      (a, b) -> a + b) AS hi
"""


def _hamming_recall_oracle() -> str:
    k = _RECALL_K
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v,
         sqrt(list_reduce(list_transform(embedding, x -> (x::DOUBLE) * (x::DOUBLE)),
                          (a, b) -> a + b)) AS norm
  FROM embeddings
), sig AS (
  SELECT vec_id, {_SIG_SQL.format(v='v')}
  FROM e
), q AS (
  SELECT e.vec_id AS query_id, e.v AS qv, e.norm AS qn, s.lo AS qlo, s.hi AS qhi
  FROM e JOIN sig s ON s.vec_id = e.vec_id
  WHERE e.vec_id % {_HAM_MOD} = 0
), true_top AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, e.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_cos('q.qv', 'q.qn', 'e.v', 'e.norm')} DESC,
                      e.vec_id) AS r
    FROM q JOIN e ON e.vec_id <> q.query_id) t
  WHERE r <= {k}
), ham_top AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, s.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY bit_count(xor(q.qlo, s.lo)) + bit_count(xor(q.qhi, s.hi)),
                      s.vec_id) AS r
    FROM q JOIN sig s ON s.vec_id <> q.query_id) t
  WHERE r <= {k}
)
SELECT t.query_id,
       count(h.cand_id)::BIGINT AS n_overlap,
       round(5e-10 + count(h.cand_id) * 1.0 / {k}, 6) AS recall_at_{k}
FROM true_top t
LEFT JOIN ham_top h ON h.query_id = t.query_id AND h.cand_id = t.cand_id
GROUP BY t.query_id
ORDER BY t.query_id
"""


@register(
    "sim_binary_hamming_recall",
    shape="bounded",
    tags=("similarity", "ann", "quantization"),
    oracle=_hamming_recall_oracle(),
)
def sim_binary_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (1-bit) embedding quantization audit: pack each vector's
    sign pattern into two 32-bit halves, rank candidates by Hamming
    distance, and measure recall@5 against exact float cosine — the
    64x-memory-compression end of the quantization spectrum next to
    q_embed_quantize's int8.  At 100 TB the signature table is 16 bytes
    a row and the XOR+popcount ranking is integer-only; this query
    reports exactly how much ranking quality that buys away.  Signature
    packing, distances, and tie-breaks are integer arithmetic —
    bit-identical across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ),
    )

    def pack(lo_bit: int) -> F.Column:
        return F.aggregate(
            F.sequence(F.lit(lo_bit), F.lit(lo_bit + 31)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.element_at(F.col("v"), (i + 1).cast("int")) > 0,
                # shiftleft needs a literal shift amount; pow is exact
                # for exponents <= 31 so the cast is loss-free
                F.pow(F.lit(2.0), i - lo_bit).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )

    sig = e.select("vec_id", "v", "norm", pack(0).alias("lo"), pack(32).alias("hi"))
    q = sig.where(F.col("vec_id") % _HAM_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    wq = W.partitionBy("query_id")
    true_top = (
        sig.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "r",
            F.row_number().over(
                wq.orderBy(
                    F.desc(
                        cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("norm"))
                    ),
                    "vec_id",
                )
            ),
        )
        .where(F.col("r") <= _RECALL_K)
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    ham = F.expr("bit_count(qlo ^ lo) + bit_count(qhi ^ hi)")
    ham_top = (
        sig.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("r", F.row_number().over(wq.orderBy(ham, "vec_id")))
        .where(F.col("r") <= _RECALL_K)
        .select("query_id", F.col("vec_id").alias("cand_id"), F.lit(1).alias("hit"))
    )
    return (
        true_top.join(ham_top, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_overlap"),
            rnd(
                F.sum(F.coalesce("hit", F.lit(0))) * 1.0 / _RECALL_K, 6
            ).alias(f"recall_at_{_RECALL_K}"),
        )
        .orderBy("query_id")
    )


_JL_K = 8  # projection dimensions
_JL_MOD = 7  # 1-in-7 deterministic id sample (same knob as sim_cos_histogram)


def _jl_oracle() -> str:
    from redis_streams_spark.functions.hashing import h32_sql

    def proj(p: int, v: str) -> str:
        h = h32_sql(f"'jl{p}:' || d::VARCHAR")
        w = f"({h} / 2147483648.0 - 1.0)"
        return (
            f"list_reduce(list_transform(range(0, len({v})),"
            f" d -> {v}[d + 1] * {w}), (a, b) -> a + b)"
        )

    ys = ",\n         ".join(
        f"{proj(p, 'v')} AS y{p}" for p in range(_JL_K)
    )
    d2_proj = " + ".join(f"(a.y{p} - b.y{p}) * (a.y{p} - b.y{p})" for p in range(_JL_K))
    return f"""
WITH s AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings WHERE vec_id % {_JL_MOD} = 0
), proj AS (
  SELECT vec_id, v,
         {ys}
  FROM s
), pairs AS (
  SELECT sqrt(3.0 / {_JL_K}) * sqrt(d2p) / sqrt(d2t) AS ratio
  FROM (
    SELECT {d2_proj} AS d2p,
           list_reduce(
             list_transform(range(1, len(a.v) + 1),
                            i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])),
             (x, y) -> x + y) AS d2t
    FROM proj a JOIN proj b ON b.vec_id > a.vec_id
  ) p
  -- duplicate vectors (zero true distance) have no defined ratio:
  -- excluded on BOTH engines (Spark 0/0 -> NULL vs DuckDB NaN would
  -- diverge; second r09 review pass)
  WHERE d2t > 0
)
SELECT floor(ratio * 10)::BIGINT AS bin, count(*)::BIGINT AS n_pairs,
       {rnd_sql('avg(ratio)', 6)} AS avg_ratio
FROM pairs GROUP BY 1
ORDER BY bin
"""


@register(
    "sim_jl_distortion",
    shape="bounded",
    tags=("similarity", "ann", "diagnostics", "projection"),
    oracle=_jl_oracle(),
)
def sim_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random-projection distortion audit: project
    the 64-dim embeddings to {8} dims with deterministic md5-derived
    uniform[-1,1) planes (same no-RNG construction as sign-LSH, so the
    SQL oracle builds identical planes), then histogram the ratio of
    scaled projected distance to true euclidean distance over the fixed
    1-in-{7} id-sample pair set.  A tight unimodal ratio bulk around 1.0
    says the cheap 8-dim prefilter preserves neighborhoods; heavy tails
    say raise K before trusting a projected index.  The quadratic pair
    join runs ONLY over the fixed sample (the modulus is the knob);
    projections are per-vector scan work, left-to-right folds identical
    on both engines."""
    from redis_streams_spark.operators.similarity import hyperplane_dot

    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % _JL_MOD == 0
    )
    v = F.transform("embedding", lambda x: x.cast("double"))
    s = e.select(
        "vec_id",
        v.alias("v"),
        F.array(
            *[hyperplane_dot(v, p, prefix="jl") for p in range(_JL_K)]
        ).alias("y"),
    )
    a = s.select(
        F.col("vec_id").alias("aid"), F.col("v").alias("av"), F.col("y").alias("ay")
    )
    b = s.select(
        F.col("vec_id").alias("bid"), F.col("v").alias("bv"), F.col("y").alias("by")
    )
    d2 = lambda u, w: F.aggregate(  # noqa: E731
        F.zip_with(u, w, lambda x, z: (x - z) * (x - z)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, F.col("bid") > F.col("aid"))
        .select(
            d2(F.col("ay"), F.col("by")).alias("d2p"),
            d2(F.col("av"), F.col("bv")).alias("d2t"),
        )
        # duplicate vectors (zero true distance) have no defined ratio:
        # excluded on BOTH engines (second r09 review pass)
        .where(F.col("d2t") > 0)
        .select(
            (
                F.sqrt(F.lit(3.0 / _JL_K)) * F.sqrt(F.col("d2p"))
                / F.sqrt(F.col("d2t"))
            ).alias("ratio")
        )
    )
    return (
        pairs.groupBy(F.floor(F.col("ratio") * 10).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            rnd(F.avg("ratio"), 6).alias("avg_ratio"),
        )
        .orderBy("bin")
    )
