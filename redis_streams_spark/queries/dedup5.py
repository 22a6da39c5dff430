"""Round-8 dedup-tuning wave: LSH band/row S-curve tuning, minhash
signature-agreement accuracy, PSI value drift, and the dedup tier
summary — the knob-turning views on the dedup stack.

Reference basis: none (SURVEY §2.2 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import MINHASH_COEFFS
from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.dedup import minhash_bands_cte
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_NPERM = len(MINHASH_COEFFS)
_CONFIGS = ((16, 2), (8, 4), (4, 8))  # (bands, rows_per_band) over 32 perms
_JACC_T = 0.3


def _config_bands_sql(bands: int, rows: int) -> str:
    """Band rows for one (bands, rows) config from the shared sigs CTE."""
    selects = []
    for b in range(bands):
        concat = " || ',' || ".join(
            f"m{b * rows + r}::VARCHAR" for r in range(rows)
        )
        selects.append(
            f"SELECT doc_id, {b} AS band_idx, md5({concat}) AS band_hash FROM sigs"
        )
    return "\n  UNION ALL\n".join(selects)


def _band_tuning_oracle() -> str:
    ctes, per_config = [], []
    for bands, rows in _CONFIGS:
        ctes.append(
            f"cfg{bands} AS MATERIALIZED (\n{_config_bands_sql(bands, rows)}\n)"
        )
        per_config.append(
            f"""
SELECT {bands} AS bands, {rows} AS rows_per_band,
       count(*)::BIGINT AS n_candidates,
       sum(CASE WHEN jac >= {_JACC_T} THEN 1 ELSE 0 END)::BIGINT AS n_verified,
       {rnd_sql(f'avg(CASE WHEN jac >= {_JACC_T} THEN 1.0 ELSE 0.0 END)', 6)}
         AS precision
FROM (
  SELECT c.a_id, c.b_id,
         len(list_intersect(sa.s, sb.s)) * 1.0 /
         greatest(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)), 1)
           AS jac
  FROM (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM cfg{bands} a
    JOIN cfg{bands} b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
  ) c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
)"""
        )
    cte_block = ",\n".join(ctes)
    unions = "\nUNION ALL\n".join(per_config)
    return f"""
WITH {minhash_bands_cte()},
{cte_block}
SELECT * FROM (
{unions}
)
ORDER BY bands DESC
"""


@register(
    "dedup_lsh_band_tuning",
    shape="bounded",
    tags=("dedup", "lsh", "tuning"),
    oracle=_band_tuning_oracle(),
)
def dedup_lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band/row S-curve tuning: re-band the SAME 32-perm signatures
    as 16x2 / 8x4 / 4x8 and report candidate volume vs verified-pair
    precision for each — the collision-probability trade
    (P = 1-(1-j^r)^b) measured on real data instead of read off the
    theory curve.  More rows per band = fewer, higher-precision
    candidates.  The signature build runs ONCE (persisted); each config
    adds one band-keyed self-join over signature-sized rows."""
    from redis_streams_spark.operators.dedup import (
        exact_jaccard_cols,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_sets,
    )

    docs = load_table(spark, sf_dir, "documents")
    # sigs stays persisted — a SMALL frame (doc_id × 32 longs) consumed
    # by all three band configs, each of which would otherwise re-run
    # the full explode+permute+groupBy signature pipeline.  The
    # corpus-sized shingle frame is NOT persisted (r13 optimization,
    # guide §5 — the §15 minhash_lsh_pairs finding): its consumers
    # (signature build + both verify sides) pipeline the cheap codegen
    # re-tokenize, while a persist serializes the pass behind a
    # corpus-sized cache build (interleaved fresh-process A/B at sf0.1,
    # 8 reps both orders: shingle-persist median 6.61 s vs no-persist
    # 5.50 s, no-persist wins 6/8 head-to-heads).
    sets_ = shingle_sets(docs, 3)
    sigs = minhash_signatures(sets_).persist()
    sa = sets_.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa"))
    sb = sets_.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb"))
    _, jac = exact_jaccard_cols()

    outs = []
    for bands, rows in _CONFIGS:
        band_arr = F.array(
            *[
                F.xxhash64(
                    *[F.col(f"m{b * rows + r}") for r in range(rows)]
                )
                for b in range(bands)
            ]
        )
        brows = sigs.select(
            "doc_id", F.posexplode(band_arr).alias("band_idx", "band_hash")
        )
        cands = lsh_candidate_pairs(brows)
        verified = cands.join(sa, "a_id").join(sb, "b_id").select(
            (jac >= _JACC_T).cast("int").alias("ok")
        )
        outs.append(
            verified.agg(
                F.lit(bands).alias("bands"),
                F.lit(rows).alias("rows_per_band"),
                F.count(F.lit(1)).alias("n_candidates"),
                F.sum("ok").alias("n_verified"),
                rnd(F.avg(F.col("ok").cast("double")), 6).alias("precision"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy(F.desc("bands"))


def _accuracy_oracle() -> str:
    agree = " + ".join(
        f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END" for j in range(_NPERM)
    )
    return f"""
WITH {minhash_bands_cte()},
cands AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
), scored AS (
  SELECT c.a_id, c.b_id,
         ({agree}) * 1.0 / {_NPERM} AS est_jac,
         len(list_intersect(sa.s, sb.s)) * 1.0 /
         greatest(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)), 1)
           AS exact_jac
  FROM cands c
  JOIN sigs a ON a.doc_id = c.a_id
  JOIN sigs b ON b.doc_id = c.b_id
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
)
SELECT count(*)::BIGINT AS n_pairs,
       {rnd_sql('avg(est_jac)', 6)} AS mean_est,
       {rnd_sql('avg(exact_jac)', 6)} AS mean_exact,
       {rnd_sql('avg(abs(est_jac - exact_jac))', 6)} AS mean_abs_err,
       sum(CASE WHEN abs(est_jac - exact_jac) <= 0.1 THEN 1 ELSE 0 END)::BIGINT
         AS n_within_010,
       sum(CASE WHEN abs(est_jac - exact_jac) <= 0.2 THEN 1 ELSE 0 END)::BIGINT
         AS n_within_020
FROM scored
"""


@register(
    "dedup_minhash_accuracy",
    shape="bounded",
    tags=("dedup", "lsh", "audit"),
    oracle=_accuracy_oracle(),
)
def dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator audit: for every LSH candidate pair, the
    signature-agreement Jaccard estimate (matching perms / 32) against
    the exact shingle-set Jaccard — E[agreement] = J is the minhash
    theorem; this measures its finite-sample error (expected spread
    ~1/sqrt(32) ≈ 0.18) on real candidates.  One signature equi-join +
    one shingle verify join over the (linear) candidate list."""
    from redis_streams_spark.operators.dedup import (
        band_rows_from_sets,
        exact_jaccard_cols,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_sets,
    )

    docs = load_table(spark, sf_dir, "documents")
    # same shape decision as dedup_lsh_band_tuning above: keep the
    # small signature persist (consumed by band rows + both signature
    # join sides), drop the corpus-sized shingle persist (§15 class;
    # interleaved fresh-process A/B at sf0.1, 6 reps both orders:
    # persist median 4.89 s vs no-persist 4.67 s, no-persist 4/6).
    sets_ = shingle_sets(docs, 3)
    sigs = minhash_signatures(sets_).persist()
    brows = band_rows_from_sets(sets_)
    cands = lsh_candidate_pairs(brows)
    siga = sigs.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(f"m{j}").alias(f"am{j}") for j in range(_NPERM)],
    )
    sigb = sigs.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(f"m{j}").alias(f"bm{j}") for j in range(_NPERM)],
    )
    sa = sets_.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa"))
    sb = sets_.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb"))
    agree = sum(
        (F.col(f"am{j}") == F.col(f"bm{j}")).cast("int") for j in range(_NPERM)
    )
    _, exact_jac = exact_jaccard_cols()
    scored = (
        cands.join(siga, "a_id")
        .join(sigb, "b_id")
        .join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            (agree * 1.0 / _NPERM).alias("est_jac"),
            exact_jac.alias("exact_jac"),
        )
    )
    err = F.abs(F.col("est_jac") - F.col("exact_jac"))
    return scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        rnd(F.avg("est_jac"), 6).alias("mean_est"),
        rnd(F.avg("exact_jac"), 6).alias("mean_exact"),
        rnd(F.avg(err), 6).alias("mean_abs_err"),
        F.sum((err <= 0.1).cast("int")).alias("n_within_010"),
        F.sum((err <= 0.2).cast("int")).alias("n_within_020"),
    )


def _psi_oracle() -> str:
    from redis_streams_spark.functions.binning import log_bin_index_sql

    idx_expr = log_bin_index_sql("value")
    return f"""
WITH days AS (
  SELECT min(epoch_ms(ts) // 86400000) AS d0,
         max(epoch_ms(ts) // 86400000) AS d1
  FROM events
), halves AS (
  SELECT event_type,
         CASE WHEN epoch_ms(ts) // 86400000 < (d.d0 + d.d1 + 1) // 2
              THEN 0 ELSE 1 END AS half,
         {idx_expr} AS bin
  FROM events CROSS JOIN days d
), bin_counts AS (
  SELECT event_type, half, bin, count(*) AS c
  FROM halves GROUP BY 1, 2, 3
), shares AS (
  SELECT event_type, bin,
         max(CASE WHEN half = 0 THEN c END) * 1.0 /
           sum(sum(CASE WHEN half = 0 THEN c ELSE 0 END))
             OVER (PARTITION BY event_type) AS p,
         max(CASE WHEN half = 1 THEN c END) * 1.0 /
           sum(sum(CASE WHEN half = 1 THEN c ELSE 0 END))
             OVER (PARTITION BY event_type) AS q
  FROM bin_counts
  GROUP BY event_type, bin
)
SELECT event_type,
       count(*)::BIGINT AS n_bins_used,
       sum(CASE WHEN p IS NOT NULL AND q IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_bins_shared,
       {rnd_sql(
           "sum(CASE WHEN p IS NOT NULL AND q IS NOT NULL"
           " THEN (p - q) * ln(p / q) ELSE 0 END)",
           6,
       )} AS psi
FROM shares
GROUP BY event_type
ORDER BY event_type
"""


@register("q_psi_drift", shape="bounded", tags=("drift", "stats", "monitoring"), oracle=_psi_oracle())
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the time range, per event type — the industry-standard drift score
    (PSI < 0.1 stable, > 0.25 shifted) next to the JS divergence the
    streaming drift monitor emits.  Bins are the shared cross-engine
    log-histogram (deterministic, mergeable); bins present in only one
    half contribute 0 and are counted separately (n_bins_used vs
    n_bins_shared) so a vanishing bin is visible rather than infinite.
    Shape: one (type, half, bin) aggregate; everything after is windows
    over ≤289 bins per type."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / F.lit(86400000)).cast("long")
    days = ev.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    from redis_streams_spark.functions.binning import log_bin_index_col

    idx = log_bin_index_col(F.col("value"))
    halves = ev.crossJoin(F.broadcast(days)).select(
        "event_type",
        F.when(day < ((F.col("d0") + F.col("d1") + 1) / 2).cast("long"), 0)
        .otherwise(1)
        .alias("half"),
        idx.alias("bin"),
    )
    bin_counts = halves.groupBy("event_type", "half", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    wt = W.partitionBy("event_type")
    shares = bin_counts.groupBy("event_type", "bin").agg(
        F.max(F.when(F.col("half") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("half") == 1, F.col("c"))).alias("c1"),
    ).select(
        "event_type",
        "bin",
        (F.col("c0") * 1.0 / F.sum(F.coalesce("c0", F.lit(0))).over(wt)).alias("p"),
        (F.col("c1") * 1.0 / F.sum(F.coalesce("c1", F.lit(0))).over(wt)).alias("q"),
    )
    both = F.col("p").isNotNull() & F.col("q").isNotNull()
    return (
        shares.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_bins_used"),
            F.sum(both.cast("int")).alias("n_bins_shared"),
            rnd(
                F.sum(
                    F.when(
                        both,
                        (F.col("p") - F.col("q"))
                        * F.log(F.col("p") / F.col("q")),
                    ).otherwise(0.0)
                ),
                6,
            ).alias("psi"),
        )
        .orderBy("event_type")
    )


def _tier_summary_oracle() -> str:
    from redis_streams_spark.queries.dedup import _NORM_SQL, _SIMHASH_CORE

    # the simhash core fragment's CTE names collide with the minhash
    # fragment's (both define toks/hv) — prefix the simhash ones
    simhash_core = _SIMHASH_CORE
    for name in ("toks", "tf", "hv", "bits", "votes"):
        simhash_core = simhash_core.replace(f"{name} AS", f"sx_{name} AS")
        simhash_core = simhash_core.replace(f"FROM {name}", f"FROM sx_{name}")

    return f"""
WITH {minhash_bands_cte()},
exact_groups AS (
  SELECT md5({_NORM_SQL}) AS ch, count(*) AS sz FROM documents GROUP BY 1
),
mh_pairs AS (
  SELECT c.a_id, c.b_id FROM (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id) c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
  WHERE round(5e-10 + len(list_intersect(sa.s, sb.s)) * 1.0 /
        greatest(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)), 1),
        6) >= {_JACC_T}
),
{simhash_core.lstrip()},
sh_bytes AS (
  SELECT doc_id, simhash, b AS byte_idx, (simhash >> (b * 8)) & 255 AS byte_val
  FROM sim, (SELECT unnest(range(0, 4)) AS b) bs
),
sh_pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sh_bytes a JOIN sh_bytes b
    ON a.byte_idx = b.byte_idx AND a.byte_val = b.byte_val
   AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
)
SELECT * FROM (
  SELECT 'exact' AS tier,
         sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END)::BIGINT AS n_units,
         sum(CASE WHEN sz > 1 THEN sz ELSE 0 END)::BIGINT AS n_docs_affected
  FROM exact_groups
  UNION ALL
  SELECT 'minhash', count(*)::BIGINT,
         (SELECT count(DISTINCT d)::BIGINT FROM (
            SELECT a_id AS d FROM mh_pairs UNION SELECT b_id FROM mh_pairs))
  FROM mh_pairs
  UNION ALL
  SELECT 'simhash', count(*)::BIGINT,
         (SELECT count(DISTINCT d)::BIGINT FROM (
            SELECT a_id AS d FROM sh_pairs UNION SELECT b_id FROM sh_pairs))
  FROM sh_pairs
)
ORDER BY tier
"""


@register(
    "dedup_tier_summary",
    shape="bounded",
    tags=("dedup", "audit", "llm-pipeline"),
    oracle=_tier_summary_oracle(),
)
def dedup_tier_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-glance dedup dashboard: how much duplication each tier of
    the stack sees — exact (normalized-hash groups > 1), minhash
    (verified near-dup pairs at J ≥ 0.3), simhash (byte-banded pairs at
    Hamming ≤ 3) — as units found + docs touched.  Each tier reuses its
    production operator unchanged; the point is the single comparable
    table (the first question every dedup review asks)."""
    from redis_streams_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    # NB: deliberately NOT .persist() (r13 optimization round): persisting
    # the BASE table registers it in the CacheManager at construction
    # time, which silently substitutes an InMemoryRelation into every
    # later documents-scanning plan in the session — parquet pushdown
    # and pruning vanish from queries that never asked for a cache, and
    # with load_table's memoized plan the substitution hits ALL of them.
    # Each tier scans the columnar source instead (3 pruned scans; a
    # 100-TB corpus would not fit a cache anyway).  The per-tier derived
    # persists below are query-local subtrees and stay.
    docs = load_table(spark, sf_dir, "documents")
    eg = (
        exact_dedup(docs)
        .where(F.col("group_size") > 1)
        .agg(
            F.lit("exact").alias("tier"),
            F.countDistinct("content_hash").alias("n_units"),
            F.count(F.lit(1)).alias("n_docs_affected"),
        )
    )

    def pair_tier(pairs: DataFrame, name: str) -> DataFrame:
        ids = pairs.select(F.col("a_id").alias("d")).unionByName(
            pairs.select(F.col("b_id").alias("d"))
        )
        return pairs.agg(
            F.lit(name).alias("tier"),
            F.count(F.lit(1)).alias("n_units"),
        ).crossJoin(
            ids.agg(F.countDistinct("d").alias("n_docs_affected"))
        )

    mh = minhash_lsh_pairs(docs, threshold=_JACC_T).where("is_dup").select(
        "a_id", "b_id"
    ).persist()
    sh = simhash_pairs(docs, max_hamming=3).select("a_id", "b_id").persist()
    return (
        eg.unionByName(pair_tier(mh, "minhash"))
        .unionByName(pair_tier(sh, "simhash"))
        .orderBy("tier")
    )
