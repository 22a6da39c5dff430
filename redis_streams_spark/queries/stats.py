"""Round-7 statistical-test operators: Kendall tau-b, Spearman rho,
Mann-Whitney U, two-sample Kolmogorov-Smirnov, 1-D Wasserstein distance,
one-way ANOVA, and the Wald-Wolfowitz runs test.

The hypothesis-testing toolkit every experimentation / drift-monitoring
pipeline carries (complementing ``q_ab_test`` (Welch t) and
``q_chisq_independence``).  Scale discipline shared by all seven: the
corpus reduces to a BOUNDED frame first — a day-keyed series (≤ n_days
rows), a distinct-value histogram (≤ |values| rows), or per-group moment
sums (≤ |groups| rows) — and every global window or pairwise join runs
over that bounded frame only, so each query is corpus-scale-free past
its first aggregate.  Rank statistics use the histogram-rank identity
(cumulative counts over the distinct-value frame give average ranks)
instead of a global per-row sort, which is what makes Mann-Whitney/KS
viable at 100 TB.  Reference basis: none (redis-streams has no
analytics surface); formulas are the textbook estimators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.operators.prefix import (
    NCHARS_BUCKET,
    bucketed_cumsum,
    bucketed_lead,
)
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_DAY_MS = 86_400_000
# Prefix-sum bucket width over the document-length axis (n_chars spans
# ~44-577 → ~35 buckets; see operators/prefix.py for the shape).
_VAL_BUCKET = NCHARS_BUCKET

# Daily 2-series frame: revenue + event count per day.
_DAILY2_SQL = f"""
  SELECT epoch_ms(ts) // {_DAY_MS} AS day,
         sum(value) AS v, count(*)::BIGINT AS n
  FROM events GROUP BY 1
"""


def _daily2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.expr(_MS) / _DAY_MS).cast("long").alias("day")
    ).agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("n"))


@register(
    "q_kendall_tau",
    shape="bounded",
    tags=("stats", "correlation", "rank"),
    oracle=f"""
WITH d AS ({_DAILY2_SQL}),
p AS (
  SELECT a.v AS av, a.n AS an, b.v AS bv, b.n AS bn
  FROM d a JOIN d b ON b.day > a.day
), agg AS (
  SELECT count(*)::BIGINT AS n_pairs,
         sum(CASE WHEN (av - bv) * (an - bn) > 0 THEN 1 ELSE 0 END)::BIGINT
           AS concordant,
         sum(CASE WHEN (av - bv) * (an - bn) < 0 THEN 1 ELSE 0 END)::BIGINT
           AS discordant,
         sum(CASE WHEN av = bv THEN 1 ELSE 0 END)::DOUBLE AS tie_x,
         sum(CASE WHEN an = bn THEN 1 ELSE 0 END)::DOUBLE AS tie_y
  FROM p
)
SELECT (SELECT count(*) FROM d)::BIGINT AS n_days,
       n_pairs, concordant, discordant,
       {rnd_sql('(concordant - discordant) / '
                'sqrt((n_pairs - tie_x) * (n_pairs - tie_y))', 6)} AS tau_b
FROM agg
""",
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily revenue and daily
    event count — the tie-corrected concordance measure monitoring uses
    when outliers make Pearson meaningless ("do busier days earn more").

    Scale shape: the corpus reduces to one row per day FIRST; the
    pairwise concordance join is over that ≤ n_days frame (deliberately
    quadratic IN DAYS, same contract as q_theil_sen) — corpus-scale-free."""
    d = _daily2(spark, sf_dir)
    a = d.select(F.col("day").alias("ad"), F.col("v").alias("av"), F.col("n").alias("an"))
    b = d.select(F.col("day").alias("bd"), F.col("v").alias("bv"), F.col("n").alias("bn"))
    prod = (F.col("av") - F.col("bv")) * (F.col("an") - F.col("bn"))
    agg = (
        a.join(b, F.col("bd") > F.col("ad"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(prod > 0, 1).otherwise(0)).cast("long").alias("concordant"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).cast("long").alias("discordant"),
            F.sum(F.when(F.col("av") == F.col("bv"), 1).otherwise(0))
            .cast("double").alias("tie_x"),
            F.sum(F.when(F.col("an") == F.col("bn"), 1).otherwise(0))
            .cast("double").alias("tie_y"),
        )
    )
    n_days = d.agg(F.count(F.lit(1)).alias("n_days"))
    return agg.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        "n_pairs",
        "concordant",
        "discordant",
        rnd(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt(
                (F.col("n_pairs") - F.col("tie_x"))
                * (F.col("n_pairs") - F.col("tie_y"))
            ),
            6,
        ).alias("tau_b"),
    )


@register(
    "q_spearman_daily",
    shape="bounded",
    tags=("stats", "correlation", "rank"),
    oracle=f"""
WITH d AS ({_DAILY2_SQL}),
r AS (
  SELECT rank() OVER (ORDER BY v)
           + (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS rx,
         rank() OVER (ORDER BY n)
           + (count(*) OVER (PARTITION BY n) - 1) / 2.0 AS ry
  FROM d
)
SELECT count(*)::BIGINT AS n_days, {rnd_sql('corr(rx, ry)', 6)} AS rho
FROM r
""",
)
def q_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily revenue and daily event
    count: Pearson correlation of average ranks (fractional ranks for
    ties) — the monotone-association measure, robust to any monotone
    transform of either series.

    Scale shape: rank windows run over the day-keyed aggregate
    (≤ n_days rows, the bounded-global-window shape the fleet plan gate
    admits), then one corr() aggregate."""
    d = _daily2(spark, sf_dir)
    rx = F.rank().over(W.orderBy("v")) + (
        F.count(F.lit(1)).over(W.partitionBy("v")) - 1
    ) / 2.0
    ry = F.rank().over(W.orderBy("n")) + (
        F.count(F.lit(1)).over(W.partitionBy("n")) - 1
    ) / 2.0
    r = d.select(rx.alias("rx"), ry.alias("ry"))
    return r.agg(
        F.count(F.lit(1)).alias("n_days"),
        rnd(F.corr("rx", "ry"), 6).alias("rho"),
    )


@register(
    "q_mann_whitney",
    shape="bounded+prefix_sum",
    tags=("stats", "hypothesis-test", "rank"),
    oracle=f"""
WITH g AS (
  SELECT n_chars AS val, count(*)::BIGINT AS cnt FROM documents GROUP BY 1
), r AS (
  SELECT val, cnt,
         sum(cnt) OVER (ORDER BY val
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + (cnt + 1) / 2.0 AS avg_rank
  FROM g
), t AS (
  SELECT sum(cnt)::DOUBLE AS n_total,
         sum(cnt::DOUBLE * cnt * cnt - cnt)::DOUBLE AS tie_term
  FROM g
), s AS (
  SELECT source, n_chars AS val, count(*)::BIGINT AS cs
  FROM documents GROUP BY 1, 2
), rs AS (
  SELECT s.source, sum(s.cs)::BIGINT AS n_docs,
         sum(s.cs * r.avg_rank) AS rank_sum
  FROM s JOIN r USING (val) GROUP BY 1
)
SELECT source, n_docs,
       {rnd_sql('rank_sum - n_docs::DOUBLE * (n_docs + 1) / 2.0', 2)} AS u_stat,
       {rnd_sql('''(rank_sum - n_docs::DOUBLE * (n_docs + 1) / 2.0
                    - n_docs::DOUBLE * (n_total - n_docs) / 2.0)
                   / sqrt(n_docs::DOUBLE * (n_total - n_docs) / 12.0
                          * ((n_total + 1)
                             - tie_term / (n_total * (n_total - 1))))''', 4)}
         AS z_score
FROM rs CROSS JOIN t ORDER BY source
""",
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (one-vs-rest, tie-corrected normal approximation)
    of document length per source: "does this source's length
    distribution differ from the rest of the corpus" — the
    distribution-shift alarm quality pipelines run per ingest batch.

    Scale shape: ranks come from the histogram-rank identity — the
    cumulative count over the DISTINCT-VALUE frame is an exact bucketed
    two-phase prefix sum (operators/prefix.py: within-bucket windows +
    broadcast bucket offsets, no empty-partition window anywhere), so
    no single task ever holds the whole histogram even when value
    cardinality grows with the corpus; per-source rank sums are then an
    equi-join on value against the broadcast rank table."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(F.col("n_chars").alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    r = bucketed_cumsum(
        g, "val", [("cnt", "cum_cnt", True)], _VAL_BUCKET
    ).select(
        "val",
        (
            F.col("cum_cnt") - F.col("cnt") + (F.col("cnt") + 1) / 2.0
        ).alias("avg_rank"),
    )
    t = g.agg(
        F.sum("cnt").cast("double").alias("n_total"),
        F.sum(
            F.col("cnt").cast("double") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).alias("tie_term"),
    )
    s = docs.groupBy("source", F.col("n_chars").alias("val")).agg(
        F.count(F.lit(1)).alias("cs")
    )
    rs = (
        s.join(F.broadcast(r), "val")
        .groupBy("source")
        .agg(
            F.sum("cs").cast("long").alias("n_docs"),
            F.sum(F.col("cs") * F.col("avg_rank")).alias("rank_sum"),
        )
    )
    nd = F.col("n_docs").cast("double")
    u = F.col("rank_sum") - nd * (F.col("n_docs") + 1) / 2.0
    mu = nd * (F.col("n_total") - nd) / 2.0
    sigma = F.sqrt(
        nd
        * (F.col("n_total") - nd)
        / 12.0
        * (
            (F.col("n_total") + 1)
            - F.col("tie_term")
            / (F.col("n_total") * (F.col("n_total") - 1))
        )
    )
    return (
        rs.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            rnd(u, 2).alias("u_stat"),
            rnd((u - mu) / sigma, 4).alias("z_score"),
        )
        .orderBy("source")
    )


# Shared frame for the two ECDF-distance tests: the two lexicographically
# first sources, their per-distinct-length counts, and cumulative ECDFs.
_ECDF_SQL = """
WITH two AS (
  SELECT source FROM documents GROUP BY source ORDER BY source LIMIT 2
), ss AS (
  SELECT min(source) AS s1, max(source) AS s2 FROM two
), d AS (
  SELECT d.n_chars AS val,
         sum(CASE WHEN d.source = ss.s1 THEN 1 ELSE 0 END)::DOUBLE AS c1,
         sum(CASE WHEN d.source = ss.s2 THEN 1 ELSE 0 END)::DOUBLE AS c2
  FROM documents d CROSS JOIN ss
  WHERE d.source = ss.s1 OR d.source = ss.s2
  GROUP BY 1
), n AS (
  SELECT sum(c1) AS n1, sum(c2) AS n2 FROM d
), e AS (
  SELECT val,
         sum(c1) OVER w / n.n1 AS f1,
         sum(c2) OVER w / n.n2 AS f2
  FROM d CROSS JOIN n
  WINDOW w AS (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
"""


def _ecdf_frames(spark: SparkSession, sf_dir: str):
    """(ss 1-row frame, per-value ECDF frame) for the two first sources.

    The source pair is COLLECTED (exactly 2 rows — the same bounded
    driver round-trip class as the BM25 router's term metadata) and
    inlined as literals (r13 optimization): the former 1-row ``ss``
    crossJoin embedded the whole distinct-sources subtree inside ``d``,
    which the stacked prefix-sum helpers then multiplied (the
    q_wasserstein_1d before-plan scanned documents 42 times), and a
    literal IN-filter additionally reaches the parquet scan as a pushed
    predicate, which ``source = scalar-subquery`` never did."""
    docs = load_table(spark, sf_dir, "documents")
    rows = (
        docs.select("source").distinct().orderBy("source").limit(2).collect()
    )
    vals = [r[0] for r in rows]
    s1 = vals[0] if vals else None
    s2 = vals[-1] if vals else None
    ss = spark.createDataFrame([(s1, s2)], "s1 string, s2 string")
    d = (
        docs.where(F.col("source").isin([v for v in (s1, s2) if v is not None]))
        .groupBy(F.col("n_chars").alias("val"))
        .agg(
            F.sum(F.when(F.col("source") == s1, 1).otherwise(0))
            .cast("double").alias("c1"),
            F.sum(F.when(F.col("source") == s2, 1).otherwise(0))
            .cast("double").alias("c2"),
        )
    )
    # (n1, n2) are exact integer counts in doubles — 1 bounded row;
    # LocalRelation it so the ECDF consumers' plans hold the corpus
    # subtree once (same rationale as the prefix-helper offsets).
    n = d.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    n = spark.createDataFrame(n.collect(), n.schema)
    # Exact bucketed prefix sums (operators/prefix.py) — the ECDF
    # cumulation never runs in a single empty-partition window task.
    cum = bucketed_cumsum(
        d, "val", [("c1", "cc1", True), ("c2", "cc2", True)], _VAL_BUCKET
    )
    e = cum.crossJoin(F.broadcast(n)).select(
        "val",
        "n1",
        "n2",
        (F.col("cc1") / F.col("n1")).alias("f1"),
        (F.col("cc2") / F.col("n2")).alias("f2"),
    )
    return ss, e


@register(
    "q_ks_test",
    shape="bounded+prefix_sum",
    tags=("stats", "hypothesis-test", "distribution"),
    oracle=_ECDF_SQL
    + f"""
SELECT (SELECT s1 FROM ss) AS src_a, (SELECT s2 FROM ss) AS src_b,
       (SELECT n1 FROM n)::BIGINT AS n_a, (SELECT n2 FROM n)::BIGINT AS n_b,
       {rnd_sql('max(abs(f1 - f2))', 6)} AS d_stat,
       {rnd_sql('sqrt((SELECT n1 * n2 / (n1 + n2) FROM n))'
                ' * max(abs(f1 - f2))', 4)} AS ks_scaled
FROM e
""",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the document-
    length distributions of the two lexicographically first sources:
    D = max |ECDF_a - ECDF_b|, plus the sqrt(n_a n_b/(n_a+n_b))·D scaling
    the KS significance tables take — the classic "did the distribution
    shift" test.

    Scale shape: both ECDFs come from ONE cumulative window over the
    distinct-length histogram (bounded by |distinct lengths|, not corpus
    rows); the source pair and the (n1, n2) totals are 1-row broadcast
    crossJoins."""
    ss, e = _ecdf_frames(spark, sf_dir)
    agg = e.agg(
        F.min("n1").alias("n1"),
        F.min("n2").alias("n2"),
        F.max(F.abs(F.col("f1") - F.col("f2"))).alias("d_raw"),
    )
    return agg.crossJoin(F.broadcast(ss)).select(
        F.col("s1").alias("src_a"),
        F.col("s2").alias("src_b"),
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        rnd(F.col("d_raw"), 6).alias("d_stat"),
        rnd(
            F.sqrt(F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")))
            * F.col("d_raw"),
            4,
        ).alias("ks_scaled"),
    )


@register(
    "q_wasserstein_1d",
    shape="bounded+prefix_sum",
    tags=("stats", "distribution", "distance"),
    oracle=_ECDF_SQL
    + f""", gaps AS (
  SELECT abs(f1 - f2) AS diff,
         lead(val) OVER (ORDER BY val) - val AS gap
  FROM e
)
SELECT (SELECT s1 FROM ss) AS src_a, (SELECT s2 FROM ss) AS src_b,
       {rnd_sql('sum(diff * gap)', 4)} AS w1_distance
FROM gaps WHERE gap IS NOT NULL
""",
)
def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between the same two
    length distributions: integral of |ECDF_a - ECDF_b| over the value
    axis (sum of ECDF gaps x value gaps on the discrete grid) — the
    magnitude-aware complement to KS's max-gap (KS says IF the
    distributions differ, W1 says by HOW MUCH in value units).

    Scale shape: identical bucketed-prefix-sum frame as q_ks_test; the
    value-grid lead() is the bucketed form too (operators/prefix.py
    bucketed_lead: within-bucket lead + next-occupied-bucket minima), so
    the plan has no empty-partition window at all."""
    ss, e = _ecdf_frames(spark, sf_dir)
    gaps = (
        bucketed_lead(e, "val", "next_val", _VAL_BUCKET)
        .select(
            F.abs(F.col("f1") - F.col("f2")).alias("diff"),
            (F.col("next_val") - F.col("val")).alias("gap"),
        )
        .where(F.col("gap").isNotNull())
    )
    return gaps.agg(rnd(F.sum(F.col("diff") * F.col("gap")), 4).alias("w1_distance")).crossJoin(
        F.broadcast(ss)
    ).select(
        F.col("s1").alias("src_a"),
        F.col("s2").alias("src_b"),
        "w1_distance",
    )


@register(
    "q_anova_oneway",
    shape="bounded",
    tags=("stats", "hypothesis-test"),
    oracle=f"""
WITH g AS (
  SELECT source, count(*)::DOUBLE AS n_g, sum(n_chars)::DOUBLE AS s_g,
         sum(n_chars::DOUBLE * n_chars) AS q_g
  FROM documents GROUP BY 1
), t AS (
  SELECT count(*)::BIGINT AS k, sum(n_g) AS n, sum(s_g) AS s,
         sum(q_g) AS q, sum(s_g * s_g / n_g) AS sb
  FROM g
)
SELECT k AS k_groups, n::BIGINT AS n_total,
       {rnd_sql('((sb - s * s / n) / (k - 1)) / ((q - sb) / (n - k))', 4)}
         AS f_stat,
       {rnd_sql('(sb - s * s / n) / (q - s * s / n)', 6)} AS eta_sq
FROM t
""",
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of document length across sources: F statistic
    (between-group vs within-group mean square) and eta-squared effect
    size — "does ANY source differ in mean length", the k-group
    generalization of the t-test.

    Scale shape: pure moment sums — one per-source aggregate (n, sum,
    sum-of-squares; partial-mergeable like any sum), one 1-row total —
    nothing global ever materializes."""
    docs = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("double")
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_g"),
        F.sum("n_chars").cast("double").alias("s_g"),
        F.sum(x * x).alias("q_g"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("sb"),
    )
    ssb = F.col("sb") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("sb")
    sst = F.col("q") - F.col("s") * F.col("s") / F.col("n")
    return t.select(
        F.col("k").alias("k_groups"),
        F.col("n").cast("long").alias("n_total"),
        rnd((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4).alias(
            "f_stat"
        ),
        rnd(ssb / sst, 6).alias("eta_sq"),
    )


@register(
    "q_runs_test",
    shape="bounded",
    tags=("stats", "hypothesis-test", "timeseries"),
    oracle=f"""
WITH d AS ({_DAILY2_SQL}),
m AS (SELECT median(v) AS med FROM d),
s AS (
  SELECT day, v > m.med AS above FROM d CROSS JOIN m WHERE v <> m.med
), r AS (
  SELECT above,
         CASE WHEN above IS DISTINCT FROM lag(above) OVER (ORDER BY day)
              THEN 1 ELSE 0 END AS chg
  FROM s
), agg AS (
  SELECT sum(CASE WHEN above THEN 1 ELSE 0 END)::DOUBLE AS n1,
         sum(CASE WHEN above THEN 0 ELSE 1 END)::DOUBLE AS n2,
         sum(chg)::BIGINT AS n_runs
  FROM r
)
SELECT n1::BIGINT AS n_above, n2::BIGINT AS n_below, n_runs,
       {rnd_sql('1 + 2 * n1 * n2 / (n1 + n2)', 4)} AS e_runs,
       {rnd_sql('''(n_runs - (1 + 2 * n1 * n2 / (n1 + n2)))
                   / sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                          / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)))''', 4)}
         AS z_score
FROM agg
""",
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue series: count the
    runs of consecutive above-/below-median days and compare to the
    randomness expectation — too FEW runs means trending/sticky days,
    too MANY means oscillation; the nonparametric "is this series
    random" check behind seasonality triage.

    Scale shape: one day-keyed aggregate, a 1-row median broadcast, one
    lag() over the ≤ n_days frame."""
    d = _daily2(spark, sf_dir)
    m = d.agg(F.median("v").alias("med"))
    s = (
        d.crossJoin(F.broadcast(m))
        .where(F.col("v") != F.col("med"))
        .select("day", (F.col("v") > F.col("med")).alias("above"))
    )
    lag = F.lag("above").over(W.orderBy("day"))
    r = s.select(
        "above",
        F.when(lag.isNull() | (lag != F.col("above")), 1).otherwise(0).alias("chg"),
    )
    agg = r.agg(
        F.sum(F.when(F.col("above"), 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("above"), 0).otherwise(1)).cast("double").alias("n2"),
        F.sum("chg").cast("long").alias("n_runs"),
    )
    e_runs = 1 + 2 * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2"))
    var = (
        2
        * F.col("n1")
        * F.col("n2")
        * (2 * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
        / (
            (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2") - 1)
        )
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        "n_runs",
        rnd(e_runs, 4).alias("e_runs"),
        rnd((F.col("n_runs") - e_runs) / F.sqrt(var), 4).alias("z_score"),
    )


@register(
    "q_levene_test",
    shape="bounded",
    tags=("stats", "hypothesis-test", "variance"),
    oracle=f"""
WITH med AS (
  SELECT source, median(n_chars) AS med FROM documents GROUP BY 1
), z AS (
  SELECT d.source, abs(d.n_chars - m.med) AS z
  FROM documents d JOIN med m USING (source)
), g AS (
  SELECT source, count(*)::DOUBLE AS n_g, sum(z) AS s_g, sum(z * z) AS q_g
  FROM z GROUP BY 1
), t AS (
  SELECT count(*)::BIGINT AS k, sum(n_g) AS n, sum(s_g) AS s,
         sum(q_g) AS q, sum(s_g * s_g / n_g) AS sb
  FROM g
)
SELECT k AS k_groups, n::BIGINT AS n_total,
       {rnd_sql('((sb - s * s / n) / (k - 1)) / ((q - sb) / (n - k))', 4)}
         AS w_stat
FROM t
""",
)
def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test for variance
    homogeneity of document length across sources: one-way ANOVA on the
    absolute deviations from each group's MEDIAN — the robust "are the
    spreads equal" check that gates whether ANOVA's equal-variance
    assumption holds at all.

    Scale shape: per-source medians are a tiny aggregate broadcast back
    onto the scan (20-row hash join); everything after is the same
    moment-sum ANOVA as q_anova_oneway — nothing global."""
    docs = load_table(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    z = docs.join(F.broadcast(med), "source").select(
        "source", F.abs(F.col("n_chars") - F.col("med")).alias("z")
    )
    g = z.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_g"),
        F.sum("z").alias("s_g"),
        F.sum(F.col("z") * F.col("z")).alias("q_g"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("sb"),
    )
    ssb = F.col("sb") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("sb")
    return t.select(
        F.col("k").alias("k_groups"),
        F.col("n").cast("long").alias("n_total"),
        rnd((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4).alias(
            "w_stat"
        ),
    )


@register(
    "q_cohens_d",
    shape="bounded",
    tags=("stats", "effect-size"),
    oracle="""
WITH two AS (
  SELECT source FROM documents GROUP BY source ORDER BY source LIMIT 2
), ss AS (
  SELECT min(source) AS s1, max(source) AS s2 FROM two
), g AS (
  SELECT d.source, count(*)::DOUBLE AS n, avg(d.n_chars) AS m,
         var_samp(d.n_chars) AS v
  FROM documents d CROSS JOIN ss
  WHERE d.source = ss.s1 OR d.source = ss.s2
  GROUP BY 1
), w AS (
  SELECT max(CASE WHEN source = (SELECT s1 FROM ss) THEN n END) AS n1,
         max(CASE WHEN source = (SELECT s1 FROM ss) THEN m END) AS m1,
         max(CASE WHEN source = (SELECT s1 FROM ss) THEN v END) AS v1,
         max(CASE WHEN source = (SELECT s2 FROM ss) THEN n END) AS n2,
         max(CASE WHEN source = (SELECT s2 FROM ss) THEN m END) AS m2,
         max(CASE WHEN source = (SELECT s2 FROM ss) THEN v END) AS v2
  FROM g
)
SELECT (SELECT s1 FROM ss) AS src_a, (SELECT s2 FROM ss) AS src_b,
       n1::BIGINT AS n_a, n2::BIGINT AS n_b,
       round(5e-10 + m1, 4) AS mean_a, round(5e-10 + m2, 4) AS mean_b,
       round(5e-10 + (m1 - m2)
             / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)), 6)
         AS cohens_d,
       round(5e-10 + (m1 - m2)
             / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
             * (1 - 3 / (4 * (n1 + n2) - 9)), 6) AS hedges_g
FROM w
""",
)
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g effect size between the document-length
    means of the two lexicographically first sources (pooled-variance
    standardized mean difference + small-sample correction) — the
    magnitude companion to the hypothesis tests: a significant p with a
    tiny d is noise you can ignore.

    Scale shape: two groups' (n, mean, var) moments — one aggregate —
    pivoted into a single row; everything else is scalar arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    two = docs.select("source").distinct().orderBy("source").limit(2)
    ss = two.agg(F.min("source").alias("s1"), F.max("source").alias("s2"))
    g = (
        docs.crossJoin(F.broadcast(ss))
        .where((F.col("source") == F.col("s1")) | (F.col("source") == F.col("s2")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("n_chars").alias("m"),
            F.var_samp("n_chars").alias("v"),
        )
    )
    w = g.crossJoin(F.broadcast(ss)).agg(
        F.max(F.when(F.col("source") == F.col("s1"), F.col("n"))).alias("n1"),
        F.max(F.when(F.col("source") == F.col("s1"), F.col("m"))).alias("m1"),
        F.max(F.when(F.col("source") == F.col("s1"), F.col("v"))).alias("v1"),
        F.max(F.when(F.col("source") == F.col("s2"), F.col("n"))).alias("n2"),
        F.max(F.when(F.col("source") == F.col("s2"), F.col("m"))).alias("m2"),
        F.max(F.when(F.col("source") == F.col("s2"), F.col("v"))).alias("v2"),
    )
    pooled = F.sqrt(
        ((F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2"))
        / (F.col("n1") + F.col("n2") - 2)
    )
    d = (F.col("m1") - F.col("m2")) / pooled
    corr_g = d * (1 - 3 / (4 * (F.col("n1") + F.col("n2")) - 9))
    return w.crossJoin(F.broadcast(ss)).select(
        F.col("s1").alias("src_a"),
        F.col("s2").alias("src_b"),
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        rnd(F.col("m1"), 4).alias("mean_a"),
        rnd(F.col("m2"), 4).alias("mean_b"),
        rnd(d, 6).alias("cohens_d"),
        rnd(corr_g, 6).alias("hedges_g"),
    )


@register(
    "q_mix_drift",
    shape="bounded",
    tags=("stats", "drift", "distribution"),
    oracle=f"""
WITH c AS (
  SELECT epoch_ms(ts) // {_DAY_MS} AS day, event_type,
         count(*)::DOUBLE AS n
  FROM events GROUP BY 1, 2
), days AS (
  SELECT day, sum(n) AS day_n FROM c GROUP BY 1
), types AS (
  SELECT event_type, sum(n) AS type_n FROM c GROUP BY 1
), tot AS (SELECT sum(n) AS total FROM c),
grid AS (
  SELECT d.day, d.day_n, t.event_type,
         t.type_n / tot.total AS q,
         coalesce(c.n, 0) / d.day_n AS p
  FROM days d CROSS JOIN types t CROSS JOIN tot
  LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
), terms AS (
  SELECT day, day_n,
         CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
           + 0.5 * q * ln(q / ((p + q) / 2)) AS term
  FROM grid
)
SELECT day * {_DAY_MS} AS day_ms, min(day_n)::BIGINT AS n_events,
       {rnd_sql('sum(term)', 6)} AS js_divergence
FROM terms GROUP BY day ORDER BY day_ms
""",
)
def q_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-mix drift: Jensen-Shannon divergence between each
    day's event-type distribution and the corpus-wide distribution —
    the drift alarm that fires when one day's traffic mix (not volume)
    departs from the baseline.  Missing (day, type) cells contribute
    their q-side JS term (the day is missing a type the corpus has),
    which is why the grid is densified before the fold.

    Scale shape: one (day, type) aggregate; the dense grid is
    |days| x |types| (bounded, built from two tiny aggregates + a 1-row
    total), left-joined back to the counts — corpus-scale-free past the
    first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        (F.expr(_MS) / _DAY_MS).cast("long").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    days = c.groupBy("day").agg(F.sum("n").alias("day_n"))
    types = c.groupBy("event_type").agg(F.sum("n").alias("type_n"))
    tot = c.agg(F.sum("n").alias("total"))
    grid = (
        days.crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(tot))
        .join(c, ["day", "event_type"], "left")
        .select(
            "day",
            "day_n",
            (F.col("type_n") / F.col("total")).alias("q"),
            (F.coalesce(F.col("n"), F.lit(0.0)) / F.col("day_n")).alias("p"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term = (
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m))
        .otherwise(F.lit(0.0))
        + 0.5 * F.col("q") * F.log(F.col("q") / m)
    )
    return (
        grid.select("day", "day_n", term.alias("term"))
        .groupBy("day")
        .agg(
            F.min("day_n").cast("long").alias("n_events"),
            rnd(F.sum("term"), 6).alias("js_divergence"),
        )
        .select(
            (F.col("day") * _DAY_MS).alias("day_ms"),
            "n_events",
            "js_divergence",
        )
        .orderBy("day_ms")
    )
