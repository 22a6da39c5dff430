"""Bucketed two-phase prefix sums: exact global cumulative sums with NO
empty-partition-spec window anywhere in the plan.

The classic way to write ``sum(x) OVER (ORDER BY k)`` puts every row in
one task.  Guarding it with "the input is an aggregate" (the fleet plan
gate's rule) is necessary but not sufficient: a histogram keyed by a
CONTINUOUS column grows with corpus size (events.value has ~18% distinct
values at sf0.1), so the single window task grows too.

This helper computes the same cumulative sums in two parallel phases:

1. bucket rows by ``floor(order_col / width)`` — a monotone function of
   the sort key, so bucket-major order IS the global order — and
   cumulate WITHIN each bucket (a partitioned window, one task per
   bucket, all parallel);
2. compute per-bucket totals (a tiny aggregate, one row per bucket,
   bounded by value-range/width, NOT by corpus size) and derive each
   bucket's exclusive prefix offset with a broadcast triangle self-join
   over that tiny frame — deliberately not a window, so the final plan
   contains zero empty-partition Window operators and the fleet gate can
   demand their absence structurally.

Exactness is preserved: offset + local cumsum == global cumsum, term for
term, no approximation.  The only tunable is ``width``; the bucket count
is range/width and each bucket task holds (distinct values in bucket)
rows, both independent of how the corpus scales for a fixed value
domain.

Used by the model-eval family (q_roc_auc, q_pr_curve) and the rank/ECDF
statistics family (q_mann_whitney, q_ks_test, q_wasserstein_1d).  The
rank+revenue variant with bucket-level windows lives in q_pareto_gini
(queries/analytics3.py); this module is the stricter no-global-window
form.

Reference basis: none (SURVEY §2.2 extension surface; the reference
delegates all computation to user callbacks).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "bucketed_cumsum",
    "bucketed_lead",
    "top_k_by_freq",
    "EVENTS_VALUE_BUCKET",
    "NCHARS_BUCKET",
]

# Shared bucket widths, ONE definition per testdata value axis so a
# data-domain change retunes every prefix-sum consumer together instead
# of leaving stale copies behind (r09 review finding — five copies of
# these two constants were spread over four query modules):
#  - events.value spans ~0-560  → ~70 buckets at width 8.0
#  - documents.n_chars spans ~44-577 → ~35 buckets at width 16.0
EVENTS_VALUE_BUCKET = 8.0
NCHARS_BUCKET = 16.0

_BK = "__pfx_bucket"


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    specs: Sequence[tuple[str, str, bool]],
    width: float,
    descending: bool = False,
    partition_cols: Sequence[str] = (),
    bucket_col: str | None = None,
) -> DataFrame:
    """Append exact cumulative sums to ``df`` without any
    empty-partition window.

    ``df`` must have one row per distinct (``partition_cols``,
    ``order_col``) value (a histogram frame — group first), with
    non-null ``order_col``.  ``specs`` is a sequence of ``(src_col,
    out_name, inclusive)``: each adds ``out_name`` = cumulative sum of
    ``src_col`` over rows ordered by ``order_col`` (descending if
    ``descending``), including the current row iff ``inclusive``.
    Exclusive sums coalesce to 0 at the first row.  With
    ``partition_cols`` the cumulation restarts per partition (per-group
    running totals — e.g. per-source exact quantiles) and every helper
    frame is keyed by the partition too, so a single skewed group still
    splits across its value buckets instead of one window task.  All
    other columns pass through unchanged.

    ``bucket_col`` (default ``order_col``) is the column bucketed by
    ``floor(bucket_col / width)``; it must be MONOTONE NON-DECREASING in
    ``order_col`` so bucket-major order is the global order.  Pass a
    derived column (e.g. ``log(freq)``) to spread a heavy-tailed domain
    evenly across buckets while still ORDERING by the exact raw value —
    a lossy derivation (two distinct frequencies rounding to the same
    double) then only merges buckets, never corrupts the sort
    (r10 ADVICE fix).

    Sizing contract: the offset frame holds |partitions| x |occupied
    buckets| rows and is broadcast — right for few-to-thousands of
    groups (the skewed-group case this solves).  For millions of tiny
    groups use a plain ``W.partitionBy(*groups)`` window instead: each
    group is already small, and broadcasting a huge offset frame would
    be the new bottleneck.
    """
    pcols = list(partition_cols)
    bucket = F.floor(F.col(bucket_col or order_col) / F.lit(width)).cast(
        "long"
    )
    b = df.withColumn(_BK, bucket)

    srcs = sorted({src for src, _, _ in specs})
    # Phase 2a: per-(partition, bucket) totals — one row per occupied
    # bucket, cardinality bounded by |partitions| * value-range/width.
    btot = b.groupBy(*pcols, _BK).agg(
        *[F.sum(s).alias(f"__bt_{s}") for s in srcs]
    )
    # Phase 2b: exclusive bucket offsets via a broadcast triangle join
    # over the tiny bucket frame (same partition, strictly-earlier
    # bucket in the global order).  O(buckets^2) pairs per partition on
    # a bounded frame; zero windows.
    rhs = btot.select(
        *[F.col(c).alias(f"__pfx_p_{c}") for c in pcols],
        F.col(_BK).alias("__pfx_bk2"),
        *[F.col(f"__bt_{s}").alias(f"__bt2_{s}") for s in srcs],
    )
    earlier = (
        F.col("__pfx_bk2") > F.col(_BK)
        if descending
        else F.col("__pfx_bk2") < F.col(_BK)
    )
    for c in pcols:
        earlier = earlier & (F.col(f"__pfx_p_{c}") == F.col(c))
    off = (
        btot.join(F.broadcast(rhs), earlier, "left")
        .groupBy(*pcols, _BK)
        .agg(
            *[
                F.coalesce(F.sum(f"__bt2_{s}"), F.lit(0)).alias(f"__off_{s}")
                for s in srcs
            ]
        )
    )
    # Materialize the offset frame as a LocalRelation (r13 optimization,
    # guide §3.3/§5).  ``off`` is exactly the frame the plan broadcasts
    # anyway — |partitions| x |occupied buckets| rows, the sizing
    # contract above, so the driver holds these bytes either way — but
    # leaving it INLINE embeds the input subtree two more times (btot +
    # rhs), and Catalyst neither reuses the duplicated exchanges at
    # runtime nor analyzes them sub-quadratically: q_wasserstein_1d's
    # before-plan (helpers stacked on a crossJoin frame) reached 96
    # Exchange nodes / 42 parquet scans with ZERO ReusedExchange.
    # Collecting the driver-sized rows and re-emitting them as literal
    # rows is value-identical — the same Spark aggregate computes them,
    # one tiny job earlier — and cuts the input subtree to ONE
    # reference in the final plan.
    spark = df.sparkSession
    off = spark.createDataFrame(off.collect(), off.schema)

    # Phase 1: within-bucket cumulative sums — partitioned window, one
    # parallel task per (partition, bucket).
    order = F.desc(order_col) if descending else F.asc(order_col)
    wloc = W.partitionBy(*pcols, _BK).orderBy(order)
    wincl = wloc.rowsBetween(W.unboundedPreceding, 0)
    wexcl = wloc.rowsBetween(W.unboundedPreceding, -1)

    out = b.join(F.broadcast(off), [*pcols, _BK])
    for src, name, inclusive in specs:
        local = (
            F.sum(src).over(wincl)
            if inclusive
            else F.coalesce(F.sum(src).over(wexcl), F.lit(0))
        )
        out = out.withColumn(name, F.col(f"__off_{src}") + local)
    return out.drop(_BK, *[f"__off_{s}" for s in srcs])


def top_k_by_freq(
    df: DataFrame,
    freq_col: str,
    key_col: str,
    k: int,
    rank_name: str = "rnk",
    log_width: float = 0.5,
) -> DataFrame:
    """Exact top-k selection by frequency — the rows and ranks that
    ``row_number() OVER (ORDER BY freq DESC, key)`` ≤ k would produce —
    with ZERO empty-partition windows, so a web-scale vocabulary never
    funnels through one task (the r09-verdict vocabulary-rank loophole).

    ``df`` has one row per ``key_col`` with an integer ``freq_col`` ≥ 1
    (a vocabulary/frequency frame — aggregate first).  Three phases:

    1. histogram over the frequency VALUES (one row per distinct
       frequency — O(sqrt(total count)) rows, sub-linear in vocabulary
       size) and a descending :func:`bucketed_cumsum` over log-frequency
       buckets → per-frequency count of keys at-or-above it;
    2. the k-th-largest frequency is the largest frequency whose
       at-or-above count reaches k (one-row aggregate; falls back to the
       minimum frequency when the vocabulary holds fewer than k keys);
    3. survivors = keys with freq ≥ threshold — at most k plus the tie
       class at the threshold — ranked exactly as (#keys strictly more
       frequent, from the same cum frame) + the key's rank within its
       tie class, then filtered to rank ≤ k.

    The tie-class rank itself is parallel for string keys (the only
    callers today): keys bucket by their 2-char prefix — substring is
    ORDER-PRESERVING on strings, so (prefix, key) order == key order —
    each (freq, prefix) bucket ranks in its own window task, and the
    bucket offsets come from a broadcast triangle join over the tiny
    (freq, prefix) count frame.  Without this, a threshold that lands
    on a huge tie class (k-th frequency = 1 on a hapax-heavy corpus —
    Good-Turing n₁ is ~half the vocabulary) would serialize the whole
    class through one nominally-partitioned window task (r10 review
    finding).  Non-string keys fall back to the per-frequency window,
    where prefix bucketing would not preserve numeric order.

    The result column set is ``df``'s plus ``rank_name`` (int).
    """
    from pyspark.sql.types import StringType
    hist = df.groupBy(freq_col).agg(F.count(F.lit(1)).alias("__tk_n"))
    hist = hist.withColumn(
        "__tk_lf", F.log(F.col(freq_col).cast("double"))
    )
    # bucket by log(freq) (even spread over the heavy tail) but ORDER by
    # the exact integer freq: at extreme counts two distinct frequencies
    # can round to the same double log, which would make a log-ordered
    # cumsum nondeterministic for the pair (r10 ADVICE fix) — with raw
    # ordering a log collision only merges their bucket, never the sort
    cum = bucketed_cumsum(
        hist,
        freq_col,
        [("__tk_n", "__tk_ge", True)],
        width=log_width,
        descending=True,
        bucket_col="__tk_lf",
    )
    # The threshold is a 1-row aggregate over the bounded cum frame:
    # collect it and filter with the LITERAL (r13 optimization) — the
    # former 1-row broadcast-join carried the whole cum subtree (itself
    # corpus-derived) into every consumer branch, and a literal
    # comparison is additionally eligible for parquet min/max pruning
    # when ``df`` is scan-adjacent.  Value-identical: same aggregate,
    # collected instead of joined.
    spark = df.sparkSession
    thr_rows = cum.agg(
        F.coalesce(
            F.max(F.when(F.col("__tk_ge") >= k, F.col(freq_col))),
            F.min(freq_col),
        ).alias("__tk_thr")
    ).collect()
    thr_val = thr_rows[0]["__tk_thr"] if thr_rows else None
    surv = df.where(F.col(freq_col) >= F.lit(thr_val))
    gt_surv = (
        cum.where(F.col(freq_col) >= F.lit(thr_val))
        .select(freq_col, (F.col("__tk_ge") - F.col("__tk_n")).alias("__tk_gt"))
    )
    # gt_surv is bounded by the survivors' distinct frequencies (≤ k
    # plus the threshold tie class's ONE frequency) — LocalRelation it
    # so the main plan references the corpus-sized ``df`` subtree once.
    gt_surv = spark.createDataFrame(gt_surv.collect(), gt_surv.schema)
    if isinstance(df.schema[key_col].dataType, StringType):
        s2 = surv.withColumn("__tk_pb", F.substring(F.col(key_col), 1, 2))
        pcnt = s2.groupBy(freq_col, "__tk_pb").agg(
            F.count(F.lit(1)).alias("__tk_pn")
        )
        prhs = pcnt.select(
            F.col(freq_col).alias("__tk_f2"),
            F.col("__tk_pb").alias("__tk_pb2"),
            F.col("__tk_pn").alias("__tk_pn2"),
        )
        earlier_pb = (F.col("__tk_f2") == F.col(freq_col)) & (
            F.col("__tk_pb2") < F.col("__tk_pb")
        )
        poff = (
            pcnt.join(F.broadcast(prhs), earlier_pb, "left")
            .groupBy(freq_col, "__tk_pb")
            .agg(F.coalesce(F.sum("__tk_pn2"), F.lit(0)).alias("__tk_poff"))
        )
        # Bounded by |survivor frequencies| x |2-char prefixes| and
        # broadcast either way — LocalRelation, same rationale as the
        # offset frames above (the inline form embedded the survivor
        # subtree, and through it the corpus aggregate, twice more).
        poff = spark.createDataFrame(poff.collect(), poff.schema)
        w_tie = W.partitionBy(freq_col, "__tk_pb").orderBy(key_col)
        ranked = (
            s2.join(F.broadcast(poff), [freq_col, "__tk_pb"])
            .join(F.broadcast(gt_surv), freq_col)
            .withColumn(
                rank_name,
                (
                    F.col("__tk_gt")
                    + F.col("__tk_poff")
                    + F.row_number().over(w_tie)
                ).cast("int"),
            )
            .drop("__tk_pb", "__tk_poff")
        )
    else:
        w_tie = W.partitionBy(freq_col).orderBy(key_col)
        ranked = surv.join(F.broadcast(gt_surv), freq_col).withColumn(
            rank_name,
            (F.col("__tk_gt") + F.row_number().over(w_tie)).cast("int"),
        )
    return ranked.where(F.col(rank_name) <= k).drop("__tk_gt")


def bucketed_lead(
    df: DataFrame, order_col: str, out_name: str, width: float
) -> DataFrame:
    """Append the NEXT ``order_col`` value in ascending global order
    (``lead(order_col) OVER (ORDER BY order_col)``) without any
    empty-partition window: lead within each floor(order_col/width)
    bucket, and for each bucket's last row take the minimum value of any
    later occupied bucket (a broadcast triangle join over the tiny
    bucket-min frame).  The globally last row gets NULL, matching
    lead().  Same one-row-per-distinct-value contract as
    :func:`bucketed_cumsum`.
    """
    b = df.withColumn(
        _BK, F.floor(F.col(order_col) / F.lit(width)).cast("long")
    )
    bmin = b.groupBy(_BK).agg(F.min(order_col).alias("__pfx_bmin"))
    rhs = bmin.select(
        F.col(_BK).alias("__pfx_bk2"), F.col("__pfx_bmin").alias("__pfx_bmin2")
    )
    nxt = (
        bmin.join(F.broadcast(rhs), F.col("__pfx_bk2") > F.col(_BK), "left")
        .groupBy(_BK)
        .agg(F.min("__pfx_bmin2").alias("__pfx_next"))
    )
    # LocalRelation for the bucket-level frame — same rationale and
    # sizing contract as bucketed_cumsum's offset materialization (the
    # |buckets|-row frame is broadcast either way; inlining it embedded
    # the input subtree twice more with zero runtime exchange reuse).
    spark = df.sparkSession
    nxt = spark.createDataFrame(nxt.collect(), nxt.schema)
    wloc = W.partitionBy(_BK).orderBy(order_col)
    out = (
        b.join(F.broadcast(nxt), _BK)
        .withColumn(
            out_name,
            F.coalesce(F.lead(order_col).over(wloc), F.col("__pfx_next")),
        )
        .drop(_BK, "__pfx_next")
    )
    return out
