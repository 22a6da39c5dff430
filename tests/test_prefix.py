"""Bucketed two-phase prefix sums: exactness vs the naive global window
on random histograms, plan-shape guarantees, and edge cases."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.operators.prefix import bucketed_cumsum, bucketed_lead
from redis_streams_spark.plans import global_windows


def _hist(spark, seed: int, n: int = 200):
    rng = random.Random(seed)
    vals = sorted({round(rng.uniform(-50, 450), 2) for _ in range(n)})
    rows = [(v, rng.randint(1, 9), rng.randint(0, 5)) for v in vals]
    return spark.createDataFrame(rows, "val double, cnt long, pos long")


@pytest.mark.parametrize("descending", [False, True])
def test_cumsum_matches_global_window(spark, descending):
    df = _hist(spark, seed=7)
    order = F.desc("val") if descending else F.asc("val")
    wincl = W.orderBy(order).rowsBetween(W.unboundedPreceding, 0)
    wexcl = W.orderBy(order).rowsBetween(W.unboundedPreceding, -1)
    expected = {
        r.val: (r.ci, r.ce, r.pe)
        for r in df.select(
            "val",
            F.sum("cnt").over(wincl).alias("ci"),
            F.coalesce(F.sum("cnt").over(wexcl), F.lit(0)).alias("ce"),
            F.coalesce(F.sum("pos").over(wexcl), F.lit(0)).alias("pe"),
        ).collect()
    }
    got_df = bucketed_cumsum(
        df,
        "val",
        [("cnt", "ci", True), ("cnt", "ce", False), ("pos", "pe", False)],
        width=40.0,
        descending=descending,
    )
    got = {r.val: (r.ci, r.ce, r.pe) for r in got_df.collect()}
    assert got == expected
    assert global_windows(got_df) == []


def test_cumsum_negative_values_and_single_bucket(spark):
    # all values inside one bucket — offsets must be all-zero, not null
    df = spark.createDataFrame(
        [(-3.0, 2), (-2.5, 5), (-1.0, 1)], "val double, cnt long"
    )
    got = {
        r.val: r.c
        for r in bucketed_cumsum(
            df, "val", [("cnt", "c", True)], width=1000.0
        ).collect()
    }
    assert got == {-3.0: 2, -2.5: 7, -1.0: 8}


def test_lead_matches_global_window(spark):
    df = _hist(spark, seed=11)
    expected = {
        r.val: r.nxt
        for r in df.select(
            "val", F.lead("val").over(W.orderBy("val")).alias("nxt")
        ).collect()
    }
    got_df = bucketed_lead(df, "val", "nxt", width=40.0)
    got = {r.val: r.nxt for r in got_df.collect()}
    assert got == expected  # includes None for the global last row
    assert global_windows(got_df) == []


def test_cumsum_partitioned_matches_per_group_window(spark):
    rng = random.Random(19)
    rows = [
        (f"g{rng.randint(0, 3)}", round(rng.uniform(0, 300), 1), rng.randint(1, 5))
        for _ in range(300)
    ]
    df = (
        spark.createDataFrame(rows, "grp string, val double, cnt long")
        .groupBy("grp", "val")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w = W.partitionBy("grp").orderBy("val").rowsBetween(W.unboundedPreceding, 0)
    expected = {
        (r.grp, r.val): r.c
        for r in df.select(
            "grp", "val", F.sum("cnt").over(w).alias("c")
        ).collect()
    }
    got_df = bucketed_cumsum(
        df, "val", [("cnt", "c", True)], width=40.0, partition_cols=["grp"]
    )
    got = {(r.grp, r.val): r.c for r in got_df.collect()}
    assert got == expected
    assert global_windows(got_df) == []


def test_cumsum_passes_through_other_columns(spark):
    df = _hist(spark, seed=3, n=20)
    out = bucketed_cumsum(df, "val", [("cnt", "c", True)], width=40.0)
    assert set(out.columns) == {"val", "cnt", "pos", "c"}


# --- top_k_by_freq (r10: the frequency-threshold vocabulary top-k) ----


def _vocab(spark, seed: int, n: int = 400):
    """Zipf-ish term/frequency frame with heavy ties at low counts."""
    rng = random.Random(seed)
    rows = [
        (f"term{i:04d}", max(1, int(rng.paretovariate(1.1)))) for i in range(n)
    ]
    return spark.createDataFrame(rows, "term string, freq long")


@pytest.mark.parametrize("k", [1, 17, 100])
def test_top_k_by_freq_matches_global_row_number(spark, k):
    from redis_streams_spark.operators.prefix import top_k_by_freq

    df = _vocab(spark, seed=11)
    w = W.orderBy(F.desc("freq"), "term")
    expected = {
        (r.term, r.freq, r.rnk)
        for r in df.select(
            "term", "freq", F.row_number().over(w).alias("rnk")
        ).collect()
        if r.rnk <= k
    }
    got_df = top_k_by_freq(df, "freq", "term", k)
    got = {(r.term, r.freq, r.rnk) for r in got_df.collect()}
    assert got == expected
    assert len(got) == k
    assert global_windows(got_df) == []


def test_top_k_by_freq_vocab_smaller_than_k(spark):
    """k beyond the vocabulary: every key survives, ranks still exact."""
    from redis_streams_spark.operators.prefix import top_k_by_freq

    df = spark.createDataFrame(
        [("b", 5), ("a", 5), ("c", 2), ("d", 9)], "term string, freq long"
    )
    got = {
        (r.term, r.rnk)
        for r in top_k_by_freq(df, "freq", "term", 100).collect()
    }
    assert got == {("d", 1), ("a", 2), ("b", 3), ("c", 4)}


def test_top_k_by_freq_ties_at_threshold_cut_by_key_order(spark):
    """The k-th rank falls inside a tie class: only the keys that sort
    first within the tied frequency survive, exactly like row_number."""
    from redis_streams_spark.operators.prefix import top_k_by_freq

    df = spark.createDataFrame(
        [("z", 7), ("m", 3), ("a", 3), ("q", 3), ("b", 1)],
        "term string, freq long",
    )
    got = {
        (r.term, r.rnk) for r in top_k_by_freq(df, "freq", "term", 3).collect()
    }
    assert got == {("z", 1), ("a", 2), ("m", 3)}


def test_top_k_by_freq_huge_tie_class_across_prefixes(spark):
    """The threshold lands on a tie class spanning many key prefixes
    (the hapax-heavy worst case): ranks must still match the global
    row_number exactly — the prefix-bucketed tie ranking is
    order-preserving because substring is monotone on strings."""
    from redis_streams_spark.operators.prefix import top_k_by_freq

    rng = random.Random(5)
    # 8 frequent keys + 300 hapaxes with diverse prefixes
    rows = [(f"{chr(97 + rng.randrange(26))}{chr(97 + rng.randrange(26))}x{i}", 1)
            for i in range(300)]
    rows += [(f"hot{i}", 50 + i) for i in range(8)]
    df = spark.createDataFrame(rows, "term string, freq long")
    k = 40  # threshold = 1, tie class = all 300 hapaxes
    w = W.orderBy(F.desc("freq"), "term")
    expected = {
        (r.term, r.rnk)
        for r in df.select(
            "term", F.row_number().over(w).alias("rnk")
        ).collect()
        if r.rnk <= k
    }
    got = {
        (r.term, r.rnk)
        for r in top_k_by_freq(df, "freq", "term", k).collect()
    }
    assert got == expected and len(got) == k
