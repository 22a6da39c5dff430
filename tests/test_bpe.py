"""BPE training loop (operators/bpe.py): greedy-leftmost overlap
resolution, tie-breaks, word-frequency weighting, and round chaining."""

from __future__ import annotations

from redis_streams_spark.operators.bpe import bpe_train


def _docs(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_bpe_overlap_greedy_leftmost(spark):
    """'aaa' under rule (a,a) merges the LEFTMOST pair only ([aa, a]);
    round 2 must then see the (aa, a) pair — a wrong overlap rule
    (both pairs merged, or rightmost-first) breaks the round-2 count."""
    rules = [tuple(r) for r in bpe_train(_docs(spark, "aaa aaa bb"), 3).collect()]
    assert rules == [
        (1, "a", "a", "aa", 4),     # 2 pairs per 'aaa' x freq 2
        (2, "aa", "a", "aaa", 2),   # the survivor pair, once per word
        (3, "b", "b", "bb", 1),
    ]


def test_bpe_tie_breaks_lexicographic(spark):
    """Equal-count pairs adopt the lexicographically smaller (left,
    right) — deterministic cross-engine."""
    rules = [tuple(r) for r in bpe_train(_docs(spark, "xy ab"), 1).collect()]
    assert rules == [(1, "a", "b", "ab", 1)]


def test_bpe_frequency_weighting(spark):
    """Pair counts weight by word frequency, not distinct words."""
    rules = [tuple(r) for r in bpe_train(_docs(spark, "zq zq zq ab"), 1).collect()]
    assert rules == [(1, "z", "q", "zq", 3)]


def test_bpe_merged_symbol_chains(spark):
    """Adopted merges participate in later rounds as single symbols:
    'abab' → ab, then (ab, ab)."""
    rules = [tuple(r) for r in bpe_train(_docs(spark, "abab abab abz"), 2).collect()]
    assert rules[0] == (1, "a", "b", "ab", 5)
    assert rules[1] == (2, "ab", "ab", "abab", 2)
