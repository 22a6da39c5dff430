"""Substring-level dedup (duplicated n-gram spans, Lee et al. 2021's
exact-substring pass in n-gram-fingerprint form): span detection,
gaps-and-islands merge semantics, within-doc repeats, min_count, and
the per-doc profile rollup."""

from __future__ import annotations

from redis_streams_spark.operators.dedup import (
    duplicated_span_profile,
    duplicated_spans,
    positioned_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in df.collect()
    }


def test_cross_doc_duplicate_span(spark):
    # docs 1 and 2 share an 8-token run embedded at different offsets
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(
        spark,
        [
            (1, f"one two {shared} three four"),
            (2, f"{shared} five six seven eight nine ten"),
            (3, "k l m n o p q r s t u v w x y z"),  # all unique
        ],
    )
    got = _spans(duplicated_spans(docs, n=8))
    # doc 1: shared run occupies tokens 3..10; doc 2: tokens 1..8
    assert got == {(1, 3, 10, 8), (2, 1, 8, 8)}


def test_overlapping_grams_merge_to_one_maximal_span(spark):
    # a 10-token shared run yields 3 overlapping duplicated 8-grams
    # (starts 1,2,3) that must merge into ONE maximal span of 10
    run = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    docs = _docs(
        spark,
        [
            (1, f"{run} x1 x2 x3"),
            (2, f"y1 y2 y3 {run}"),
        ],
    )
    got = _spans(duplicated_spans(docs, n=8))
    assert got == {(1, 1, 10, 10), (2, 4, 13, 10)}


def test_disjoint_runs_stay_separate_spans(spark):
    run1 = "b1 b2 b3 b4 b5 b6 b7 b8"
    run2 = "c1 c2 c3 c4 c5 c6 c7 c8"
    docs = _docs(
        spark,
        [
            (1, f"{run1} gap1 gap2 {run2}"),
            (2, f"{run1} other tokens here now ok {run2}"),
        ],
    )
    got = _spans(duplicated_spans(docs, n=8))
    # doc 1: run1 at 1..8, run2 at 11..18 — gap of 2 keeps them apart
    assert (1, 1, 8, 8) in got and (1, 11, 18, 8) in got
    assert (2, 1, 8, 8) in got and (2, 14, 21, 8) in got
    assert len(got) == 4


def test_adjacent_intervals_merge(spark):
    # two 8-gram intervals whose token ranges touch end-to-end merge:
    # doc 1 repeats a 16-token run that doc 2 carries once — every
    # start in 1..9 duplicates, one span of 16 per occurrence
    run16 = " ".join(f"d{i}" for i in range(16))
    docs = _docs(spark, [(1, run16), (2, run16)])
    got = _spans(duplicated_spans(docs, n=8))
    assert got == {(1, 1, 16, 16), (2, 1, 16, 16)}


def test_within_doc_repeat_detected(spark):
    # the SAME doc repeats an 8-token run — Lee et al. remove
    # same-document repeats too; corpus-wide count >= 2 catches it
    run = "e1 e2 e3 e4 e5 e6 e7 e8"
    docs = _docs(
        spark,
        [
            (1, f"{run} filler1 filler2 {run}"),
            (2, "all unique tokens u1 u2 u3 u4 u5 u6 u7"),
        ],
    )
    got = _spans(duplicated_spans(docs, n=8))
    assert got == {(1, 1, 8, 8), (1, 11, 18, 8)}


def test_min_count_threshold(spark):
    run = "f1 f2 f3 f4 f5 f6 f7 f8"
    docs = _docs(
        spark,
        [(1, f"{run} t1 t2"), (2, f"{run} t3 t4"), (3, f"{run} t5 t6")],
    )
    # appears 3 times: passes min_count=3, fails min_count=4
    assert len(_spans(duplicated_spans(docs, n=8, min_count=3))) == 3
    assert _spans(duplicated_spans(docs, n=8, min_count=4)) == set()


def test_short_docs_skipped(spark):
    docs = _docs(
        spark,
        [(1, "only seven tokens here not eight ok"),
         (2, "only seven tokens here not eight ok")],
    )
    # 7 tokens < n=8: no grams, no spans, no crash
    assert _spans(duplicated_spans(docs, n=8)) == set()
    assert positioned_ngrams(docs, n=8).count() == 0


def test_profile_rollup(spark):
    run1 = "g1 g2 g3 g4 g5 g6 g7 g8"
    run2 = "h1 h2 h3 h4 h5 h6 h7 h8"
    docs = _docs(
        spark,
        [
            (1, f"{run1} gapx gapy {run2}"),  # 18 tokens, 16 duplicated
            (2, f"{run1} aa bb cc dd ee ff gg hh ii jj {run2}"),
            (3, "unique unique2 u3 u4 u5 u6 u7 u8 u9"),
        ],
    )
    prof = {
        r.doc_id: (r.n_spans, r.dup_tokens, r.n_tokens, r.dup_ratio)
        for r in duplicated_span_profile(docs, n=8).collect()
    }
    assert prof[1] == (2, 16, 18, round(16 / 18 + 5e-10, 6))
    assert prof[2][0] == 2 and prof[2][1] == 16 and prof[2][2] == 26
    assert 3 not in prof  # no spans -> not in the profile frame


def test_strip_spans(spark):
    from redis_streams_spark.operators.dedup import strip_duplicated_spans

    run = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = _docs(
        spark,
        [
            (1, f"keep1 keep2 {run} keep3"),
            (2, f"{run} tail1 tail2 tail3 tail4 tail5 tail6 tail7"),
            (3, "nothing duplicated in this one at all ok"),
            (4, run),  # doc IS one duplicated span -> empty
            (5, run),  # its twin, also emptied (canonical-keep is policy)
        ],
    )
    got = {r.doc_id: r.clean_text for r in strip_duplicated_spans(docs, n=8).collect()}
    assert got[1] == "keep1 keep2 keep3"
    assert got[2] == "tail1 tail2 tail3 tail4 tail5 tail6 tail7"
    assert got[3] == "nothing duplicated in this one at all ok"
    assert got[4] == "" and got[5] == ""
    assert set(got) == {1, 2, 3, 4, 5}  # one row per input doc


def test_strip_spans_normalizes_like_words(spark):
    from redis_streams_spark.operators.dedup import strip_duplicated_spans

    # untouched docs come back as the NORMALIZED token stream (the
    # operator works on words(text); punctuation/case fold away)
    docs = _docs(spark, [(1, "Hello, World! One two THREE.")])
    got = strip_duplicated_spans(docs, n=8).collect()
    assert got[0].clean_text == "hello world one two three"
