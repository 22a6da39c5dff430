"""The Benjamini-Hochberg step-up's defining subtlety, pinned: a
hypothesis whose own p-value exceeds its own rank threshold is STILL
rejected when any later rank passes — naive per-rank thresholding gets
this family wrong, and the registered q_benjamini_hochberg's oracle
data happens to reject nothing, so only this test exercises the
rejection branch."""

from __future__ import annotations

from redis_streams_spark.operators.mtest import bh_stepup


def test_bh_stepup_rejects_through_failing_earlier_ranks(spark):
    # m=10, alpha=0.05 -> thresholds 0.005, 0.010, 0.015, ..., 0.050.
    # Ranks 1 (p=.010 > .005) and 2 (p=.012 > .010) fail their OWN
    # thresholds, rank 3 passes (.014 <= .015) -> cut=3, all of 1..3
    # rejected; rank 4 (.040 > .020) and beyond are not.
    ps = [0.010, 0.012, 0.014, 0.040, 0.10, 0.20, 0.30, 0.50, 0.90, 0.95]
    df = spark.createDataFrame(
        [(f"h{i}", p) for i, p in enumerate(ps)], "hyp string, p_value double"
    )
    rows = {r["hyp"]: r for r in bh_stepup(df, tie_cols=("hyp",)).collect()}
    assert [rows[f"h{i}"]["rejected"] for i in range(10)] == (
        [True, True, True] + [False] * 7
    )
    assert rows["h2"]["bh_rank"] == 3
    assert abs(rows["h2"]["bh_threshold"] - 0.015) < 1e-12


def test_bh_stepup_empty_rejection_set(spark):
    # every p above every threshold -> cut_rank NULL -> nothing rejected
    df = spark.createDataFrame(
        [("a", 0.5), ("b", 0.9)], "hyp string, p_value double"
    )
    out = bh_stepup(df, tie_cols=("hyp",)).collect()
    assert all(not r["rejected"] for r in out)
