"""Semantic invariants of the event-analytics family (queries/analytics.py).

Value-level correctness is carried by the DuckDB oracle gate; these pin
the CROSS-ROW invariants an oracle hash can't articulate when it fails."""

from __future__ import annotations

from redis_streams_spark.queries import all_queries


def _run(spark, sf_dir, name):
    return all_queries()[name].fn(spark, sf_dir).collect()


def test_funnel_monotone(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_funnel")
    assert [r["step"] for r in rows] == [1, 2, 3]
    counts = [r["n_users"] for r in rows]
    # each step strictly requires the previous one
    assert counts[0] >= counts[1] >= counts[2] >= 0


def test_retention_cohort_zero_offset_covers_cohort(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_retention_cohorts")
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    for cohort, offs in by_cohort.items():
        assert 0 in offs, f"cohort {cohort} missing offset 0"
        # week-0 row counts the whole cohort: no later offset exceeds it
        assert all(n <= offs[0] for n in offs.values())
        assert all(o >= 0 for o in offs)


def test_transitions_rows_sum_to_one(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_event_transitions")
    per_src = {}
    for r in rows:
        per_src[r["src"]] = per_src.get(r["src"], 0.0) + r["p"]
    for src, total in per_src.items():
        assert abs(total - 1.0) < 1e-2, (src, total)  # 4dp rounding per cell


def test_gap_fill_dense_grid(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_gap_fill")
    days = sorted({r["day_idx"] for r in rows})
    types = {r["event_type"] for r in rows}
    # dense: every (day, type) cell present, days contiguous
    assert len(rows) == len(days) * len(types)
    assert days == list(range(days[0], days[-1] + 1))
    for r in rows:
        if r["filled"]:
            assert r["n_events"] == 0 and r["sum_value"] == 0.0


def test_rolling_wau_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_rolling_wau")
    for r in rows:
        assert r["dau"] <= r["wau"]  # a week covers its last day
        assert 0.0 < r["stickiness"] <= 1.0


def test_zscore_anomalies_are_tail(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_zscore_anomaly")
    assert rows, "threshold should flag a non-empty tail on the testdata"
    assert all(abs(r["z"]) > 2.5 - 1e-4 for r in rows)


def test_user_journey_covers_all_users(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_user_journey")
    assert len(rows) == len({r["user_id"] for r in rows})
    for r in rows:
        assert r["converted"] == (r["n_purchases"] > 0)
        assert r["n_purchases"] <= r["n_events"]


def test_pagerank_mass_conserved(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_pagerank")
    total = sum(r["pr_permille"] for r in rows) / 1000.0
    assert abs(total - 1.0) < 1e-3  # rank mass conserved (no dangling)
    assert all(r["pr_permille"] > 0 for r in rows)
    assert {r["node_type"] for r in rows} == {"customer", "supplier"}


def test_reservoir_sample_fixed_size(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_reservoir_group_sample")
    per_group = {}
    for r in rows:
        per_group.setdefault(r["o_orderstatus"], []).append(r["sample_rank"])
    for status, ranks in per_group.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
