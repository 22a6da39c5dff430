"""Semantic invariants of the data-quality and text-diagnostic families
(queries/quality.py, queries/text2.py, q_resample_ffill).  Value-level
correctness is carried by the DuckDB oracle gate."""

from __future__ import annotations

import math

from redis_streams_spark.queries import all_queries


def _run(spark, sf_dir, name):
    return all_queries()[name].fn(spark, sf_dir).collect()


def test_dq_constraints_shape(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_dq_constraints")
    by_name = {r["check_name"]: r for r in rows}
    assert len(by_name) == 6
    for r in rows:
        assert r["passed"] == (r["n_violations"] == 0)
        assert r["n_violations"] >= 0
    # the deliberately-tight accepted-values check must actually count
    assert by_name["accepted_values_o_orderstatus"]["n_violations"] > 0
    # the clean-data checks must actually pass
    assert by_name["unique_o_orderkey"]["passed"]
    assert by_name["fk_lineitem_orders"]["passed"]


def test_table_diff_partitions_rows(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_table_diff")
    by_class = {r["change_type"]: r for r in rows}
    assert set(by_class) == {"removed", "changed", "unchanged"}
    # classes partition the old snapshot; removed rows contribute the
    # full negative price, changed rows a positive 10% bump
    assert by_class["removed"]["total_price_delta"] < 0
    assert by_class["changed"]["total_price_delta"] > 0
    assert by_class["unchanged"]["total_price_delta"] == 0.0


def test_profile_counts_consistent(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_profile_table")
    n_rows = {r["n_rows"] for r in rows}
    assert len(n_rows) == 1  # every column profiled over the same scan
    for r in rows:
        assert 0 <= r["n_null"] <= r["n_rows"]
        assert 1 <= r["n_distinct"] <= r["n_rows"] - r["n_null"]


def test_histogram_is_cdf(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_histogram")
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-9
    for r in rows:
        assert r["bucket_lo"] == r["bucket"] * 25000
        assert r["n"] > 0


def test_resample_ffill_carries_last_value(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_resample_ffill")
    last_seen: dict = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["hour_idx"])):
        if r["filled"]:
            assert r["avg_value"] is None
            assert r["ffill_value"] == last_seen.get(r["event_type"])
        else:
            assert r["ffill_value"] == r["avg_value"]
            last_seen[r["event_type"]] = r["avg_value"]
    assert any(r["filled"] for r in rows)  # the grid actually fills gaps


def test_entropy_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "text_entropy")
    for r in rows:
        assert r["n_distinct"] <= r["n_tokens"]
        # 0 <= H <= log2(distinct); normalized in [0, 1]
        assert -1e-9 <= r["entropy_bits"] <= math.log2(max(r["n_distinct"], 2)) + 1e-6
        assert -1e-9 <= r["norm_entropy"] <= 1.0 + 1e-9


def test_zipf_slope_negative(spark, sf_dir):
    (row,) = _run(spark, sf_dir, "text_zipf")
    assert 0 < row["n_top"] <= 100  # min(vocabulary, top-k cut)
    assert row["zipf_slope"] < 0  # frequency decreases with rank
    assert 0.0 <= row["fit_r2"] <= 1.0
    assert row["max_freq"] >= row["min_freq"] > 0
