"""Targeted unit tests for the round-5 operator additions: exactness of
the prefix-filter set-similarity join, the distributed prefix-sum
primitives (concurrency curve, systematic sample), degree-ordered
triangle counting, and the tolerance as-of join — small hand-checkable
inputs, independent of the DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from redis_streams_spark.operators.setjoin import (
    containment_pairs,
    prefix_filter_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s") for i, t in enumerate(texts)]
    )


def test_prefix_filter_matches_bruteforce(spark):
    """Exactness: prefix filtering must find EVERY pair with Jaccard ≥ t
    — compare against the unpruned quadratic join on an input with
    boundary-size pairs (|A| = t·|B| exactly) and heavy shared tokens."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,
        base + " extra",                                # high overlap
        base.replace("delta", "lambda"),                # one substitution
        " ".join(base.split()[:5]),                     # half-length subset
        "one two three four five six seven eight nine", # disjoint
        base,                                           # exact dup
    ]
    docs = _docs(spark, texts)
    got = {
        (r.a_id, r.b_id)
        for r in prefix_filter_pairs(docs, n=3, threshold=0.5).collect()
    }
    # brute force over the same shingle definition
    from redis_streams_spark.operators.dedup import shingle_sets

    sets_ = shingle_sets(docs, 3).where(F.size("shingles") > 0)
    a = sets_.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa"))
    b = sets_.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    brute = {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .where(inter * 1.0 / F.greatest(union, F.lit(1)) >= 0.5)
        .collect()
    }
    assert got == brute
    assert (0, 5) in got  # the exact dup surfaced


def test_containment_catches_subset_doc(spark):
    """A document fully contained in a larger one scores containment 1.0
    in the subset→superset direction even when Jaccard is low."""
    big = " ".join(f"tok{i}" for i in range(40))
    small = " ".join(f"tok{i}" for i in range(8))  # 1/5 of big's tokens
    docs = _docs(spark, [big, small])
    rows = {
        (r.a_id, r.b_id): r.containment
        for r in containment_pairs(docs, n=3, threshold=0.6).collect()
    }
    assert rows.get((1, 0)) == 1.0  # small inside big
    assert (0, 1) not in rows  # big not inside small


def test_concurrency_curve_manual(spark, tmp_path):
    """Three overlapping intervals in one hour: curve must peak at 3 and
    return to 0, computed through the bucketed two-phase prefix sum."""
    import datetime as dt

    from redis_streams_spark.queries.timeseries2 import q_concurrency_curve

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # value = duration seconds
        Row(event_id=i, ts=base + dt.timedelta(minutes=10 * i), user_id=1,
            event_type="x", value=1800.0, props="{}")
        for i in range(3)  # starts at :00 :10 :20, each 30 min
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = q_concurrency_curve(spark, str(tmp_path)).collect()
    # all boundaries fall in hours 0 and 1 of 2024-01-01
    by_hour = {r.hour_start_ms: r for r in out}
    h0 = by_hour[1704067200000]
    assert h0.max_concurrent == 3  # :20–:30 has all three active
    assert min(r.min_concurrent for r in out) == 0  # drains to zero


def test_systematic_sample_spacing(spark, sf_dir):
    """Global indexes of the kept rows are exactly 0, 20, 40, … — proof
    the bucketed two-phase ranking reproduces the global hash order."""
    from redis_streams_spark.queries.mixing import _SYS_K, q_systematic_sample
    from redis_streams_spark.session import load_table

    out = q_systematic_sample(spark, sf_dir).collect()
    idxs = sorted(r.sample_idx for r in out)
    assert idxs == list(range(0, (len(idxs)) * _SYS_K, _SYS_K))
    n = load_table(spark, sf_dir, "documents").count()
    assert len(idxs) == (n + _SYS_K - 1) // _SYS_K


def test_triangles_known_graph(spark, tmp_path):
    """K4 minus one edge has exactly 2 triangles; per-node counts are
    {shared edge endpoints: 2, others: 1}."""
    from redis_streams_spark.queries.graph import q_triangles

    # orders 10..14 each carry one edge (pair of parts): build
    # K4-minus-(3,4) on parts 1..4 via co-order pairs
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    rows = []
    for ok, (u, v) in enumerate(edges, start=10):
        rows.append(Row(l_orderkey=ok, l_partkey=u))
        rows.append(Row(l_orderkey=ok, l_partkey=v))
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {r.node: r.n_triangles for r in q_triangles(spark, str(tmp_path)).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    """Every match within tolerance agrees with the unbounded as-of;
    staleness never exceeds the bound; stale matches become NULL."""
    from redis_streams_spark.queries.timeseries2 import (
        _ASOF_TOL_MS,
        q_asof_tolerance,
    )

    out = q_asof_tolerance(spark, sf_dir).collect()
    assert any(r.matched_click_id != -1 for r in out)
    assert any(r.matched_click_id == -1 for r in out)
    for r in out:
        if r.staleness_ms != -1:
            assert 0 <= r.staleness_ms <= _ASOF_TOL_MS
        assert (r.matched_click_id == -1) == (r.staleness_ms == -1)


def test_ohlc_open_close_ordering(spark, sf_dir):
    """low ≤ open, close ≤ high on every bar; tick counts sum to the
    table size."""
    from redis_streams_spark.queries.timeseries2 import q_ohlc_bars
    from redis_streams_spark.session import load_table

    out = q_ohlc_bars(spark, sf_dir).collect()
    for r in out:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
    n = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_ticks for r in out) == n


def test_containment_prefix_matches_bruteforce(spark):
    """Exactness of the containment-prefix rewrite: must equal the
    unpruned quadratic join (ordered pairs, containment >= t)."""
    base = ["alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta theta flux",
            " ".join(f"w{i}" for i in range(30)),
            " ".join(f"w{i}" for i in range(6)),   # subset of the above
            "unrelated words entirely different content here now"]
    docs = _docs(spark, base)
    got = {
        (r.a_id, r.b_id)
        for r in containment_pairs(docs, n=3, threshold=0.6).collect()
    }
    from redis_streams_spark.operators.dedup import shingle_sets

    sets_ = shingle_sets(docs, 3).where(F.size("shingles") > 0)
    a = sets_.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa"))
    b = sets_.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    brute = {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a_id") != F.col("b_id"))
        .where(inter * 1.0 / F.greatest(F.size("sa"), F.lit(1)) >= 0.6)
        .collect()
    }
    assert got == brute
    assert (3, 2) in got  # the subset doc is contained in its superset


def test_pca_power_unit_norm_and_sign(spark, sf_dir):
    """Loadings are unit-norm and the largest-|loading| dim is
    positive (the sign convention)."""
    from redis_streams_spark.queries.embedmath import q_embed_pca_power

    rows = q_embed_pca_power(spark, sf_dir).collect()
    assert len(rows) == 64
    norm = sum(r.loading ** 2 for r in rows) ** 0.5
    assert abs(norm - 1.0) < 1e-4
    top = max(rows, key=lambda r: (abs(r.loading), -r.dim_idx))
    assert top.loading > 0


def test_winsorize_clip_reduces_spread(spark, sf_dir):
    """Winsorized mean sits within the raw value range and clipped
    counts are ~2% of n (1% each tail) per type."""
    from redis_streams_spark.queries.analytics2 import q_winsorize

    for r in q_winsorize(spark, sf_dir).collect():
        assert r.p01 <= r.p99
        assert r.n_clipped_lo + r.n_clipped_hi <= max(0.04 * r.n, 4)
        assert r.n_clipped_lo >= 0 and r.n_clipped_hi >= 0


def test_feature_binning_equidepth(spark, sf_dir):
    """Bins are contiguous, ordered, and sized within 1 of n/10."""
    from collections import defaultdict

    from redis_streams_spark.queries.analytics2 import q_feature_binning

    by_type = defaultdict(list)
    for r in q_feature_binning(spark, sf_dir).collect():
        by_type[r.event_type].append(r)
    for rows in by_type.values():
        rows.sort(key=lambda r: r.bin)
        n_total = sum(r.n for r in rows)
        for r in rows:
            assert abs(r.n - n_total / 10) <= 1
        for prev, cur in zip(rows, rows[1:]):
            assert prev.hi <= cur.lo  # contiguous, non-overlapping


def test_pareto_gini_two_phase_matches_global(spark, sf_dir):
    """The bucketed two-phase ranking must equal a plain global-window
    computation of the same statistics."""
    from redis_streams_spark.queries.analytics3 import q_pareto_gini
    from redis_streams_spark.session import load_table

    row = q_pareto_gini(spark, sf_dir).collect()[0]
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("r"))
        .collect()
    )
    import math

    rs = sorted(((r.r, r.o_custkey) for r in rev), key=lambda t: (-t[0], t[1]))
    n = len(rs)
    tot = sum(r for r, _ in rs)
    cum = 0.0
    k80 = None
    gsum = 0.0
    for rk, (r, _) in enumerate(rs, start=1):
        cum += r
        if k80 is None and round(5e-10 + cum / tot, 6) >= 0.8:
            k80 = rk
        gsum += r * (n - rk + 1)
    gini = 1.0 + 1.0 / n - 2.0 * gsum / (n * tot)
    assert row.n_customers == n
    assert math.isclose(row.pareto_frac_80, round(5e-10 + k80 / n, 6), abs_tol=1e-9)
    assert math.isclose(row.gini, round(5e-10 + gini, 6), abs_tol=1e-6)


def test_funnel_windowed_monotone(spark, sf_dir):
    """Stage populations never grow down the funnel and conversions are
    in (0, 1]."""
    from redis_streams_spark.queries.analytics3 import q_funnel_windowed

    rows = sorted(q_funnel_windowed(spark, sf_dir).collect(), key=lambda r: r.stage)
    assert [r.step for r in rows] == ["view", "click_24h", "purchase_24h"]
    assert rows[0].n_users >= rows[1].n_users >= rows[2].n_users
    for r in rows[1:]:
        assert 0.0 <= r.conversion_from_prev <= 1.0


def test_mad_robust_to_outliers(spark):
    """Injected extreme outliers move the mean but not the MAD gate:
    exactly the injected points are flagged."""
    from redis_streams_spark.queries.analytics3 import q_mad_anomaly

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [Row(event_id=i, ts=t0, user_id=1, event_type="x",
                value=10.0 + (i % 7) * 0.5, props="") for i in range(100)]
    rows += [Row(event_id=1000 + i, ts=t0, user_id=1, event_type="x",
                 value=1e6, props="") for i in range(3)]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = q_mad_anomaly(spark, d).collect()
    assert len(out) == 1
    assert out[0].n_outliers == 3


def test_hll_accuracy_and_determinism(spark, sf_dir):
    """HLL estimate is within 10% of exact and repeat runs are
    bit-identical (registers are maxima — fully deterministic)."""
    from redis_streams_spark.queries.sketch import q_hll_distinct

    a = q_hll_distinct(spark, sf_dir).collect()[0]
    b = q_hll_distinct(spark, sf_dir).collect()[0]
    assert a == b
    assert a.within_10pct
    assert a.rel_error < 0.10


def test_top_paths_same_millisecond_ordering(spark, tmp_path):
    """Regression (review repro): two events in the SAME millisecond
    whose microsecond order disagrees with event_id order — the path
    must follow full-microsecond (ts, event_id) order, matching the
    oracle's string_agg ordering."""
    import datetime as dt

    from redis_streams_spark.queries.analytics3 import q_top_paths

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 123001)  # .123001 — earlier us
    t1 = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)  # .123456 — later us
    rows = [
        Row(event_id=2, ts=t0, user_id=1, event_type="view", value=1.0, props=""),
        Row(event_id=1, ts=t1, user_id=1, event_type="purchase", value=1.0, props=""),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = q_top_paths(spark, str(tmp_path)).collect()
    assert out[0].path == "view>purchase"  # microsecond order, not event_id


def test_dup_spans_island_merge(spark):
    """Hand-checkable island merge: two docs share a 10-token run and a
    separate 8-token run — spans must merge per run, not per window."""
    from redis_streams_spark.queries.dedup3 import text_dup_spans
    import os
    import tempfile

    shared_a = " ".join(f"a{i}" for i in range(10))   # 10-token shared run
    shared_b = " ".join(f"b{i}" for i in range(8))    # exactly one window
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    d0 = f"{shared_a} {uniq('x', 6)} {shared_b}"
    d1 = f"{uniq('y', 5)} {shared_a} {uniq('z', 7)} {shared_b}"
    docs = _docs(spark, [d0, d1])
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        out = {r.doc_id: r for r in text_dup_spans(spark, tmp).collect()}
    # doc 0: spans [1..10] (10 tokens) and [17..24] (8 tokens)
    assert out[0].n_dup_spans == 2
    assert out[0].longest_span_tokens == 10
    assert abs(out[0].dup_token_fraction - 18 / 24) < 1e-6
    # doc 1: same two runs at shifted offsets
    assert out[1].n_dup_spans == 2
    assert out[1].longest_span_tokens == 10


def test_skyline_dominance_invariant(spark, sf_dir):
    """No frontier point is dominated; every non-frontier point is
    dominated by some frontier point."""
    from redis_streams_spark.queries.frontier import q_skyline_2d
    from redis_streams_spark.session import load_table

    sky = [(r.price, r.size) for r in q_skyline_2d(spark, sf_dir).collect()]
    allp = [
        (round(r.p_retailprice + 5e-10, 2), r.p_size)
        for r in load_table(spark, sf_dir, "part")
        .select("p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p, q):  # q dominates p
        return (
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
        )

    for s in sky:
        assert not any(dominated(s, q) for q in allp), s
    skyset = set(sky)
    for p in allp:
        if p not in skyset:
            assert any(dominated(p, s) for s in sky), p


def test_nearest_event_beats_backward_only(spark, sf_dir):
    """Nearest matching finds at least as many matches as the
    backward-only tolerance as-of, and each delta is within bound."""
    from redis_streams_spark.queries.frontier import _NEAR_TOL_MS, q_nearest_event
    from redis_streams_spark.queries.timeseries2 import q_asof_tolerance

    near = {r.event_id: r for r in q_nearest_event(spark, sf_dir).collect()}
    back = {r.event_id: r for r in q_asof_tolerance(spark, sf_dir).collect()}
    n_near = sum(1 for r in near.values() if r.nearest_click_id != -1)
    # different tolerances (1h vs 30min) but nearest includes the forward
    # direction — at matching tolerance it must dominate; sanity: deltas
    for r in near.values():
        if r.abs_delta_ms != -1:
            assert 0 <= r.abs_delta_ms <= _NEAR_TOL_MS
    # backward match within 30min implies nearest match exists (1h, both dirs)
    for eid, b in back.items():
        if b.matched_click_id != -1:
            assert near[eid].nearest_click_id != -1
            assert near[eid].abs_delta_ms <= b.staleness_ms
    assert n_near >= sum(1 for b in back.values() if b.matched_click_id != -1)


def test_dup_spans_overlapping_windows_merge(spark):
    """Regression (review): dup windows at position gaps 2..WIN-1 cover
    OVERLAPPING token ranges and must merge into ONE span — fraction can
    never exceed 1.0."""
    from redis_streams_spark.queries.dedup3 import text_dup_spans
    import os
    import tempfile

    # doc0: w1..w10; doc B shares w1..w8 (window pos 1), doc C shares
    # w3..w10 (window pos 3); pos 2's window matches nothing.
    w = [f"w{i}" for i in range(1, 11)]
    d0 = " ".join(w)
    dB = " ".join(w[0:8]) + " " + " ".join(f"b{i}" for i in range(4))
    dC = " ".join(f"c{i}" for i in range(4)) + " " + " ".join(w[2:10])
    docs = _docs(spark, [d0, dB, dC])
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        out = {r.doc_id: r for r in text_dup_spans(spark, tmp).collect()}
    assert out[0].n_dup_spans == 1          # one merged span, not two
    assert out[0].longest_span_tokens == 10  # w1..w10 fully covered
    assert out[0].dup_token_fraction == 1.0  # never > 1
    for r in out.values():
        assert r.dup_token_fraction <= 1.0
