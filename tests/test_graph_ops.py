"""operators/graph.py: PageRank delta-convergence early exit."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from redis_streams_spark.operators.graph import pagerank


@pytest.fixture()
def cycle_edges(spark):
    # 4-cycle: symmetric, converges to the uniform distribution fast
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    return spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])


def test_pagerank_early_exit_on_convergence(cycle_edges):
    ranks, iters = pagerank(cycle_edges, tol=1e-6, max_iters=50)
    rows = {r.id: r.pr for r in ranks.collect()}
    # uniform stationary distribution on a cycle
    for v in rows.values():
        assert abs(v - 0.25) < 1e-4
    assert iters < 50  # converged well before the cap


def test_pagerank_fixed_iters_without_tol(cycle_edges):
    ranks, iters = pagerank(cycle_edges, tol=None, max_iters=3)
    assert iters == 3
    assert ranks.count() == 4


def test_pagerank_tol_zero_runs_to_cap(cycle_edges):
    # tol=0 can never be met (delta >= 0): the cap must bound the loop
    _, iters = pagerank(cycle_edges, tol=0.0, max_iters=4)
    assert iters == 4


def test_pagerank_star_ranks_hub_highest(spark):
    # hub 1 with spokes 2..5, symmetrized: hub rank must dominate
    spokes = [(1, i) for i in range(2, 6)] + [(i, 1) for i in range(2, 6)]
    edges = spark.createDataFrame([Row(src=s, dst=d) for s, d in spokes])
    ranks, _ = pagerank(edges, tol=1e-8, max_iters=60)
    rows = {r.id: r.pr for r in ranks.collect()}
    assert rows[1] > max(v for k, v in rows.items() if k != 1)
    assert abs(sum(rows.values()) - 1.0) < 1e-6  # mass conserved


def test_pagerank_matches_registry_shape_after_3_rounds(spark):
    """tol=None, max_iters=3 reproduces the registry query's fixed-round
    semantics on a shared graph (same damping, same contribution sum)."""
    edges = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in [(1, 2), (2, 1), (2, 3), (3, 2)]]
    )
    fixed, _ = pagerank(edges, tol=None, max_iters=3)
    conv, _ = pagerank(edges, tol=1e-12, max_iters=3)
    a = {r.id: r.pr for r in fixed.collect()}
    b = {r.id: r.pr for r in conv.collect()}
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12
