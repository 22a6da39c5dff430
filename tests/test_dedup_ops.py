"""Unit tests for dedup operator internals not covered by oracle queries."""

from __future__ import annotations

import tempfile

import pytest

from redis_streams_spark.operators.dedup import connected_components


EDGES = [
    # component {1,2,3,4} as a chain, component {10,11}, singleton via self-pair 20
    (1, 2),
    (2, 3),
    (3, 4),
    (10, 11),
    (20, 20),
]
EXPECTED = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


@pytest.mark.parametrize("reliable", [False, True])
def test_connected_components_checkpoint_modes(spark, reliable):
    """Min-label propagation finds components under both checkpoint modes.

    reliable=True exercises the cluster-honest ``checkpoint()`` path —
    executor loss invalidates localCheckpoint on a real cluster, so long
    CC runs must survive on reliable checkpoints (VERDICT r1 #10)."""
    if reliable:
        ckpt_dir = tempfile.mkdtemp(prefix="cc-ckpt-")
        spark.sparkContext.setCheckpointDir(ckpt_dir)
    edges = spark.createDataFrame(EDGES, "a_id bigint, b_id bigint")
    out = connected_components(edges, reliable_checkpoint=reliable)
    got = {r["node"]: r["cluster_id"] for r in out.collect()}
    assert got == EXPECTED


def test_star_cc_matches_propagation(spark):
    """Alternating-star CC returns identical clusters to min-label
    propagation on the shared fixture."""
    from redis_streams_spark.operators.dedup import connected_components_star

    edges = spark.createDataFrame(EDGES, "a_id bigint, b_id bigint")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(edges).collect()
    }
    assert got == EXPECTED


def test_star_cc_long_chain_few_rounds(spark):
    """A 60-node chain (diameter 60) must resolve within far fewer star
    rounds than its diameter — the O(log n) property that makes the star
    variant the adversarial-diameter scale path."""
    from redis_streams_spark.operators.dedup import connected_components_star

    chain = [(i, i + 1) for i in range(60)]
    edges = spark.createDataFrame(chain, "a_id bigint, b_id bigint")
    out = connected_components_star(edges, max_rounds=8)
    got = {r["node"]: r["cluster_id"] for r in out.collect()}
    assert got == {i: 0 for i in range(61)}
