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
