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


def test_lsh_star_edges_cluster_parity(spark):
    """Star-edge near-dup clustering (linear edges per LSH bucket) must
    produce the SAME components as all-pairs clustering on the testdata
    corpus — duplicate cliques are mutually similar, so every star edge
    Jaccard-verifies and connectivity is preserved (the scale rationale
    in minhash_lsh_star_edges' docstring).  Also asserts the edge list
    is materially smaller: that's the entire point of the operator."""
    from redis_streams_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_star_edges,
    )
    from redis_streams_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    star = minhash_lsh_star_edges(docs, threshold=0.3).persist()
    pairs = (
        minhash_lsh_pairs(docs, threshold=0.3)
        .where("is_dup")
        .select("a_id", "b_id")
        .persist()
    )
    n_star, n_pairs = star.count(), pairs.count()
    assert 0 < n_star < n_pairs  # linear vs quadratic edge growth

    cc_star = {
        r["node"]: r["cluster_id"] for r in connected_components(star).collect()
    }
    cc_pairs = {
        r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    # every all-pairs cluster member is present and identically labeled
    assert cc_star == cc_pairs
    star.unpersist()
    pairs.unpersist()


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_cc_algorithms_agree_with_union_find(spark, seed):
    """Both CC implementations must match a Python union-find reference
    on random graphs (fixed seeds): two independent distributed
    algorithms and a sequential oracle triangulate each other."""
    import random

    from redis_streams_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(seed)
    n_nodes, n_edges = 40, 35
    pairs = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    touched = {x for ab in pairs for x in ab}
    # canonical label = min node of the component, over touched nodes only
    comp_min = {}
    for x in touched:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    expected = {x: comp_min[find(x)] for x in touched}

    edges = spark.createDataFrame(pairs, "a_id bigint, b_id bigint")
    got_prop = {
        r["node"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    got_star = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(edges).collect()
    }
    assert got_prop == expected
    assert got_star == expected


def test_incremental_dedup_verdict_precedence(spark):
    """Exact digest match beats near-dup; unrelated docs keep.

    The sf-data oracle row only exercises near_dup/keep (the synthetic
    corpus has no exact duplicates across the batch split), so the
    exact_dup path and its precedence over a simultaneous band match are
    pinned here."""
    from redis_streams_spark.operators.dedup import incremental_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    history = spark.createDataFrame(
        [
            (5, base),  # exact twin of batch doc 100 (and near of 101)
            (2, base + " extra trailing words here"),  # nearest twin of 101
            (3, "completely different content with many unique tokens"),
        ],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, base.upper() + "!"),  # normalizes to doc 1's text exactly
            (101, base + " extra trailing words here padded"),  # near of 2
            (102, "nothing in common with any history document at all"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in incremental_dedup(history, batch).collect()
    }
    assert got[100] == ("exact_dup", 5)  # also band-matches 5, exact wins
    assert got[101] == ("near_dup", 2)  # near-matches {2, 5}; min id reported
    assert got[102] == ("keep", None)
