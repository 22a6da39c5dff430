"""Persisted IVF index: build-once/query-many parity with the inline
operator, and partition-pruned candidate scans."""

from __future__ import annotations

from redis_streams_spark.operators.similarity import (
    build_ivf_index,
    ivf_topk,
    ivf_topk_indexed,
)
from redis_streams_spark.plans import plan_str
from redis_streams_spark.session import load_table


def test_indexed_ivf_matches_inline(spark, tmp_path, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path)
    inline = {
        (r.query_id, r.rank): (r.cand_id, r.cosine)
        for r in ivf_topk(emb, k=5, query_mod=50).collect()
    }
    indexed = {
        (r.query_id, r.rank): (r.cand_id, r.cosine)
        for r in ivf_topk_indexed(spark, path, k=5, query_mod=50).collect()
    }
    assert indexed == inline
    assert inline  # non-trivial probe set


def test_indexed_scan_is_partition_prunable(spark, tmp_path, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path)
    df = ivf_topk_indexed(spark, path, k=5, query_mod=50)
    plan = plan_str(df)
    # the candidate side must join on the partition column so the scan
    # can prune unprobed cells (dynamic partition pruning or a runtime
    # partition filter on `label`)
    assert "label" in plan
    assert "PartitionFilters" in plan or "dynamicpruning" in plan.lower()
