"""Iterative graph analytics on relational data (SURVEY §2.2 extension:
the reference has no graph surface; connected components already live in
operators/dedup.py — this adds the other canonical iterative-join
algorithm, PageRank, expressed as fixed-iteration DataFrame loops that a
DuckDB oracle can replay with unrolled CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_DAMP = 0.85
_ITERS = 3
_SUPP_OFFSET = 10_000_000


def _oracle_pagerank() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (same arithmetic
    as the Spark loop: full-double iterations, one final scaled round)."""
    its = []
    prev = "p0"
    for i in range(1, _ITERS + 1):
        its.append(
            f"""i{i} AS (
  SELECT e.dst AS id, 0.15 / any_value(n.n) + {_DAMP} * sum(p.pr / e.d) AS pr
  FROM e JOIN {prev} p ON p.id = e.src CROSS JOIN n
  GROUP BY e.dst
)"""
        )
        prev = f"i{i}"
    return f"""
WITH base AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s + {_SUPP_OFFSET} AS dst FROM base
  UNION ALL
  SELECT s + {_SUPP_OFFSET} AS src, c AS dst FROM base
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), n AS (
  SELECT count(*)::DOUBLE AS n FROM nodes
), deg AS (
  SELECT src, count(*)::DOUBLE AS d FROM edges GROUP BY src
), e AS (
  SELECT edges.src, edges.dst, deg.d FROM edges JOIN deg USING (src)
), p0 AS (
  SELECT id, 1.0 / n.n AS pr FROM nodes CROSS JOIN n
), {", ".join(its)}
SELECT id AS node_id,
       CASE WHEN id >= {_SUPP_OFFSET} THEN 'supplier' ELSE 'customer' END
         AS node_type,
       round(5e-10 + pr * 1000, 6) AS pr_permille
FROM {prev} ORDER BY node_id
"""


@register("q_pagerank", tags=("graph", "iterative"), oracle=_oracle_pagerank())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (d=0.85, 3 rounds) over the bipartite
    customer↔supplier trade graph derived from lineitem⋈orders, edges in
    both directions so the chain is irreducible and no rank mass dangles.
    Intermediate ranks stay full doubles (per-edge terms are bit-identical
    across engines; only the commutative sum order differs, ~1e-15 drift);
    ONE final scaled round (pr × 1000 @ 6dp) exposes comparable values.

    Scale shape: the classic iterative join — the edge list (with
    out-degree pre-joined) is built once and PERSISTED; each round is one
    shuffle: edges ⋈ prev-rank on src (both sides hash-partitioned on the
    join key) then a map-side-combined sum by dst.  Rank state is one row
    per node, never collected; 3 fixed rounds keep the lineage shallow
    enough to skip checkpointing (the >10-round variant would checkpoint
    like operators/dedup.py's components loop).

    Reference basis: none (no graph ops in redis-streams); standard
    PageRank formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    fwd = base.select(
        F.col("c").alias("src"), (F.col("s") + _SUPP_OFFSET).alias("dst")
    )
    rev = base.select(
        (F.col("s") + _SUPP_OFFSET).alias("src"), F.col("c").alias("dst")
    )
    edges = fwd.unionAll(rev)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("d"))
    # classic reuse-a-stage persist: e is scanned once per iteration;
    # lifecycle: consumed by the fixed 3-round loop below, session-LRU
    # bounded (ints + one double per edge).
    e = edges.join(deg, "src").persist()
    nodes = edges.select(F.col("src").alias("id")).distinct()
    n = float(nodes.count())
    pr = nodes.select("id", F.lit(1.0 / n).alias("pr"))
    for _ in range(_ITERS):
        pr = (
            e.join(pr, e.src == pr.id)
            .groupBy("dst")
            .agg((F.lit(0.15 / n) + _DAMP * F.sum(F.col("pr") / F.col("d"))).alias("pr"))
            .withColumnRenamed("dst", "id")
        )
    return pr.select(
        F.col("id").alias("node_id"),
        F.when(F.col("id") >= _SUPP_OFFSET, "supplier")
        .otherwise("customer")
        .alias("node_type"),
        rnd(F.col("pr") * 1000, 6).alias("pr_permille"),
    ).orderBy("node_id")
