"""Round-8 graph wave: bounded-round k-core decomposition — the
degree-peeling dual of the connected-components family, as a
fixed-round DataFrame loop with an unrolled-CTE DuckDB oracle.

Reference basis: none (SURVEY §2.2 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_K = 3
_ROUNDS = 3


def _kcore_oracle() -> str:
    rounds = []
    prev = "e0"
    for i in range(1, _ROUNDS + 1):
        rounds.append(
            f"""d{i}s AS (
  SELECT s FROM {prev} GROUP BY s HAVING count(*) >= {_K}
), d{i}p AS (
  SELECT p FROM {prev} GROUP BY p HAVING count(*) >= {_K}
), e{i} AS (
  SELECT e.s, e.p FROM {prev} e
  JOIN d{i}s ds ON ds.s = e.s
  JOIN d{i}p dp ON dp.p = e.p
)"""
        )
        prev = f"e{i}"
    chain = ",\n".join(rounds)
    return f"""
WITH e0 AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
{chain},
deg AS (
  SELECT 'supp' AS node_type, s AS node_id, count(*)::BIGINT AS degree
  FROM {prev} GROUP BY s
  UNION ALL
  SELECT 'part', p, count(*)::BIGINT FROM {prev} GROUP BY p
)
SELECT node_type, node_id, degree FROM deg
ORDER BY node_type, node_id
"""


@register("q_kcore", shape="per_row", tags=("graph", "iterative", "kcore"), oracle=_kcore_oracle())
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peeling (k=3, 3 rounds) on the bipartite
    supplier-part graph from distinct lineitem pairs: each round drops
    nodes with degree < k on either side, then edges touching a dropped
    node.  Full k-core iterates to a fixpoint; the FIXED-round contract
    here is what both engines replay deterministically (document: round
    counts, not convergence, is the spec — same design as q_pagerank's
    fixed iterations).  Each round is one degree aggregate per side +
    two semi-joins — all keyed shuffles, no driver data; at 100 TB this
    is the standard peeling schedule (O(rounds) passes)."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    for _ in range(_ROUNDS):
        # each round annotates BOTH degrees as key-partitioned window
        # counts over the SAME edge set (simultaneous peel), then
        # filters once — a LINEAR plan chain where every stage has
        # exactly one consumer.  The aggregate+two-semi-join form
        # consumed each round's edges three times; without a persist
        # that compounds to dozens of parquet re-scans in the executed
        # plan (59 at 3 rounds — r09 review finding), and WITH a
        # per-round persist it either leaks pinned edge sets (the r08
        # advice item) or forces eager actions from a lazy registered
        # query.  Two keyed shuffles per round, no cache, one scan.
        edges = (
            edges.withColumn(
                "ds", F.count(F.lit(1)).over(W.partitionBy("s"))
            )
            .withColumn("dp", F.count(F.lit(1)).over(W.partitionBy("p")))
            .where((F.col("ds") >= _K) & (F.col("dp") >= _K))
            .select("s", "p")
        )
    deg_s = edges.groupBy("s").agg(F.count(F.lit(1)).alias("degree")).select(
        F.lit("supp").alias("node_type"),
        F.col("s").alias("node_id"),
        "degree",
    )
    deg_p = edges.groupBy("p").agg(F.count(F.lit(1)).alias("degree")).select(
        F.lit("part").alias("node_type"),
        F.col("p").alias("node_id"),
        "degree",
    )
    return deg_s.unionByName(deg_p)