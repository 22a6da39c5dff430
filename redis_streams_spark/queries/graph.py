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


@register("q_pagerank", shape="per_row", tags=("graph", "iterative"), oracle=_oracle_pagerank())
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
    # node count as a 1-row BROADCAST SCALAR (q_decay_score pattern), not
    # an eager .count(): building this query's plan must stay lazy —
    # plan-audit/driver tooling calls every registered fn without
    # executing it (review finding; same IEEE divisions either way).
    ndf = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    pr = nodes.crossJoin(F.broadcast(ndf)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(_ITERS):
        pr = (
            e.join(pr, e.src == pr.id)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("d")).alias("contrib"))
            .crossJoin(F.broadcast(ndf))
            .select(
                F.col("dst").alias("id"),
                (F.lit(0.15) / F.col("n") + _DAMP * F.col("contrib")).alias("pr"),
            )
        )
    return pr.select(
        F.col("id").alias("node_id"),
        F.when(F.col("id") >= _SUPP_OFFSET, "supplier")
        .otherwise("customer")
        .alias("node_type"),
        rnd(F.col("pr") * 1000, 6).alias("pr_permille"),
    )

_HITS_ITERS = 2


def _oracle_hits() -> str:
    """Unrolled fixed-iteration HITS as chained CTEs (same arithmetic as
    the Spark loop: full-double half-steps with L2 normalization, one
    final scaled round)."""
    its = []
    prev_h = "h0"
    for i in range(1, _HITS_ITERS + 1):
        its.append(
            f"""a{i}r AS (
  SELECT s, sum(p.h) AS a FROM base JOIN {prev_h} p USING (c) GROUP BY s
), a{i}n AS (
  SELECT sqrt(sum(a * a)) AS nrm FROM a{i}r
), a{i} AS (
  SELECT s, a / nrm AS a FROM a{i}r CROSS JOIN a{i}n
), h{i}r AS (
  SELECT c, sum(q.a) AS h FROM base JOIN a{i} q USING (s) GROUP BY c
), h{i}n AS (
  SELECT sqrt(sum(h * h)) AS nrm FROM h{i}r
), h{i} AS (
  SELECT c, h / nrm AS h FROM h{i}r CROSS JOIN h{i}n
)"""
        )
        prev_h = f"h{i}"
    k = _HITS_ITERS
    return f"""
WITH base AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), h0 AS (
  SELECT DISTINCT c, 1.0 AS h FROM base
), {", ".join(its)}
SELECT c AS node_id, 'hub' AS role,
       round(5e-10 + h * 1000, 6) AS score_permille
FROM h{k}
UNION ALL
SELECT s AS node_id, 'authority' AS role,
       round(5e-10 + a * 1000, 6) AS score_permille
FROM a{k}
"""


@register(
    "q_hits",
    shape="per_row",
    tags=("graph", "iterative", "hits"),
    oracle=_oracle_hits(),
)
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs/authorities, 2 rounds) on
    the bipartite customer→supplier trade graph — the natural HITS
    structure: customers are pure hubs, suppliers pure authorities.
    Each half-step is one equi-join + keyed sum followed by L2
    normalization via a 1-row broadcast scalar; full doubles throughout,
    ONE final scaled round (×1000 @ 6 dp), like q_pagerank.

    Scale shape: the edge list is built once and persisted (scanned
    2×iters times); every per-node frame stays distributed — norms are
    the only global reductions and they are single-row aggregates.  No
    windows, no sort (per-node output).

    Reference basis: none (no graph ops in redis-streams); standard
    HITS formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .persist()
    )
    hub = base.select("c").distinct().withColumn("h", F.lit(1.0))
    auth = None
    for i in range(_HITS_ITERS):
        a_raw = (
            base.join(hub, "c").groupBy("s").agg(F.sum("h").alias("a"))
        )
        a_norm = a_raw.agg(F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("nrm"))
        auth = a_raw.crossJoin(F.broadcast(a_norm)).select(
            "s", (F.col("a") / F.col("nrm")).alias("a")
        )
        if i == _HITS_ITERS - 1:
            # the final auth frame feeds BOTH the last hub half-step and
            # the output union — persist the tiny per-supplier frame so
            # the union's two branches share one execution of the
            # iteration chain instead of re-running it (q_kcore lesson)
            auth = auth.persist()
        h_raw = (
            base.join(auth, "s").groupBy("c").agg(F.sum("a").alias("h"))
        )
        h_norm = h_raw.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("nrm"))
        hub = h_raw.crossJoin(F.broadcast(h_norm)).select(
            "c", (F.col("h") / F.col("nrm")).alias("h")
        )
    hubs = hub.select(
        F.col("c").alias("node_id"),
        F.lit("hub").alias("role"),
        rnd(F.col("h") * 1000, 6).alias("score_permille"),
    )
    auths = auth.select(
        F.col("s").alias("node_id"),
        F.lit("authority").alias("role"),
        rnd(F.col("a") * 1000, 6).alias("score_permille"),
    )
    return hubs.unionAll(auths)


_TRI_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), und AS (
  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
), deg AS (
  SELECT u AS x, count(*)::BIGINT AS d FROM und GROUP BY u
), ori AS (
  SELECT CASE WHEN (du.d, e0.u) < (dv.d, e0.v) THEN e0.u ELSE e0.v END AS lo,
         CASE WHEN (du.d, e0.u) < (dv.d, e0.v) THEN e0.v ELSE e0.u END AS hi
  FROM e0 JOIN deg du ON du.x = e0.u JOIN deg dv ON dv.x = e0.v
), tri AS (
  SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
  FROM ori e1
  JOIN ori e2 ON e2.lo = e1.hi
  JOIN ori e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
)
SELECT node, count(*) AS n_triangles
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y AS node FROM tri
  UNION ALL SELECT z AS node FROM tri
) t
GROUP BY node
ORDER BY node
"""


@register("q_triangles", shape="per_row", tags=("graph", "triangles"), oracle=_TRI_ORACLE)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the part co-purchase graph (parts
    appearing in the same order are linked) — the clustering-coefficient
    numerator and a standard cohesion feature.

    Scale shape — degree-ordered edge orientation: each undirected edge
    is directed from its lower-(degree, id) endpoint to the higher one,
    which bounds every node's out-degree by O(sqrt(|E|)), so the wedge
    join (e1.hi = e2.lo) enumerates each triangle exactly once and the
    candidate set stays near-linear even with power-law hubs — THE
    published MapReduce triangle-counting shape (Suri & Vassilvitskii,
    WWW'11).  All three joins are equi-joins on node keys; the final
    membership probe is a semi-join-shaped equi-join on (lo, hi).

    Reference basis: none (no graph ops in redis-streams)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e0 = (
        a.join(b, ["ok"])
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    und = e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("u", "x")
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ed = e0.join(du, "u").join(dv, "v")
    u_first = F.struct(F.col("du").alias("d"), F.col("u").alias("n")) < F.struct(
        F.col("dv").alias("d"), F.col("v").alias("n")
    )
    # classic reuse-a-stage persist: ori feeds the wedge join twice and
    # the membership probe once; lifecycle: session-LRU bounded (2 ints
    # per edge), consumed within this query's job.
    ori = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
    ).persist()
    e1 = ori.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = ori.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "y")
    tri = wedges.join(
        ori,
        (wedges.x == ori.lo) & (wedges.z == ori.hi),
    ).select("x", "y", "z")
    nodes = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return (
        nodes.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


_LINKPRED_ORACLE = """
WITH sc AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), deg AS (
  SELECT s, count(*)::DOUBLE AS d FROM sc GROUP BY s
), pairs AS (
  SELECT a.s AS s_a, b.s AS s_b, count(*)::DOUBLE AS common
  FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
  GROUP BY 1, 2
)
SELECT s_a, s_b, common::BIGINT AS n_common,
       round(5e-10 + common / (da.d + db.d - common), 6) AS jaccard
FROM pairs
JOIN deg da ON da.s = pairs.s_a
JOIN deg db ON db.s = pairs.s_b
WHERE common >= 10
ORDER BY s_a, s_b
"""


@register("q_link_prediction", shape="per_row", tags=("graph", "similarity"), oracle=_LINKPRED_ORACLE)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction between suppliers: two
    suppliers are similar when their customer sets overlap (common
    neighbors ≥ 10), scored |A∩B| / |A∪B| — the common-neighbors family
    of link predictors over a bipartite interaction graph.

    Scale shape: pair generation joins the bipartite edge list to itself
    on the CUSTOMER key, so cost is Σ_c C(deg(c), 2) — bounded by the
    per-customer fan-out, not |suppliers|².  This is the right plan when
    one side's neighborhoods are bounded (a customer buys from a bounded
    set of suppliers); for unbounded-degree corpora switch to the LSH
    family in operators/similarity.py.  Degree lookups broadcast (one
    row per supplier).

    Reference basis: none."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sc = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    deg = sc.groupBy("s").agg(F.count(F.lit(1)).cast("double").alias("d"))
    a = sc.select(F.col("s").alias("s_a"), "c")
    b = sc.select(F.col("s").alias("s_b"), "c")
    pairs = (
        a.join(b, "c")
        .where(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(F.count(F.lit(1)).cast("double").alias("common"))
        .where(F.col("common") >= 10)
    )
    da = deg.select(F.col("s").alias("s_a"), F.col("d").alias("da"))
    db = deg.select(F.col("s").alias("s_b"), F.col("d").alias("db"))
    return (
        pairs.join(F.broadcast(da), "s_a")
        .join(F.broadcast(db), "s_b")
        .select(
            "s_a",
            "s_b",
            F.col("common").cast("long").alias("n_common"),
            rnd(
                F.col("common") / (F.col("da") + F.col("db") - F.col("common")), 6
            ).alias("jaccard"),
        )
    )
