"""Python-UDF taxonomy queries — every Python execution surface Spark
offers, each with deterministic arithmetic so the DuckDB oracle verifies
values (proving the Arrow plumbing, not just that code ran):

- scalar @pandas_udf  (vectorized Arrow batches)
- @udtf               (user-defined table function, lateral-join style)
- cogrouped applyInPandas (two-sided grouped pandas)

The mapInPandas surface is covered by mm_decode_features.  These exist to
complete SURVEY §2.2's 'UDF / UDAF / UDTF' row; production guidance
remains: built-ins first (see test_plans.py's no-UDF assertions on hot
paths).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q_pandas_udf_norm",
    shape="bounded",
    tags=("udf", "pandas"),
    oracle="""
SELECT vec_id,
       round(5e-10 + sqrt(list_reduce(
         list_transform(embedding, x -> (x::DOUBLE) * (x::DOUBLE)),
         (a, b) -> a + b)), 6) AS l2_norm,
       label
FROM embeddings
ORDER BY vec_id
""",
)
def q_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf computing L2 norms over Arrow batches; the
    oracle recomputes the same left-fold in SQL — the values prove the
    Arrow round-trip preserves float32→double semantics."""

    @pandas_udf("double")
    def l2_norm(v: pd.Series) -> pd.Series:
        def norm(arr) -> float:
            acc = 0.0
            for x in arr:  # explicit left fold: matches list_reduce order
                d = float(x)
                acc += d * d
            return acc ** 0.5

        return v.map(norm)

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", rnd(l2_norm("embedding"), 6).alias("l2_norm"), "label")
        .orderBy("vec_id")
    )


@register(
    "q_udtf_bigrams",
    shape="bounded",
    tags=("udf", "udtf"),
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       generate_subscripts(w, 1) - 1 AS pos,
       unnest(w) AS token
FROM toks
ORDER BY doc_id, pos
""",
)
def q_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding documents into (pos, token) rows — the
    table-function surface; oracle is the equivalent unnest."""

    @udtf(returnType="doc_id bigint, pos bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            import re

            toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
            for i, t in enumerate(toks):
                yield doc_id, i, t

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    spark.udtf.register("tokenize_udtf", Tokenize)
    docs.createOrReplaceTempView("docs_udtf_in")
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.token
        FROM docs_udtf_in, LATERAL tokenize_udtf(doc_id, text) t
        ORDER BY t.doc_id, t.pos
        """
    )


@register(
    "q_cogroup_reconcile",
    shape="bounded",
    tags=("udf", "cogroup"),
    oracle="""
WITH o AS (
  SELECT o_custkey AS custkey, count(*) AS n_orders,
         round(5e-10 + sum(o_totalprice), 2) AS order_value
  FROM orders WHERE o_custkey <= 300 GROUP BY o_custkey
), l AS (
  SELECT o_custkey AS custkey, count(DISTINCT l_orderkey)::BIGINT AS n_line_orders
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey <= 300
  GROUP BY o_custkey
)
SELECT coalesce(o.custkey, l.custkey) AS custkey,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(l.n_line_orders, 0) AS n_line_orders,
       coalesce(o.n_orders, 0) = coalesce(l.n_line_orders, 0) AS consistent,
       round(coalesce(o.order_value, 0.0), 2) AS order_value
FROM o FULL OUTER JOIN l ON o.custkey = l.custkey
ORDER BY custkey
""",
)
def q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: reconcile per-customer order counts from
    two independent sources (orders vs lineitem-derived) in one pandas
    callback per key group — the two-sided pandas surface.  Bounded to
    custkey <= 300: cogroup invokes the callback once PER KEY, so the
    per-group pandas overhead scales with key count, and 300 groups prove
    the surface at a fraction of the gate cost."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= 300)
        .select(F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_custkey") <= 300)
            .select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("custkey"), "l_orderkey")
    )

    def reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        n_orders = int(odf["o_orderkey"].nunique()) if len(odf) else 0
        order_value = round(float(odf["o_totalprice"].sum()) + 5e-10, 2) if len(odf) else 0.0
        n_line_orders = int(ldf["l_orderkey"].nunique()) if len(ldf) else 0
        return pd.DataFrame(
            {
                "custkey": [key[0]],
                "n_orders": [n_orders],
                "n_line_orders": [n_line_orders],
                "consistent": [n_orders == n_line_orders],
                "order_value": [order_value],
            }
        )

    out = orders.groupBy("custkey").cogroup(li.groupBy("custkey")).applyInPandas(
        reconcile,
        schema=(
            "custkey bigint, n_orders bigint, n_line_orders bigint, "
            "consistent boolean, order_value double"
        ),
    )
    return out.orderBy("custkey")


@register(
    "q_pandas_udaf",
    shape="bounded",
    tags=("udf", "udaf"),
    oracle="""
SELECT c_mktsegment,
       round(5e-10 + avg(c_acctbal), 4) AS mean_balance,
       round(5e-10 + max(c_acctbal) - min(c_acctbal), 2) AS balance_range
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF surface): per-segment mean
    and range computed in pandas, verified against plain SQL aggregates.
    numpy's pairwise mean matches SQL avg to ~1e-12 — far inside the
    4dp rounding."""

    @pandas_udf("double")
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    @pandas_udf("double")
    def range_udaf(v: pd.Series) -> float:
        return float(v.max() - v.min())

    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            rnd(mean_udaf("c_acctbal"), 4).alias("mean_balance"),
            rnd(range_udaf("c_acctbal"), 2).alias("balance_range"),
        )
        .orderBy("c_mktsegment")
    )
