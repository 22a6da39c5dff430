"""Exact set-similarity queries over ``documents`` (prefix-filter join
and containment), registered against brute-force DuckDB oracles.

The Spark side prunes (prefix filter / bucket bound); the oracle is the
unpruned quadratic ground truth — so a pruning bug that loses a true
pair fails the gate, which is the point of an EXACT similarity join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redis_streams_spark.functions.textfns import word_shingles_sql, words_sql
from redis_streams_spark.operators.setjoin import containment_pairs, prefix_filter_pairs
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_SETS_SQL = f"""
toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), sh AS (
  SELECT doc_id, {word_shingles_sql('w', 3)} AS g FROM toks
), s2 AS (
  SELECT doc_id, g, len(g) AS sz FROM sh WHERE len(g) > 0
)"""

_PREFIX_ORACLE = f"""
WITH {_SETS_SQL}
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       len(list_intersect(a.g, b.g))::BIGINT AS n_common,
       round(5e-10 + len(list_intersect(a.g, b.g)) * 1.0 /
             greatest(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)), 1),
             6) AS jaccard
FROM s2 a JOIN s2 b
  ON a.doc_id < b.doc_id
 AND b.sz >= a.sz * 0.5 AND a.sz >= b.sz * 0.5
WHERE round(5e-10 + len(list_intersect(a.g, b.g)) * 1.0 /
            greatest(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)), 1),
            6) >= 0.5
ORDER BY a_id, b_id
"""


@register("dedup_prefix_filter", shape="per_row", tags=("dedup", "setjoin"), oracle=_PREFIX_ORACLE)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-3-shingle Jaccard self-join at t = 0.5 via prefix
    filtering (rare-token prefixes + length filter + exact verify).
    Oracle is the unpruned all-pairs join: any lost true pair fails."""
    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_pairs(docs, n=3, threshold=0.5)


_CONTAIN_ORACLE = f"""
WITH {_SETS_SQL}
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       len(list_intersect(a.g, b.g))::BIGINT AS n_common,
       round(5e-10 + len(list_intersect(a.g, b.g)) * 1.0 /
             greatest(a.sz, 1), 6) AS containment
FROM s2 a JOIN s2 b
  ON a.doc_id <> b.doc_id AND b.sz >= a.sz * 0.6
WHERE round(5e-10 + len(list_intersect(a.g, b.g)) * 1.0 /
            greatest(a.sz, 1), 6) >= 0.6
ORDER BY a_id, b_id
"""


@register("text_containment", shape="per_row", tags=("dedup", "containment"), oracle=_CONTAIN_ORACLE)
def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs (|A∩B|/|A| ≥ 0.6, both directions)
    over the whole corpus via containment-prefix filtering — catches
    subset documents symmetric Jaccard misses.  Oracle is the unpruned
    all-pairs join: any lost true pair fails."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, n=3, threshold=0.6)
