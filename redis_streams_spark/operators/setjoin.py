"""Exact set-similarity join via prefix filtering (PPJoin-lite).

Complements the probabilistic LSH family in operators/dedup.py: LSH
banding trades recall for speed (false negatives possible below the
S-curve), while prefix filtering is EXACT — every pair with Jaccard ≥ t
is guaranteed to surface — at the cost of candidate sets that grow with
token-frequency skew.  Published basis: SSJoin/AllPairs/PPJoin
(Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07, Xiao et al. WWW'08).

Scale design (100 TB posture):
- The global token order that prefix filtering requires is the pair
  (document-frequency, token) itself — NOT a dense global rank.  That
  removes the classic scalability trap (an unpartitioned window / zip
  to assign rank numbers): each document sorts its OWN tokens by the
  (df, token) key, which is a total order shared by all documents.
- Stages are: one shuffle on token (df count + df join), one re-agg by
  doc_id (signature rebuild), one equi-join on prefix token, one verify
  join on doc_id.  No global sort, no driver materialization.
- The length filter (t·|A| ≤ |B| ≤ |A|/t) prunes candidates before
  dedup; the exact Jaccard verify keeps only true pairs, so skewed
  common tokens cost shuffle volume, never correctness.

Reference basis: none — the reference (redis-streams) has no similarity
surface; cited papers are the public algorithmic source.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.operators.dedup import shingle_sets


def _prefix_tokens(sets_: DataFrame, threshold: float) -> DataFrame:
    """(doc_id, sz, tok) prefix rows shared by both join variants: count
    token document-frequency, rebuild each doc's rare-first (df, token)
    signature, and keep the first ``|x| − ⌈t·|x|⌉ + 1`` tokens."""
    t = float(threshold)
    tok = sets_.select("doc_id", F.explode("shingles").alias("tok"))
    df_ = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        tok.join(df_, "tok")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("ordered"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    prefix_len = (
        F.col("sz") - F.ceil(F.col("sz") * F.lit(t)) + 1
    ).cast("int")
    return (
        ranked.select(
            "doc_id", "sz", F.explode(F.slice("ordered", 1, prefix_len)).alias("p")
        )
        .select("doc_id", "sz", F.col("p.tok").alias("tok"))
    )


def _verify_sides(sets_: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The exact-verify join sides over the persisted shingle sets."""
    sa = sets_.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa"))
    sb = sets_.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb"))
    return sa, sb



def prefix_filter_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All document pairs with word-``n``-shingle Jaccard ≥ ``threshold``
    — EXACT (no false negatives), via prefix filtering.

    Prefix principle: order every document's token set by ascending
    document frequency (rare first; ties broken by token text).  If
    J(A, B) ≥ t then A and B must share at least one token among each
    one's first ``|x| − ⌈t·|x|⌉ + 1`` tokens — so the candidate join
    only needs the prefixes, and the rare-first order keeps prefix
    postings short.

    Returns (a_id, b_id, n_common, jaccard) for verified pairs.
    """
    sets_ = (
        shingle_sets(docs, n).where(F.size("shingles") > 0).persist()
    )  # reuse-a-stage persist: feeds df-count, prefix build, and both
    # verify sides; session-LRU bounded, consumed within this query.
    ptok = _prefix_tokens(sets_, threshold)
    a = ptok.select(
        F.col("doc_id").alias("a_id"), F.col("sz").alias("sz_a"), "tok"
    )
    b = ptok.select(
        F.col("doc_id").alias("b_id"), F.col("sz").alias("sz_b"), "tok"
    )
    t = float(threshold)
    cands = (
        a.join(b, "tok")
        .where(
            (F.col("a_id") < F.col("b_id"))
            # length filter: J ≥ t ⇒ t·|A| ≤ |B| and t·|B| ≤ |A|
            & (F.col("sz_b") >= F.col("sz_a") * t)
            & (F.col("sz_a") >= F.col("sz_b") * t)
        )
        .select("a_id", "b_id")
        .distinct()
    )
    sa, sb = _verify_sides(sets_)
    joined = cands.join(sa, "a_id").join(sb, "b_id")
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    jac = inter * 1.0 / F.greatest(union, F.lit(1))
    return (
        joined.select(
            "a_id",
            "b_id",
            inter.cast("long").alias("n_common"),
            rnd(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= math.floor(t * 1e6) / 1e6)
    )


def containment_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.6
) -> DataFrame:
    """Ordered pairs (a, b) where containment |A∩B| / |A| ≥ ``threshold``
    — catches SUBSET duplication (a doc whose shingles are mostly inside
    another's), which symmetric Jaccard misses when sizes differ.  EXACT
    (no false negatives), both directions emitted since containment is
    asymmetric.

    Prefix principle for containment: if |A∩B| ≥ ⌈t·|A|⌉ then B must
    contain at least one of A's first ``|A| − ⌈t·|A|⌉ + 1`` tokens in the
    rare-first (df, token) order — so the probe side carries only A's
    prefix while the build side is the full inverted index (no size
    bound exists on B beyond |B| ≥ t·|A|).  A first cut of this operator
    used a provenance-bucket quadratic join; measured at 10× data it
    grew 44× (pairs are quadratic in bucket occupancy) — the prefix
    rewrite is the scale-correct shape, same measurement now ~linear.
    """
    sets_ = (
        shingle_sets(docs, n).where(F.size("shingles") > 0).persist()
    )  # reuse-a-stage persist: feeds df-count, prefix, index, verify.
    t = float(threshold)
    tok = sets_.select("doc_id", F.explode("shingles").alias("tok"))
    a = _prefix_tokens(sets_, t).select(
        F.col("doc_id").alias("a_id"),
        F.col("sz").alias("sz_a"),
        "tok",
    )
    sizes = sets_.select("doc_id", F.size("shingles").alias("sz_b"))
    b = tok.join(sizes, "doc_id").select(
        F.col("doc_id").alias("b_id"), "sz_b", "tok"
    )
    cands = (
        a.join(b, "tok")
        .where(
            (F.col("a_id") != F.col("b_id"))
            & (F.col("sz_b") >= F.col("sz_a") * t)  # |A∩B| ≤ |B| bound
        )
        .select("a_id", "b_id")
        .distinct()
    )
    sa, sb = _verify_sides(sets_)
    joined = cands.join(sa, "a_id").join(sb, "b_id")
    inter = F.size(F.array_intersect("sa", "sb"))
    cont = inter * 1.0 / F.greatest(F.size("sa"), F.lit(1))
    return (
        joined.select(
            "a_id",
            "b_id",
            inter.cast("long").alias("n_common"),
            rnd(cont, 6).alias("containment"),
        )
        # compare against the 6dp-floor of t: `containment` is rounded at
        # 6 dp, so a raw-threshold compare would drop true pairs whenever
        # t itself isn't 6dp-representable (e.g. 1/3) — same guard as
        # prefix_filter_pairs
        .where(F.col("containment") >= math.floor(t * 1e6) / 1e6)
    )
