"""Distributed BPE-merge training (Sennrich et al. 2016): the full
iterative tokenizer-training loop — count adjacent symbol pairs over
the word-frequency table, adopt the most frequent pair as a merge
rule, APPLY it (greedy, leftmost-first, the reference BPE semantics),
and repeat — as deterministic DataFrame rounds, oracle-replayable the
same way the Lloyd k-means loop is.

``text_bpe_merge_candidates`` (queries/text6.py) registered round
one's pair COUNTS; this operator runs the actual training loop with
merge APPLICATION, whose only subtlety is overlap resolution: in
``aaa`` with rule (a,a), the leftmost pair merges and the middle
``a`` is consumed.  Overlapping matches are only possible when
left == right (with left ≠ right, positions i and i+1 cannot both
match — sym[i+1] would have to equal both), so greedy-leftmost
reduces to: within each RUN of consecutive match positions, keep
every other match starting from the run head — a gaps-and-islands
computation, exactly replayable in SQL.

Scale shape: everything runs over the VOCABULARY (the word-frequency
table), not the corpus — the corpus-sized work is one groupBy(tok).
Per round: one window (adjacent pairs), one vocab-sized aggregate,
one 1-row argmax collect (the merge rule — the kmeans centroid
pattern), one islands window, one rebuild projection.  Rounds are
persisted so round r+1 reads a materialized round r instead of
re-executing the whole chain (the kmeans_assign lesson).

Reference basis: none (SURVEY §2.2 extension surface — tokenizer
training for LLM data pipelines); Sennrich, Haddow, Birch 2016.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.textfns import words

__all__ = ["bpe_train", "bpe_word_symbols"]

MAX_WORD_LEN = 40


def bpe_word_symbols(docs: DataFrame) -> DataFrame:
    """(tok, freq, pos, sym): the word-frequency table split to
    0-based per-character symbol rows — BPE round 0's state.  Words
    cap at ``MAX_WORD_LEN`` chars (tail chars dropped, same bound as
    text_bpe_merge_candidates)."""
    wf = (
        docs.select(F.explode(words("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        wf.select(
            "tok",
            "freq",
            F.posexplode(F.split(F.col("tok"), "(?!^)")).alias("pos", "sym"),
        )
        # Spark's split keeps the trailing empty match of the (?!^)
        # lookahead (one "" at pos = len(tok)); the oracle's
        # range-bounded tok[i:i] never produces it
        .where((F.col("pos") < MAX_WORD_LEN) & (F.col("sym") != ""))
    )


def _apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    """One greedy-leftmost merge application over (tok, freq, pos,
    sym): match positions → runs of consecutive matches → keep
    alternate matches from each run head → rebuild with renumbered
    positions."""
    nxt = F.lead("sym").over(W.partitionBy("tok").orderBy("pos"))
    m = (
        state.withColumn("nsym", nxt)
        .where((F.col("sym") == left) & (F.col("nsym") == right))
        .select("tok", "pos")
    )
    # islands: consecutive match positions share (pos - row_number)
    grp = (
        F.col("pos")
        - F.row_number().over(W.partitionBy("tok").orderBy("pos"))
    ).alias("grp")
    runs = m.select("tok", "pos", grp)
    run_start = F.min("pos").over(W.partitionBy("tok", "grp"))
    kept = (
        runs.withColumn("rs", run_start)
        .where((F.col("pos") - F.col("rs")) % 2 == 0)
        .select("tok", "pos")
    )
    consumed = kept.select("tok", (F.col("pos") + 1).alias("pos"))
    merged_sym = left + right
    out = (
        state.join(
            kept.withColumn("is_merge", F.lit(True)), ["tok", "pos"], "left"
        )
        .join(
            consumed.withColumn("is_consumed", F.lit(True)),
            ["tok", "pos"],
            "left",
        )
        .where(F.col("is_consumed").isNull())
        .select(
            "tok",
            "freq",
            "pos",
            F.when(F.col("is_merge").isNotNull(), F.lit(merged_sym))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    return out.select(
        "tok",
        "freq",
        (
            F.row_number().over(W.partitionBy("tok").orderBy("pos")) - 1
        ).alias("pos"),
        "sym",
    )


def bpe_train(docs: DataFrame, rounds: int = 3) -> DataFrame:
    """Run ``rounds`` BPE training rounds over the corpus's word-
    frequency table.  Each round counts adjacent symbol pairs
    (weighted by word frequency), adopts the most frequent pair as
    the round's merge rule (ties to the lexicographically smaller
    (left, right) — deterministic cross-engine), and applies it
    greedy-leftmost.  Returns the merge table: (round, left_sym,
    right_sym, merged_sym, pair_count), ``rounds`` rows."""
    spark = docs.sparkSession
    state = bpe_word_symbols(docs).persist()
    state.count()
    rules = []
    persisted = [state]
    try:
        for r in range(1, rounds + 1):
            nxt = F.lead("sym").over(W.partitionBy("tok").orderBy("pos"))
            counts = (
                state.withColumn("nsym", nxt)
                .where(F.col("nsym").isNotNull())
                .groupBy(
                    F.col("sym").alias("left_sym"),
                    F.col("nsym").alias("right_sym"),
                )
                .agg(F.sum("freq").alias("pair_count"))
            )
            best = (
                counts.orderBy(
                    F.desc("pair_count"), "left_sym", "right_sym"
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            b = best[0]
            rules.append(
                (
                    r,
                    b["left_sym"],
                    b["right_sym"],
                    b["left_sym"] + b["right_sym"],
                    int(b["pair_count"]),
                )
            )
            state = _apply_merge(
                state, b["left_sym"], b["right_sym"]
            ).persist()
            state.count()
            persisted.append(state)
    finally:
        # the merge table is driver-side; round states served their
        # purpose once the next round materialized
        for f in persisted:
            f.unpersist()
    return spark.createDataFrame(
        rules,
        "round INT, left_sym STRING, right_sym STRING, "
        "merged_sym STRING, pair_count BIGINT",
    )
