"""Round-13 tokenizer-training wave: the FULL iterative BPE loop
(operators/bpe.py) through the oracle gate — ``text_bpe_merge_
candidates`` (text6.py) proved round one's pair counts; this proves
the training LOOP: argmax merge-rule adoption and greedy-leftmost
merge APPLICATION, three rounds unrolled in SQL the same way the
Lloyd k-means oracle unrolls its iterations.  The overlap-resolution
semantics (runs of consecutive matches keep alternate positions from
the run head) are replayed as a gaps-and-islands computation, so the
adopted rules AND their counts are hash-verified — a wrong overlap
rule in either engine breaks round 2's counts.

Reference basis: none (SURVEY §2.2 extension surface — tokenizer
training); Sennrich, Haddow, Birch 2016 (BPE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redis_streams_spark.functions.textfns import words_sql
from redis_streams_spark.operators.bpe import MAX_WORD_LEN
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_ROUNDS = 3


def _bpe_round_ctes(r: int) -> list[str]:
    """One unrolled BPE round: pairs over state s{r-1}, argmax rule
    b{r}, match positions m{r}, alternate-kept matches k{r} (islands),
    rebuilt state s{r}."""
    return [
        f"""p{r} AS (
  SELECT tok, freq, pos, sym,
         lead(sym) OVER (PARTITION BY tok ORDER BY pos) AS nsym
  FROM s{r - 1})""",
        f"""c{r} AS (
  SELECT sym AS left_sym, nsym AS right_sym, sum(freq)::BIGINT AS pair_count
  FROM p{r} WHERE nsym IS NOT NULL GROUP BY 1, 2)""",
        f"""b{r} AS (
  SELECT left_sym, right_sym, pair_count FROM c{r}
  ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1)""",
        f"""m{r} AS (
  SELECT p.tok, p.pos
  FROM p{r} p, b{r} b
  WHERE p.sym = b.left_sym AND p.nsym = b.right_sym)""",
        f"""k{r} AS (
  SELECT tok, pos FROM (
    SELECT tok, pos, min(pos) OVER (PARTITION BY tok, grp) AS rs
    FROM (SELECT tok, pos,
                 pos - row_number() OVER (PARTITION BY tok ORDER BY pos)
                   AS grp
          FROM m{r}) t) t2
  WHERE (pos - rs) % 2 = 0)""",
        f"""s{r} AS MATERIALIZED (
  SELECT tok, freq,
         row_number() OVER (PARTITION BY tok ORDER BY pos) - 1 AS pos,
         sym
  FROM (
    SELECT s.tok, s.freq, s.pos,
           CASE WHEN k.pos IS NOT NULL
                THEN (SELECT left_sym || right_sym FROM b{r})
                ELSE s.sym END AS sym
    FROM s{r - 1} s
    LEFT JOIN k{r} k ON k.tok = s.tok AND k.pos = s.pos
    LEFT JOIN k{r} c ON c.tok = s.tok AND c.pos = s.pos - 1
    WHERE c.pos IS NULL) u)""",
    ]


def _bpe_train_oracle() -> str:
    parts = [
        f"""wf AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest({words_sql('text')}) AS tok FROM documents) t
  GROUP BY tok)""",
        f"""s0 AS (
  SELECT tok, freq, i - 1 AS pos, tok[i:i] AS sym
  FROM wf, (SELECT unnest(range(1, {MAX_WORD_LEN + 1})) AS i) r
  WHERE i <= least(len(tok), {MAX_WORD_LEN}))""",
    ]
    for r in range(1, _ROUNDS + 1):
        parts += _bpe_round_ctes(r)
    finals = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, left_sym, right_sym, "
        f"left_sym || right_sym AS merged_sym, pair_count FROM b{r}"
        for r in range(1, _ROUNDS + 1)
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT round, left_sym, right_sym, merged_sym, pair_count
FROM ({finals}) f
ORDER BY round
"""


@register(
    "text_bpe_train",
    shape="bounded",
    tags=("text", "tokenizer", "iterative", "llm-pipeline"),
    oracle=_bpe_train_oracle(),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of real BPE training over the corpus vocabulary:
    pair counts (word-frequency weighted) → adopt the most frequent
    pair (ties to the lexicographically smaller) → APPLY the merge
    greedy-leftmost → recount.  Returns the adopted merge table; the
    oracle unrolls all three rounds including the overlap-resolution
    islands, so the loop's every decision is value-checked.  Scale
    shape: every round runs over the vocabulary, not the corpus — the
    corpus is touched once by the word-count aggregate."""
    from redis_streams_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs, rounds=_ROUNDS)


def _bpe_curve_oracle() -> str:
    parts = [
        f"""wf AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest({words_sql('text')}) AS tok FROM documents) t
  GROUP BY tok)""",
        f"""s0 AS (
  SELECT tok, freq, i - 1 AS pos, tok[i:i] AS sym
  FROM wf, (SELECT unnest(range(1, {MAX_WORD_LEN + 1})) AS i) r
  WHERE i <= least(len(tok), {MAX_WORD_LEN}))""",
    ]
    for r in range(1, _ROUNDS + 1):
        parts += _bpe_round_ctes(r)
    finals = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, sum(freq)::BIGINT AS total_tokens, "
        f"count(DISTINCT sym)::BIGINT AS n_symbols FROM s{r}"
        for r in range(0, _ROUNDS + 1)
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT round, total_tokens, n_symbols
FROM ({finals}) f
ORDER BY round
"""


# (sf_dir, rounds) -> collected merge rules.  READ-ONLY sharing of the
# TRAINED ARTIFACT (r13 optimization, the _shared_index /
# _shared_learned_index precedent): the merge table is a pure function
# of (documents, rounds), and the two consumer rows (curve, tokenize)
# each re-ran the full iterative training — ~3 s × rounds of per-round
# collects — before applying it.  text_bpe_train itself ALWAYS trains
# (its registered output is the training computation; only consumers
# read the cache it populates).  Per-process cache, like the index
# caches: every bench/oracle invocation still trains from parquet.
_BPE_RULES_CACHE: dict[tuple, list] = {}


def _shared_bpe_rules(spark: SparkSession, sf_dir: str, rounds: int) -> list:
    from redis_streams_spark.operators.bpe import bpe_train

    key = (sf_dir, rounds)
    rules = _BPE_RULES_CACHE.get(key)
    if rules is None:
        docs = load_table(spark, sf_dir, "documents")
        rules = bpe_train(docs, rounds=rounds).collect()
        _BPE_RULES_CACHE[key] = rules
    return rules


@register(
    "text_bpe_curve",
    shape="bounded",
    tags=("text", "tokenizer", "iterative", "llm-pipeline"),
    oracle=_bpe_curve_oracle(),
)
def text_bpe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE COMPRESSION CURVE: corpus token count (word-frequency
    weighted) and alphabet size after each training round — round 0 is
    the raw character tokenization, each merge round shrinks
    total_tokens by exactly its adopted pair_count and grows the
    symbol alphabet by one (both invariants implied, not assumed: the
    oracle recounts the rebuilt states).  This is the number a
    tokenizer-training run watches to pick its merge budget; at 100 TB
    the whole computation is vocabulary-sized."""
    from pyspark.sql import functions as F

    from redis_streams_spark.operators.bpe import (
        _apply_merge,
        bpe_train,
        bpe_word_symbols,
    )

    docs = load_table(spark, sf_dir, "documents")
    rules = _shared_bpe_rules(spark, sf_dir, _ROUNDS)
    state = bpe_word_symbols(docs).persist()
    frames = []
    persisted = [state]
    for r in range(0, _ROUNDS + 1):
        frames.append(
            state.agg(
                F.lit(r).alias("round"),
                F.sum("freq").alias("total_tokens"),
                F.count_distinct("sym").alias("n_symbols"),
            ).select("round", "total_tokens", "n_symbols")
        )
        if r < _ROUNDS:
            rule = rules[r]
            state = _apply_merge(
                state, rule["left_sym"], rule["right_sym"]
            ).persist()
            persisted.append(state)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    result = out.orderBy("round")
    # materialize before unpersisting the chain the union reads
    rows = result.collect()
    for f in persisted:
        f.unpersist()
    return spark.createDataFrame(rows, result.schema)


def _bpe_tokenize_oracle() -> str:
    parts = [
        f"""wf AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest({words_sql('text')}) AS tok FROM documents) t
  GROUP BY tok)""",
        f"""s0 AS (
  SELECT tok, freq, i - 1 AS pos, tok[i:i] AS sym
  FROM wf, (SELECT unnest(range(1, {MAX_WORD_LEN + 1})) AS i) r
  WHERE i <= least(len(tok), {MAX_WORD_LEN}))""",
    ]
    for r in range(1, _ROUNDS + 1):
        parts += _bpe_round_ctes(r)
    parts.append(
        f"""syms AS (
  SELECT tok, count(*)::BIGINT AS n_syms FROM s{_ROUNDS} GROUP BY tok)"""
    )
    parts.append(
        f"""docw AS (
  SELECT doc_id, unnest({words_sql('text')}) AS tok FROM documents)"""
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT d.doc_id, count(*)::BIGINT AS n_words,
       sum(s.n_syms)::BIGINT AS n_tokens
FROM docw d JOIN syms s ON s.tok = d.tok
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


@register(
    "text_bpe_tokenize",
    shape="per_row",
    tags=("text", "tokenizer", "llm-pipeline"),
    oracle=_bpe_tokenize_oracle(),
)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the TRAINED tokenizer: apply
    the three adopted merges to the vocabulary, map every word to its
    final symbol count, and aggregate per document — the trained
    replacement for ``text_stats``'s regex token proxy, and the number
    a token-budgeting pipeline actually bills by.  Scale shape: the
    corpus-sized work is one words-explode aggregate; merge
    application stays vocabulary-sized, and the per-doc count is a
    broadcast-joinable vocab map against the exploded words."""
    from pyspark.sql import functions as F

    from redis_streams_spark.functions.textfns import words
    from redis_streams_spark.operators.bpe import (
        _apply_merge,
        bpe_train,
        bpe_word_symbols,
    )

    docs = load_table(spark, sf_dir, "documents")
    rules = _shared_bpe_rules(spark, sf_dir, _ROUNDS)
    state = bpe_word_symbols(docs)
    for rule in rules:
        state = _apply_merge(state, rule["left_sym"], rule["right_sym"])
    syms = state.groupBy("tok").agg(F.count(F.lit(1)).alias("n_syms"))
    docw = docs.select("doc_id", F.explode(words("text")).alias("tok"))
    return (
        docw.join(F.broadcast(syms), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_tokens"),
        )
        # no presentation sort (order-insensitive gate; per_row plan
        # discipline)
    )
