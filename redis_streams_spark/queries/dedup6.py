"""Indexed ingest-dedup queries: the persisted dedup-signature index
(operators/dupindex.py) driven through the oracle gate.

``dedup_incremental`` (queries/dedup.py) verdicts an ingest batch
against the corpus by recomputing the history side's signatures from
raw text; these twins answer the SAME questions from the persisted
index — the driver-graded proof that build + probe (and the full
update/replace/delete lifecycle) is value-identical to the
from-scratch path, which DuckDB replays independently.
"""

from __future__ import annotations

import atexit
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.dedup import _BATCH_PRED, _incremental_oracle
from redis_streams_spark.session import load_table

# One persisted index per (process, sf_dir) over the HISTORY slice,
# shared by every read-only indexed query (the build-once-and-reuse
# discipline of queries/retrieval.py::_shared_index — a per-call
# static-overwrite rebuild could delete parquet files out from under a
# lazy DataFrame returned by an earlier call).
_INDEX_CACHE: dict[str, str] = {}


def _history_index(spark: SparkSession, sf_dir: str) -> str:
    path = _INDEX_CACHE.get(sf_dir)
    if path is None:
        from redis_streams_spark.operators.dupindex import build_dedup_index

        docs = load_table(spark, sf_dir, "documents")
        path = os.path.join(
            "/tmp/spark-graft-dupidx",
            f"{os.getpid()}-{uuid.uuid4().hex[:8]}",
        )
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        build_dedup_index(docs.where(~F.expr(_BATCH_PRED)), path)
        _INDEX_CACHE[sf_dir] = path
    return path


@register(
    "dedup_incremental_indexed",
    shape="bounded",
    tags=("dedup", "lsh", "ingest", "index"),
    oracle=_incremental_oracle(hashed=True),
)
def dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_incremental`` answered from the persisted signature
    index: docs with ``doc_id % 10 = 7`` play the incoming batch, the
    rest were indexed ONCE (digests + LSH band rows + hashed shingle
    sets); the probe digests/bands the batch fresh and equi-joins the
    index's signature-sized stores — at 100 TB the per-batch cost
    follows the batch, not the corpus (the from-scratch form
    re-tokenizes all of history every call).  Oracle: the incremental
    SQL with h32-hashed Jaccard verification (the index's stored
    resolution) — a green row proves build + probe value-identical
    end-to-end."""
    from redis_streams_spark.operators.dupindex import probe_dedup_index

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.expr(_BATCH_PRED))
    # persist=False: registered queries run repeatedly in long-lived
    # driver sessions (oracle sweeps, bench loops) and must not
    # accumulate cache entries — the probe's shared stages recompute,
    # batch-sized work (r11 advice)
    out = probe_dedup_index(
        batch, _history_index(spark, sf_dir), persist=False
    )
    # sentinel -1 for 'keep' rows (see the dedup_incremental oracle
    # comment on nullable-bigint float promotion)
    return out.withColumn("match_id", F.coalesce("match_id", F.lit(-1)))


_REFRESH_CORPUS = f"""corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 3 THEN text || ' refreshed zz'
              ELSE text END AS text
  FROM documents
  WHERE NOT (doc_id % 10 = 1)
)"""


def _refresh_oracle() -> str:
    body = _incremental_oracle("corpus", hashed=True)
    # splice the current-corpus CTE in front of the incremental body's
    # WITH list: history = documents with the %3 slice re-ingested
    # modified and the %1 slice deleted; the %7 batch rows are
    # untouched by either predicate
    assert body.lstrip().startswith("WITH ")
    return body.replace("WITH ", f"WITH {_REFRESH_CORPUS}, ", 1)


@register(
    "dedup_refresh_indexed",
    shape="bounded",
    tags=("dedup", "lsh", "ingest", "index", "lifecycle"),
    oracle=_refresh_oracle(),
)
def dedup_refresh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index LIFECYCLE through the oracle gate: build the history
    index, re-ingest the ``doc_id % 10 = 3`` slice with modified text
    (``replace=True`` tombstones the stale copies), tombstone-delete
    the ``doc_id % 10 = 1`` slice, then probe the batch.  DuckDB
    replays the same semantics from first principles over the CURRENT
    corpus (modified %3, deleted %1) — a green row proves the
    tombstone/replace machinery changes probe answers exactly as a
    from-scratch rebuild would.

    Mutating query: builds a private throwaway index per call (the
    text_bm25_replace precedent) — the shared read-only index is never
    touched."""
    from redis_streams_spark.operators.dupindex import (
        build_dedup_index,
        delete_from_dedup_index,
        probe_dedup_index,
        update_dedup_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.expr(_BATCH_PRED))
    history = docs.where(~F.expr(_BATCH_PRED))
    path = os.path.join(
        "/tmp/spark-graft-dupidx",
        f"refresh-{os.getpid()}-{uuid.uuid4().hex[:8]}",
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    build_dedup_index(history, path, managed=True)
    mod = history.where("doc_id % 10 = 3").withColumn(
        "text", F.concat(F.col("text"), F.lit(" refreshed zz"))
    )
    update_dedup_index(mod, path, segment="refresh", replace=True)
    delete_from_dedup_index(
        spark, path, history.where("doc_id % 10 = 1").select("doc_id"),
        segment="retire",
    )
    out = probe_dedup_index(batch, path, persist=False)
    return out.withColumn("match_id", F.coalesce("match_id", F.lit(-1)))


def _minhash_verify_oracle() -> str:
    """Band-agreement verification replayed from first principles:
    minhash signatures + LSH bands (the shared minhash_bands_cte SQL),
    candidates = batch×history band matches, near-dup when ≥ cutoff of
    the LSH_BANDS bands agree — cutoff = ceil(16 · 0.3²) = 2, the SAME
    integer rule the probe derives (no float seam).  Exact-digest stage
    and verdict precedence identical to the incremental oracle."""
    import math

    from redis_streams_spark.functions.hashing import (
        LSH_BANDS,
        ROWS_PER_BAND,
    )
    from redis_streams_spark.queries.dedup import (
        _NORM_SQL,
        minhash_bands_cte,
    )

    cutoff = max(1, math.ceil(LSH_BANDS * 0.3**ROWS_PER_BAND))
    return f"""
WITH {minhash_bands_cte()}, ch AS (
  SELECT doc_id, md5({_NORM_SQL}) AS content_hash FROM documents
), exact AS (
  SELECT b.doc_id, min(h.doc_id) AS exact_match
  FROM ch b JOIN ch h ON b.content_hash = h.content_hash
  WHERE b.{_BATCH_PRED} AND NOT h.{_BATCH_PRED}
  GROUP BY b.doc_id
), agree AS (
  SELECT a.doc_id, b.doc_id AS h_id, count(*) AS n_agree
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.{_BATCH_PRED} AND NOT b.{_BATCH_PRED}
  GROUP BY a.doc_id, b.doc_id
), near AS (
  SELECT doc_id, min(h_id) AS near_match
  FROM agree WHERE n_agree >= {cutoff}
  GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN e.exact_match IS NOT NULL THEN 'exact_dup'
            WHEN n.near_match IS NOT NULL THEN 'near_dup'
            ELSE 'keep' END AS verdict,
       coalesce(e.exact_match, n.near_match, -1) AS match_id
FROM documents d
LEFT JOIN exact e ON e.doc_id = d.doc_id
LEFT JOIN near n ON n.doc_id = d.doc_id
WHERE d.{_BATCH_PRED}
ORDER BY d.doc_id
"""


@register(
    "dedup_budget_minhash_verify",
    shape="bounded",
    tags=("dedup", "lsh", "ingest", "index", "budget"),
    oracle=_minhash_verify_oracle(),
)
def dedup_budget_minhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BYTE-BUDGET dedup index (r11 advice #6): built with
    ``store_shingles=False`` — no corpus-sized store at all, signatures
    only (40-byte digests + 16×8-byte band hashes per doc) — and probed
    with minhash-signature agreement instead of exact h32-Jaccard:
    near-dup when ≥ ceil(16·θ²) bands match, an integer rule derived
    from P[band match] = J².  DuckDB replays digests, signatures,
    bands, and the agreement cutoff from first principles.  The
    verdict-flip rate vs exact verification is quantified at 100× in
    SCALE.md (tools/dupindex_scale.py budget mode); the estimator's
    finite-sample error is the registered ``dedup_minhash_accuracy``.

    Mutating query: private throwaway index per call."""
    from redis_streams_spark.operators.dupindex import (
        build_dedup_index,
        probe_dedup_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.expr(_BATCH_PRED))
    history = docs.where(~F.expr(_BATCH_PRED))
    path = os.path.join(
        "/tmp/spark-graft-dupidx",
        f"budget-{os.getpid()}-{uuid.uuid4().hex[:8]}",
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    build_dedup_index(history, path, store_shingles=False)
    out = probe_dedup_index(batch, path, persist=False)  # auto -> minhash
    return out.withColumn("match_id", F.coalesce("match_id", F.lit(-1)))


_SPAN_N = 8

_SPAN_GRAMS_CTE = f"""toks AS (
  SELECT doc_id, {{words}} AS w FROM {{src}}
), pos_ AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - {_SPAN_N - 1})) AS pos
  FROM toks WHERE len(w) >= {_SPAN_N}
), grams AS (
  SELECT doc_id, pos,
         {{h60}} AS g
  FROM pos_
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), hits AS (
  SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)
), isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > {_SPAN_N}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM hits) t
), spans AS (
  SELECT doc_id,
         min(pos) AS span_start,
         max(pos) + {_SPAN_N - 1} AS span_end,
         max(pos) + {_SPAN_N - 1} - min(pos) + 1 AS span_tokens
  FROM isl GROUP BY doc_id, island
)"""


def _span_ctes(src: str = "documents") -> str:
    from redis_streams_spark.functions.hashing import h60_sql
    from redis_streams_spark.functions.textfns import words_sql

    gram = f"array_to_string(w[pos:pos + {_SPAN_N - 1}], ' ')"
    return _SPAN_GRAMS_CTE.format(
        words=words_sql("text"), h60=h60_sql(gram), src=src
    )


@register(
    "dedup_substring_spans",
    shape="per_row",
    tags=("dedup", "substring"),
    oracle=f"""
WITH {_span_ctes()}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
ORDER BY doc_id, span_start
""",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup (Lee et al. 2021's exact-substring pass,
    n-gram-fingerprint form): maximal duplicated token spans — every
    corpus position starting a word 8-gram that occurs ≥ 2 times
    anywhere (within- or cross-doc), merged into maximal overlapping/
    touching spans per doc via gaps-and-islands.  Two shuffles on the
    8-byte h60 fingerprint (count, semi-join back) + one doc_id window;
    document text never shuffles.  The h60 width is the collision
    budget: 32 bits would fabricate duplicated spans at ~10^5 distinct
    grams, 60 bits holds to ~10^9."""
    from redis_streams_spark.operators.dedup import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_spans(docs, n=_SPAN_N)


@register(
    "dedup_substring_profile",
    shape="per_row",
    tags=("dedup", "substring"),
    oracle=f"""
WITH {_span_ctes()}, roll AS (
  SELECT doc_id, count(*)::BIGINT AS n_spans,
         sum(span_tokens)::BIGINT AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT r.doc_id, r.n_spans, r.dup_tokens,
       len(t.w)::BIGINT AS n_tokens,
       round(5e-10 + r.dup_tokens / len(t.w)::DOUBLE, 6) AS dup_ratio
FROM roll r JOIN toks t ON t.doc_id = r.doc_id
ORDER BY r.doc_id
""",
)
def dedup_substring_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span rollup: span count, duplicated
    token mass, total tokens, and the dup ratio a pipeline trims or
    filters on (Lee et al. cut the spans from the text; Gopher-style
    hygiene drops docs past a repetition ratio — this frame feeds
    either policy)."""
    from redis_streams_spark.operators.dedup import duplicated_span_profile

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_profile(docs, n=_SPAN_N)


@register(
    "dedup_substring_clean",
    shape="per_row",
    tags=("dedup", "substring"),
    oracle=f"""
WITH {_span_ctes()}, covered AS (
  SELECT DISTINCT doc_id, unnest(generate_series(span_start, span_end)) AS pos
  FROM spans
), pos_tok AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS tok FROM toks
), kept AS (
  SELECT p.doc_id, p.pos, p.tok
  FROM pos_tok p LEFT JOIN covered c
    ON c.doc_id = p.doc_id AND c.pos = p.pos
  WHERE c.doc_id IS NULL
), rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text
FROM documents d LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
ORDER BY d.doc_id
""",
)
def dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-dedup REMEDY: duplicated spans cut from the
    normalized token stream, one row per input doc (fully-duplicated
    docs come back empty — keeping one canonical copy composes with
    exact dedup's is_canonical).  Covered positions are
    duplicate-mass-sized, the anti-join keys on (doc_id, pos), and the
    per-doc rebuild is one bounded aggregation — document text still
    never shuffles whole."""
    from redis_streams_spark.operators.dedup import strip_duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return strip_duplicated_spans(docs, n=_SPAN_N)


@register(
    "dedup_substring_incremental",
    shape="per_row",
    tags=("dedup", "substring", "ingest", "index"),
    oracle=f"""
WITH {_span_ctes()}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
WHERE doc_id % 10 = 7
ORDER BY doc_id, span_start
""",
)
def dedup_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL substring dedup from the persisted n-gram frequency
    index (operators/gramindex.py): docs ``% 10 = 7`` play the ingest
    batch, the rest were count-indexed once; the probe fingerprints
    only the batch and equi-joins the count store — history's gram mass
    is never re-fingerprinted (the from-scratch ``duplicated_spans``
    re-hashes the whole corpus per call).  Batch-internal repeats count
    toward the threshold exactly as corpus-level dedup would.  Oracle:
    the whole-corpus span replay restricted to batch docs — a green row
    proves build + probe value-identical to Lee-et-al over the full
    corpus."""
    from redis_streams_spark.operators.gramindex import (
        build_gram_index,
        probe_gram_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        "/tmp/spark-graft-gramidx",
        f"inc-{os.getpid()}-{uuid.uuid4().hex[:8]}",
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    build_gram_index(
        docs.where("doc_id % 10 != 7"), path, n=_SPAN_N, managed=True
    )
    return probe_gram_spans(docs.where("doc_id % 10 = 7"), path)


@register(
    "dedup_substring_refresh",
    shape="per_row",
    tags=("dedup", "substring", "ingest", "index", "lifecycle"),
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE NOT (doc_id % 10 = 1)
), {_span_ctes("corpus")}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
WHERE doc_id % 10 = 7
ORDER BY doc_id, span_start
""",
)
def dedup_substring_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gram index's MUTATION LIFECYCLE through the oracle gate:
    build on part of history, APPEND the rest as a count-partial
    segment, DELETE the ``% 10 = 1`` slice (a NEGATIVE count partial —
    this index has no tombstones at all; counts are associative, so
    subtraction IS deletion), COMPACT (nets every partial into one
    base segment), then probe the batch.  DuckDB recounts from first
    principles over the post-mutation corpus — a green row proves the
    negative-partial delete and the netting compaction leave probes
    answering exactly like a from-scratch recount.

    Mutating query: private throwaway index per call."""
    from redis_streams_spark.operators.gramindex import (
        build_gram_index,
        compact_gram_index,
        delete_from_gram_index,
        probe_gram_spans,
        update_gram_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        "/tmp/spark-graft-gramidx",
        f"rf-{os.getpid()}-{uuid.uuid4().hex[:8]}",
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    build_gram_index(
        docs.where("doc_id % 10 NOT IN (7, 9)"), path, n=_SPAN_N,
        managed=True,
    )
    update_gram_index(docs.where("doc_id % 10 = 9"), path, segment="u1")
    delete_from_gram_index(
        spark, path, docs.where("doc_id % 10 = 1"), segment="del-r1"
    )
    compact_gram_index(spark, path)
    return probe_gram_spans(docs.where("doc_id % 10 = 7"), path)
