"""Round-12 learned-coarse-quantizer wave: the managed vector index's
k-means codebook (operators/vecindex.py) driven through the oracle
gate, including the full mutation lifecycle and the Arrow/BLAS probed-
cell scoring path.

With label-keyed cells, n_cells is pinned to the data's label
cardinality — the n_cells ∝ √corpus sizing rule is unreachable (r11
verdict ask #1).  These queries prove the learned replacement end to
end: DuckDB replays the ENTIRE chain from first principles — the
unrolled Lloyd training (fixed seeds, fixed rounds, 6-dp rounding at
every step, the sim_kmeans_clusters discipline), the pinned per-vector
cell assignment against the frozen codebook, the live per-cell means
the index reconstructs from its centroid partials, probe selection,
and the n-probe search itself.

Reference basis: none (SURVEY §2.2 extension surface — similarity
search); the codebook design follows the published FAISS IVF /
Lucene-HNSW "quantizer trained at build, assignments pinned, retrain
on merge" discipline restated as DataFrame ops + parquet stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.similarity import _cos, _E_CTE
from redis_streams_spark.session import load_table

_K = 10
_QUERY_MOD = 25
_N_PROBE = 2
_N_CELLS = 8
_ITERS = 2

_COS_EC = _cos("e.v", "e.norm", "c.cv", "c.cnorm")


def _codebook_ctes(src: str, k: int, iters: int) -> list[str]:
    """Unrolled deterministic Lloyd over table ``src`` (the
    _kmeans_oracle machinery with index-cell ids): seeds = the k
    smallest vec_ids' vectors numbered 0..k-1 in vec_id order, 6-dp
    cosine argmax with lower-cell tiebreak, 6-dp per-dim rebuild,
    fixed rounds.  Ends with ``cent{iters}`` = the frozen codebook."""
    parts = [
        f"""cent0 AS (
  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cell,
         v AS cv, norm AS cnorm
  FROM (SELECT vec_id, v, norm FROM {src} ORDER BY vec_id LIMIT {k}) s)"""
    ]
    for i in range(iters):
        cos = _cos("e.v", "e.norm", "c.cv", "c.cnorm")
        parts.append(
            f"""kasg{i + 1} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos} DESC, c.cell) AS rn
    FROM {src} e CROSS JOIN cent{i} c) t
  WHERE rn = 1)"""
        )
        parts.append(
            f"""kbd{i + 1} AS (
  SELECT cell, dim, round(5e-10 + avg(val), 6) AS cval
  FROM (SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS dim
        FROM kasg{i + 1}) t
  GROUP BY cell, dim)"""
        )
        parts.append(
            f"""cent{i + 1} AS (
  SELECT cell, cv,
         sqrt(list_reduce(list_transform(cv, x -> x * x),
                          (a, b) -> a + b)) AS cnorm
  FROM (SELECT cell, list(cval ORDER BY dim) AS cv
        FROM kbd{i + 1} GROUP BY cell) t)"""
        )
    return parts


def _learned_parts(
    train_src: str, live_src: str, iters: int, n_cells: int = _N_CELLS
) -> list[str]:
    """The coarse-quantizer replay SHARED by every learned-index
    oracle: codebook training on ``train_src``, pinned per-vector cell
    assignment over ``live_src`` (``pinned``), live per-cell means from
    the pinned cells (``cmeans`` — what the index's merged centroid
    partials reconstruct), the query set (``q``), and probe selection
    (``probes``).  similarity7's IVF-PQ oracle appends its own
    compressed-domain scoring after ``probes`` instead of the exact
    scored/topk tail :func:`_learned_search_sql` adds."""
    cos_pin = _cos("l.v", "l.norm", "c.cv", "c.cnorm")
    cos_probe = _cos("q.qv", "q.qn", "c.cv", "c.cnorm")
    parts = _codebook_ctes(train_src, n_cells, iters)
    parts.append(
        f"""pinned AS (
  SELECT vec_id, v, norm, cell FROM (
    SELECT l.vec_id, l.v, l.norm, c.cell,
           row_number() OVER (PARTITION BY l.vec_id
                              ORDER BY {cos_pin} DESC, c.cell) AS rn
    FROM {live_src} l CROSS JOIN cent{iters} c) t
  WHERE rn = 1)"""
    )
    parts.append(
        """cmbd AS (
  SELECT cell, dim, round(5e-10 + avg(val), 6) AS cval
  FROM (SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS dim
        FROM pinned) t
  GROUP BY cell, dim)"""
    )
    parts.append(
        """cmeans AS (
  SELECT cell, cv,
         sqrt(list_reduce(list_transform(cv, x -> x * x),
                          (a, b) -> a + b)) AS cnorm
  FROM (SELECT cell, list(cval ORDER BY dim) AS cv
        FROM cmbd GROUP BY cell) t)"""
    )
    parts.append(
        f"""q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qn
  FROM {live_src} WHERE vec_id % {_QUERY_MOD} = 0)"""
    )
    parts.append(
        f"""probes AS (
  SELECT query_id, qv, qn, cell FROM (
    SELECT q.query_id, q.qv, q.qn, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_probe} DESC, c.cell) AS pr
    FROM q CROSS JOIN cmeans c) t
  WHERE pr <= {_N_PROBE})"""
    )
    return parts


def _learned_search_sql(
    train_src: str, live_src: str, k: int, iters: int,
    n_cells: int = _N_CELLS, cand_filter: str = "",
) -> str:
    """probes + search over ``live_src`` with cells pinned against the
    codebook trained on ``train_src``: pinned assignment (argmax vs the
    frozen codebook), live per-cell means (what the index's merged
    centroid partials reconstruct), probe rank, n-probe top-k.
    ``cand_filter`` (an AND-able predicate over alias ``l``) restricts
    the CANDIDATE side only — pre-filter semantics: top-k among allowed
    vectors, queries and probe selection untouched."""
    cos_cand = _cos("p.qv", "p.qn", "l.v", "l.norm")
    parts = _learned_parts(train_src, live_src, iters, n_cells)
    parts.append(
        f"""scored AS (
  SELECT p.query_id, l.vec_id AS cand_id, l.cell AS probed_cell,
         {cos_cand} AS cosine
  FROM probes p JOIN pinned l
    ON l.cell = p.cell AND l.vec_id <> p.query_id{cand_filter})"""
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT query_id, cand_id, probed_cell, cosine, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rank
      FROM scored) t
WHERE rank <= {k}
ORDER BY query_id, rank"""


_LEARNED_ORACLE = f"WITH {_E_CTE},\n" + _learned_search_sql(
    "e", "e", _K, _ITERS
)


def _topk_cols(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return df.select(
        "query_id",
        "cand_id",
        F.col("probed_label").cast("int").alias("probed_cell"),
        "cosine",
        "rank",
    )


def _fresh_path(tag: str) -> str:
    import atexit
    import os
    import shutil
    import uuid

    path = os.path.join(
        "/tmp/spark-graft-vecidx",
        f"{tag}-{os.getpid()}-{uuid.uuid4().hex[:8]}",
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


# (sf_dir, sorted build params) -> built index path.  READ-ONLY sharing
# (r13 optimization, the retrieval._shared_index precedent): the managed
# learned index is a pure function of (embeddings, build params), and the
# three non-mutating rows that search it (sim_ann_learned,
# sim_ann_filtered, rag_hybrid_indexed via sim_ann_learned) each paid the
# full k-means build — 8-14 s of Lloyd training per query at sf0.001,
# ~30% of the whole correctness gate when combined with the ivfpq twin.
# Mutating queries (lifecycle/retrain) keep private _fresh_path builds.
# The cache is per-process: every bench/oracle invocation still builds
# from the parquet inputs.
_SHARED_VECIDX_CACHE: dict[tuple, str] = {}

# (sf_dir, k, iters) -> collected deterministic-Lloyd codebook rows, and
# (sf_dir, m, ksub, iters) -> collected PQ codebook rows (r13
# optimization round).  The trained quantizers are pure functions of
# (embeddings, params) — the SAME coarse codebook was trained once for
# the plain learned index and AGAIN for its IVF-PQ twin (different
# _SHARED_VECIDX_CACHE keys), and sim_pq_rerank trained the identical
# PQ books a third time; each training is a multi-job Lloyd loop (~13 s
# of the sf0.001 gate apiece).  Collected k-row artifacts, re-emitted as
# LocalRelations per consumer — per-process like every shared-build
# cache here, so each invocation still trains from the parquet inputs.
_SHARED_CODEBOOK_CACHE: dict[tuple, list] = {}
_SHARED_PQBOOK_CACHE: dict[tuple, list] = {}

_CODEBOOK_SCHEMA = "cell INT, cv ARRAY<DOUBLE>, cnorm DOUBLE"
_PQBOOK_SCHEMA = "s INT, code INT, cv ARRAY<DOUBLE>"


def _shared_codebook(
    spark: SparkSession, sf_dir: str, n_cells: int, iters: int
) -> DataFrame:
    from redis_streams_spark.operators.vecindex import (
        _train_codebook,
        as_double_vec,
    )

    key = (sf_dir, n_cells, iters)
    rows = _SHARED_CODEBOOK_CACHE.get(key)
    if rows is None:
        emb = load_table(spark, sf_dir, "embeddings")
        rows = _train_codebook(
            as_double_vec(emb).select("vec_id", "v", "norm"),
            n_cells,
            iters,
        ).collect()
        _SHARED_CODEBOOK_CACHE[key] = rows
    return spark.createDataFrame(rows, _CODEBOOK_SCHEMA)


def _shared_pqbook(
    spark: SparkSession, sf_dir: str, m: int, ksub: int, iters: int
) -> DataFrame:
    from redis_streams_spark.operators.similarity import pq_train_codebooks
    from redis_streams_spark.operators.vecindex import as_double_vec

    key = (sf_dir, m, ksub, iters)
    rows = _SHARED_PQBOOK_CACHE.get(key)
    if rows is None:
        emb = load_table(spark, sf_dir, "embeddings")
        rows = pq_train_codebooks(as_double_vec(emb), m, ksub, iters).collect()
        _SHARED_PQBOOK_CACHE[key] = rows
    return spark.createDataFrame(rows, _PQBOOK_SCHEMA)


def _shared_learned_index(spark: SparkSession, sf_dir: str, **params) -> str:
    from redis_streams_spark.operators.vecindex import build_vector_index

    key = (sf_dir, tuple(sorted(params.items())))
    path = _SHARED_VECIDX_CACHE.get(key)
    if path is None:
        emb = load_table(spark, sf_dir, "embeddings")
        path = _fresh_path("shared")
        # inject the session-shared quantizer artifacts (identical to
        # what the build would train — see _shared_codebook above)
        inject = dict(params)
        if params.get("n_cells") is not None and "codebook" not in params:
            inject["codebook"] = _shared_codebook(
                spark, sf_dir, params["n_cells"], params.get("train_iters", 2)
            )
        if params.get("pq_m") is not None and "pqbook" not in params:
            inject["pqbook"] = _shared_pqbook(
                spark,
                sf_dir,
                params["pq_m"],
                params.get("pq_ksub", 8),
                params.get("pq_iters", 2),
            )
        build_vector_index(emb, path, **inject)
        _SHARED_VECIDX_CACHE[key] = path
    return path


@register(
    "sim_ann_learned",
    shape="bounded",
    tags=("similarity", "ann", "index", "kmeans"),
    oracle=_LEARNED_ORACLE,
)
def sim_ann_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed vector index with a LEARNED k-means codebook (8 cells,
    2 Lloyd rounds trained on the corpus at build), searched 2-probe
    top-10 through the Arrow/BLAS probed-cell kernel (scoring="np").
    The oracle replays training, pinned assignment, live cell means,
    probe selection, and search from first principles in SQL — a green
    row proves the whole learned-quantizer chain AND that the BLAS
    physical path is value-identical to the engine-pure one (both
    paths are asserted equal in tests; this registers the np path so
    the driver grades it)."""
    from redis_streams_spark.operators.vecindex import vector_topk_indexed

    # read-only search: share the build (r13 — see _shared_learned_index)
    path = _shared_learned_index(
        spark, sf_dir, managed=True, n_cells=_N_CELLS, train_iters=_ITERS
    )
    return _topk_cols(
        vector_topk_indexed(
            spark, path, k=_K, query_mod=_QUERY_MOD, n_probe=_N_PROBE,
            scoring="np",
        )
    )


_LIFECYCLE_ORACLE = (
    """WITH e0 AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> x::DOUBLE) AS v0
  FROM embeddings
),
train AS (
  SELECT vec_id, v0 AS v,
         sqrt(list_reduce(list_transform(v0, x -> x * x),
                          (a, b) -> a + b)) AS norm
  FROM e0 WHERE vec_id % 3 != 2
),
live AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x),
                          (a, b) -> a + b)) AS norm
  FROM (SELECT vec_id,
               CASE WHEN vec_id % 7 = 3
                    THEN list_concat([v0[1] + 0.5], v0[2:])
                    ELSE v0 END AS v
        FROM e0
        WHERE NOT (vec_id % 11 = 5)) s
),
"""
    + _learned_search_sql("train", "live", _K, _ITERS)
)


@register(
    "sim_ann_learned_lifecycle",
    shape="bounded",
    tags=("similarity", "ann", "index", "kmeans", "lifecycle"),
    oracle=_LIFECYCLE_ORACLE,
)
def sim_ann_learned_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned-codebook index's MUTATION LIFECYCLE through the
    oracle gate: train on the ``vec_id % 3 != 2`` slice at build,
    append the rest as a segment (pinned against the frozen codebook),
    re-embed the ``%7=3`` slice (first dimension +0.5,
    ``replace=True``), tombstone-delete ``%11=5``, then 2-probe
    search.  DuckDB replays the codebook training on the BUILD slice,
    re-pins every live vector's cell from its CURRENT embedding, and
    reconstructs the live cell means — exactly what the index answers
    through read-time-merged centroid partials after the mutations.  A
    green row proves segment append, replace tombstones, negative
    partials, and pinned assignments leave the index answering like a
    same-codebook rebuild over the live corpus.

    Mutating query: private throwaway index per call (the
    sim_ann_lifecycle precedent)."""
    from pyspark.sql import functions as F

    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        delete_from_vector_index,
        update_vector_index,
        vector_topk_indexed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _fresh_path("learned-lc")
    build_vector_index(
        emb.where("vec_id % 3 != 2"),
        path,
        managed=True,
        n_cells=_N_CELLS,
        train_iters=_ITERS,
    )
    update_vector_index(emb.where("vec_id % 3 = 2"), path, segment="u1")
    mod = emb.where("vec_id % 7 = 3").withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: F.when(
                i == 0, x.cast("double") + F.lit(0.5)
            ).otherwise(x.cast("double")),
        ),
    )
    update_vector_index(mod, path, segment="r1", replace=True)
    delete_from_vector_index(
        spark, path, emb.where("vec_id % 11 = 5").select("vec_id"),
        segment="d1",
    )
    return _topk_cols(
        vector_topk_indexed(
            spark, path, k=_K, query_mod=_QUERY_MOD, n_probe=_N_PROBE
        )
    )


_RETRAIN_CELLS = 6

_RETRAIN_ORACLE = (
    """WITH e0 AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
live AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x),
                          (a, b) -> a + b)) AS norm
  FROM e0 WHERE NOT (vec_id % 11 = 5)
),
"""
    + _learned_search_sql("live", "live", _K, _ITERS, _RETRAIN_CELLS)
)


@register(
    "sim_ann_learned_retrain",
    shape="bounded",
    tags=("similarity", "ann", "index", "kmeans", "lifecycle"),
    oracle=_RETRAIN_ORACLE,
)
def sim_ann_learned_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRAIN-ON-COMPACT through the oracle gate: build the learned
    index on a slice, append the rest, tombstone-delete ``%11=5``, then
    ``compact_vector_index(retrain=True, n_cells=6)`` — the staleness
    repair that retrains the codebook on the LIVE corpus and reassigns
    every vector inside the rewrite compaction already pays for.
    DuckDB replays the RETRAINED quantizer from first principles
    (Lloyd over the live survivors, 6 cells), re-pins assignments, and
    searches — a green row proves the retrain path equals a fresh
    build over the live corpus with the new cell count.

    Mutating query: private throwaway index per call."""
    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        compact_vector_index,
        delete_from_vector_index,
        update_vector_index,
        vector_topk_indexed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _fresh_path("learned-rt")
    build_vector_index(
        emb.where("vec_id % 3 != 2"),
        path,
        managed=True,
        n_cells=_N_CELLS,
        train_iters=_ITERS,
    )
    update_vector_index(emb.where("vec_id % 3 = 2"), path, segment="u1")
    delete_from_vector_index(
        spark, path, emb.where("vec_id % 11 = 5").select("vec_id"),
        segment="d1",
    )
    compact_vector_index(
        spark, path, retrain=True, n_cells=_RETRAIN_CELLS
    )
    return _topk_cols(
        vector_topk_indexed(
            spark, path, k=_K, query_mod=_QUERY_MOD, n_probe=_N_PROBE,
            scoring="np",
        )
    )


_FILTER_PRED = "label % 3 = 0"  # the allowed-candidate metadata predicate

_FILTERED_ORACLE = f"WITH {_E_CTE},\n" + _learned_search_sql(
    "e", "e", _K, _ITERS,
    cand_filter=(
        f"\n   AND l.vec_id IN (SELECT vec_id FROM embeddings"
        f" WHERE {_FILTER_PRED})"
    ),
)


@register(
    "sim_ann_filtered",
    shape="bounded",
    tags=("similarity", "ann", "index", "kmeans", "filter"),
    oracle=_FILTERED_ORACLE,
)
def sim_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN over the learned-codebook index: candidates are
    restricted to a metadata-derived allowed set (``label % 3 = 0``
    from the embeddings table) BEFORE scoring — pre-filter semantics,
    so every query gets the true top-k among allowed vectors rather
    than the post-filter < k failure mode.  The filter is a left-semi
    equi-join on the probed-cell scan (composes with partition
    pruning); queries and probe selection see the full corpus.  The
    oracle replays the whole learned chain with the same candidate
    restriction — a green row proves the filter respects the index's
    exactness contract instead of bypassing it."""
    from redis_streams_spark.operators.vecindex import vector_topk_indexed

    emb = load_table(spark, sf_dir, "embeddings")
    # read-only search: share the build (r13 — see _shared_learned_index)
    path = _shared_learned_index(
        spark, sf_dir, managed=True, n_cells=_N_CELLS, train_iters=_ITERS
    )
    allowed = emb.where(_FILTER_PRED).select("vec_id")
    return _topk_cols(
        vector_topk_indexed(
            spark, path, k=_K, query_mod=_QUERY_MOD, n_probe=_N_PROBE,
            filter_ids=allowed,
        )
    )
