"""Product-quantization ANN through the oracle gate: per-subspace
Lloyd codebooks, m-byte codes, integer LUT-sum candidate scoring
(asymmetric distance computation), exact-cosine rerank — the
quantized-ANN family's third member after SQ8 (r11) and the learned
IVF coarse quantizer (r12 wave 1).

DuckDB replays the ENTIRE chain from first principles: subvector
split, the unrolled per-subspace Lloyd (shared seeds/rounding/tiebreak
discipline with the coarse-quantizer oracle in similarity6.py), frozen
codebook assignment, the per-query LUT in integer micro-units, the
order-free integer candidate sum, and both ranking stages.

Public-knowledge basis: Jégou, Douze, Schmid 2011 (PQ/ADC); FAISS PQ
training defaults.  Reference basis: none (SURVEY §2.2 extension
surface — similarity search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.similarity import _E_CTE, _cos
from redis_streams_spark.session import load_table

_K = 10
_QUERY_MOD = 25
_OVERSAMPLE = 4
_M = 4
_K_SUB = 8
_ITERS = 2

# 6dp-rounded squared L2 between subvector b.sv and centroid c.cv
_L2 = (
    "round(5e-10 + list_reduce(list_transform(range(1, len(b.sv) + 1),"
    " i -> (b.sv[i] - c.cv[i]) * (b.sv[i] - c.cv[i])), (x, y) -> x + y), 6)"
)

_QDOT = (
    "list_reduce(list_transform(range(1, len(q.qsv) + 1),"
    " i -> q.qsv[i] * c.cv[i]), (x, y) -> x + y)"
)


def _pq_ctes(
    m: int,
    k_sub: int,
    iters: int,
    train_src: str = "e",
    code_src: str | None = None,
) -> list[str]:
    """sub → seeded pcent0 → iters×(assign, rebuild) → codes over the
    frozen pcent{iters} — the Spark pq_train_codebooks/_pq_assign chain
    unrolled; the subspace id is a column, so the m codebooks train in
    the same relational steps.  CTE names carry a p- prefix so these
    compose with the coarse-quantizer parts (similarity6's cent*/kasg*)
    in one oracle.  ``code_src`` (default = ``train_src``) is the frame
    whose vectors get ENCODED against the frozen codebooks — the
    lifecycle oracles train on the build slice and encode the live
    corpus, mirroring pin-at-write-time."""
    cs = code_src or train_src
    parts = [
        f"""sub AS (
  SELECT vec_id, s,
         v[(s * (len(v) // {m}) + 1):((s + 1) * (len(v) // {m}))] AS sv
  FROM {train_src}, (SELECT unnest(range(0, {m})) AS s) ss)""",
        f"""pcent0 AS (
  SELECT s, (rn - 1)::INT AS code, sv AS cv FROM (
    SELECT s, sv, row_number() OVER (PARTITION BY s ORDER BY vec_id) AS rn
    FROM sub) t
  WHERE rn <= {k_sub})""",
    ]
    for i in range(iters):
        parts.append(
            f"""pasg{i + 1} AS (
  SELECT vec_id, s, sv, code FROM (
    SELECT b.vec_id, b.s, b.sv, c.code,
           row_number() OVER (PARTITION BY b.vec_id, b.s
                              ORDER BY {_L2}, c.code) AS rn
    FROM sub b JOIN pcent{i} c ON c.s = b.s) t
  WHERE rn = 1)"""
        )
        parts.append(
            f"""pbd{i + 1} AS (
  SELECT s, code, dim, round(5e-10 + avg(val), 6) AS cval
  FROM (SELECT s, code, unnest(sv) AS val, generate_subscripts(sv, 1) AS dim
        FROM pasg{i + 1}) t
  GROUP BY s, code, dim)"""
        )
        parts.append(
            f"""pcent{i + 1} AS (
  SELECT s, code, list(cval ORDER BY dim) AS cv
  FROM pbd{i + 1} GROUP BY s, code)"""
        )
    code_sub = (
        "sub b"
        if cs == train_src
        else f"""(
    SELECT vec_id, s,
           v[(s * (len(v) // {m}) + 1):((s + 1) * (len(v) // {m}))] AS sv
    FROM {cs}, (SELECT unnest(range(0, {m})) AS s) ss) b"""
    )
    parts.append(
        f"""codes AS (
  SELECT vec_id, s, code FROM (
    SELECT b.vec_id, b.s, c.code,
           row_number() OVER (PARTITION BY b.vec_id, b.s
                              ORDER BY {_L2}, c.code) AS rn
    FROM {code_sub} JOIN pcent{iters} c ON c.s = b.s) t
  WHERE rn = 1)"""
    )
    return parts


def _pq_oracle() -> str:
    parts = [_E_CTE.strip()]
    parts += _pq_ctes(_M, _K_SUB, _ITERS)
    parts.append(
        f"""q AS (
  SELECT vec_id AS query_id, s, sv AS qsv FROM sub
  WHERE vec_id % {_QUERY_MOD} = 0)"""
    )
    parts.append(
        f"""lut AS (
  SELECT q.query_id, c.s, c.code,
         CAST(floor({_QDOT} * 1e6 + 0.5) AS BIGINT) AS pd
  FROM q JOIN pcent{_ITERS} c ON c.s = q.s)"""
    )
    parts.append(
        """adot AS (
  SELECT l.query_id, co.vec_id AS cand_id, sum(l.pd)::BIGINT AS pq_dot
  FROM codes co JOIN lut l
    ON l.s = co.s AND l.code = co.code AND co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id)"""
    )
    parts.append(
        f"""kept AS (
  SELECT query_id, cand_id, pq_dot FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY pq_dot DESC, cand_id) AS ar
    FROM adot) t
  WHERE ar <= {_K * _OVERSAMPLE})"""
    )
    cos = _cos("eq.v", "eq.norm", "ec.v", "ec.norm")
    parts.append(
        f"""rer AS (
  SELECT k.query_id, k.cand_id, k.pq_dot, {cos} AS cosine
  FROM kept k
  JOIN e eq ON eq.vec_id = k.query_id
  JOIN e ec ON ec.vec_id = k.cand_id)"""
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT query_id, cand_id, pq_dot, cosine, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rank
      FROM rer) t
WHERE rank <= {_K}
ORDER BY query_id, rank"""


@register(
    "sim_pq_rerank",
    shape="bounded",
    tags=("similarity", "ann", "pq", "kmeans"),
    oracle=_pq_oracle(),
)
def sim_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ+ADC two-stage ANN: m=4 per-subspace codebooks (8 codes, 2
    Lloyd rounds on subvector L2), candidates scored as the exact
    INTEGER sum of per-subspace LUT micro-units (no summation-order
    seam), top-40 per query reranked by exact cosine to the top-10.
    The oracle replays subspace split, per-subspace training, code
    assignment, LUT quantization, and both rankings from first
    principles — a green row proves the whole compressed-domain chain,
    not just the rerank."""
    from redis_streams_spark.operators.similarity import pq_rerank_topk
    from redis_streams_spark.queries.similarity6 import _shared_pqbook

    emb = load_table(spark, sf_dir, "embeddings")
    # read-only scoring: share the trained PQ books with the IVF-PQ
    # index build and sim_recall_compressed (r13 — the identical
    # deterministic training ran up to 3x per session before)
    return pq_rerank_topk(
        emb,
        k=_K,
        query_mod=_QUERY_MOD,
        oversample=_OVERSAMPLE,
        m=_M,
        k_sub=_K_SUB,
        iters=_ITERS,
        pqbook=_shared_pqbook(spark, sf_dir, _M, _K_SUB, _ITERS),
    )


# ------------------------------------------------------------- IVF-PQ

_N_CELLS = 8
_COARSE_ITERS = 2


def _ivfpq_oracle(
    head: str, train_src: str, live_src: str
) -> str:
    """Full IVFADC replay: the coarse-quantizer chain (training on
    ``train_src``, pinned cells + live means + probes over
    ``live_src`` — similarity6's shared parts) composed with the PQ
    chain (per-subspace codebooks on ``train_src``, codes pinned for
    ``live_src``), compressed-domain integer LUT-sum candidate scoring
    inside probed cells, exact-cosine rerank of the top
    k·oversample."""
    from redis_streams_spark.queries.similarity6 import _learned_parts

    parts = [head.strip()]
    parts += _learned_parts(train_src, live_src, _COARSE_ITERS, _N_CELLS)
    parts += _pq_ctes(_M, _K_SUB, _ITERS, train_src, live_src)
    parts.append(
        f"""qsub AS (
  SELECT vec_id AS query_id, s,
         v[(s * (len(v) // {_M}) + 1):((s + 1) * (len(v) // {_M}))] AS qsv
  FROM {live_src}, (SELECT unnest(range(0, {_M})) AS s) ss
  WHERE vec_id % {_QUERY_MOD} = 0)"""
    )
    parts.append(
        f"""lut AS (
  SELECT q.query_id, c.s, c.code,
         CAST(floor({_QDOT} * 1e6 + 0.5) AS BIGINT) AS pd
  FROM qsub q JOIN pcent{_ITERS} c ON c.s = q.s)"""
    )
    parts.append(
        """adot AS (
  SELECT p.query_id, l.vec_id AS cand_id, sum(lut.pd)::BIGINT AS pq_dot
  FROM probes p
  JOIN pinned l ON l.cell = p.cell AND l.vec_id <> p.query_id
  JOIN codes co ON co.vec_id = l.vec_id
  JOIN lut ON lut.query_id = p.query_id
          AND lut.s = co.s AND lut.code = co.code
  GROUP BY p.query_id, l.vec_id)"""
    )
    parts.append(
        f"""kept AS (
  SELECT query_id, cand_id, pq_dot FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY pq_dot DESC, cand_id) AS ar
    FROM adot) t
  WHERE ar <= {_K * _OVERSAMPLE})"""
    )
    cos = _cos("eq.v", "eq.norm", "ec.v", "ec.norm")
    parts.append(
        f"""rer AS (
  SELECT k.query_id, k.cand_id, k.pq_dot, {cos} AS cosine
  FROM kept k
  JOIN {live_src} eq ON eq.vec_id = k.query_id
  JOIN {live_src} ec ON ec.vec_id = k.cand_id)"""
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT query_id, cand_id, pq_dot, cosine, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rank
      FROM rer) t
WHERE rank <= {_K}
ORDER BY query_id, rank"""


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


@register(
    "sim_ann_ivfpq",
    shape="bounded",
    tags=("similarity", "ann", "index", "pq", "kmeans"),
    oracle=_ivfpq_oracle(_E_CTE, "e", "e"),
)
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (IVFADC) through the managed index: learned coarse cells
    (8, 2 Lloyd rounds) AND per-subspace PQ codebooks (m=4, 8 codes)
    trained at build, codes stored as a column in the cells store,
    search = merged-centroid probes → integer LUT-sum candidate scoring
    in the compressed domain → exact-cosine rerank of the top-40.
    DuckDB replays BOTH quantizer trainings, both pinned assignments,
    the live cell means, probe selection, the integer ADC sum, and the
    rerank — one green row covers the full compressed-domain index
    chain end to end.  Registers the Arrow LUT-gather kernel
    (``scoring="np"``) so the driver grades that physical path; the
    relational twin is driver-graded by the lifecycle query and the
    two are asserted equal in tests (both consume the SAME
    Spark-computed LUT, so there is no seam to diverge at)."""
    from redis_streams_spark.operators.vecindex import vector_topk_pq
    from redis_streams_spark.queries.similarity6 import (
        _shared_learned_index,
    )

    # read-only search: share the build with every other non-mutating
    # consumer in the session (sim_recall_compressed re-runs this whole
    # query — it paid a second full two-quantizer training before r13)
    path = _shared_learned_index(
        spark, sf_dir, managed=True, n_cells=_N_CELLS,
        train_iters=_COARSE_ITERS, pq_m=_M, pq_ksub=_K_SUB,
        pq_iters=_ITERS,
    )
    return vector_topk_pq(
        spark, path, k=_K, query_mod=_QUERY_MOD, n_probe=2,
        oversample=_OVERSAMPLE, scoring="np",
    )


_IVFPQ_LC_HEAD = """e0 AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
train AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x),
                          (a, b) -> a + b)) AS norm
  FROM e0 WHERE vec_id % 3 != 2
),
live AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x),
                          (a, b) -> a + b)) AS norm
  FROM e0 WHERE NOT (vec_id % 11 = 5)
)"""


@register(
    "sim_ann_ivfpq_lifecycle",
    shape="bounded",
    tags=("similarity", "ann", "index", "pq", "kmeans", "lifecycle"),
    oracle=_ivfpq_oracle(_IVFPQ_LC_HEAD, "train", "live"),
)
def sim_ann_ivfpq_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ index's MUTATION LIFECYCLE: build (both quantizers
    trained) on the ``vec_id % 3 != 2`` slice, append the rest as a
    segment — coarse cells AND PQ codes pinned against the frozen
    per-generation books — then tombstone-delete ``%11=5`` and search.
    DuckDB trains both quantizers on the BUILD slice, pins cells and
    codes for the LIVE corpus, reconstructs live cell means, and
    replays the compressed-domain search — a green row proves appends
    and deletes leave the compressed index answering like a
    same-books rebuild over the live corpus.

    Mutating query: private throwaway index per call."""
    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        delete_from_vector_index,
        update_vector_index,
        vector_topk_pq,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _fresh_path("ivfpq-lc")
    build_vector_index(
        emb.where("vec_id % 3 != 2"), path, managed=True,
        n_cells=_N_CELLS, train_iters=_COARSE_ITERS, pq_m=_M,
        pq_ksub=_K_SUB, pq_iters=_ITERS,
    )
    update_vector_index(emb.where("vec_id % 3 = 2"), path, segment="u1")
    delete_from_vector_index(
        spark, path, emb.where("vec_id % 11 = 5").select("vec_id"),
        segment="d1",
    )
    return vector_topk_pq(
        spark, path, k=_K, query_mod=_QUERY_MOD, n_probe=2,
        oversample=_OVERSAMPLE,
    )
