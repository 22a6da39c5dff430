"""Property-based tests (hypothesis): invariants the example-driven suite
can't sweep — scaler ladder over the whole metric space, StreamLog
append/trim algebra, cross-engine rounding parity on arbitrary floats."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Scale
from redis_streams_spark.streaming.scaler import Scaler


class _FakeScaler(Scaler):
    """Scaler with injected metrics (no log IO) for ladder properties."""

    def __init__(self, length: int, pending: int, consumers: int):
        self.stream_length = length
        self.stream_pending = pending
        self.consumers_of_group = consumers
        self.length_pending_rate = 0

    def collect_metrics(self):
        return self.stream_length, self.stream_pending


@settings(max_examples=300, deadline=None)
@given(
    length=st.integers(min_value=0, max_value=10_000),
    pending=st.integers(min_value=0, max_value=10_000),
    consumers=st.integers(min_value=0, max_value=50),
    out_rate=st.integers(min_value=0, max_value=100),
    in_rate=st.integers(min_value=0, max_value=100),
)
def test_scaler_ladder_invariants(length, pending, consumers, out_rate, in_rate):
    sca = _FakeScaler(length, pending, consumers)
    if in_rate > out_rate:
        with pytest.raises(ValueError):
            sca.get_scale_decision(scale_out_rate=out_rate, scale_in_rate=in_rate)
        return
    rate, suggestion = sca.get_scale_decision(
        scale_out_rate=out_rate, scale_in_rate=in_rate
    )
    # rate domain: 0 (no pending) or clamped to [1, 100]
    assert rate == 0 or 1 <= rate <= 100
    assert suggestion in {s.value for s in Scale}
    # exact reference semantics (scaler.py:85-97)
    if rate == 0 and length == 0:
        assert suggestion == Scale.NOSCALE.value
    elif rate == 0 and length >= 1:
        assert suggestion == Scale.OUT.value
    elif rate < in_rate and consumers > 1:
        assert suggestion == Scale.IN.value
    elif rate >= out_rate:
        assert suggestion == Scale.OUT.value
    else:
        assert suggestion == Scale.NOSCALE.value
    # scaling out is always suggested when the backlog dwarfs pending
    if pending > 0 and length >= pending and out_rate <= 100 and rate >= out_rate:
        assert suggestion == Scale.OUT.value


@settings(max_examples=25, deadline=None)
@given(
    n_msgs=st.integers(min_value=0, max_value=40),
    maxlen=st.integers(min_value=1, max_value=10),
)
def test_streamlog_append_trim_algebra(tmp_path_factory, n_msgs, maxlen):
    log = StreamLog(str(tmp_path_factory.mktemp("sl")), "s")
    ids = [log.append({"i": i}) for i in range(n_msgs)]
    assert ids == sorted(ids) and len(set(ids)) == n_msgs
    log.trim(maxlen)
    assert log.xlen() == min(n_msgs, maxlen)
    assert log.count() == n_msgs  # positions never shift
    kept = log.read_slice(0, log.count())
    if n_msgs:
        # newest messages retained, in order
        assert [c["i"] for _, _, c in kept] == [
            str(i) for i in range(max(0, n_msgs - maxlen), n_msgs)
        ]


@settings(max_examples=200, deadline=None)
@given(
    value=st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    scale=st.sampled_from([2, 4, 6]),
)
def test_rnd_sql_matches_python_semantics(value, scale):
    """DuckDB's rnd_sql is self-consistent with plain arithmetic: the
    epsilon keeps the result within 1e-9+half-ulp of the true value and
    is idempotent (rounding an already-rounded value is a no-op)."""
    con = duckdb.connect()
    r1 = con.sql(f"SELECT round(5e-10 + {value!r}, {scale})").fetchone()[0]
    r2 = con.sql(f"SELECT round(5e-10 + {r1!r}, {scale})").fetchone()[0]
    assert r2 == r1  # idempotent
    assert abs(r1 - value) <= 0.5 * 10 ** (-scale) + 1e-9
    con.close()


# ---------------------------------------------------------------------------
# Cross-engine text-primitive parity on adversarial strings.
#
# The oracle gate proves parity on the fixture corpus; these prove it on
# hypothesis-generated strings (empty tokens, runs of separators, digits,
# accented latin).  Examples are BATCHED: each hypothesis example carries a
# list of strings evaluated in ONE Spark job + ONE DuckDB query, keeping
# wall time sane.  Alphabet note: tokenization lowercases, and Java and
# DuckDB agree on ASCII + latin-1 lower(); locale-sensitive exotica
# (dotted-I, final sigma) are out of the engine's documented contract.
# ---------------------------------------------------------------------------

_TEXT_ALPHABET = st.sampled_from(
    list("abcXYZ012 .,;:!?-_/") + ["à", "é", "ñ", "Å", "ü"]
)
_DOC_STRINGS = st.lists(
    st.text(alphabet=_TEXT_ALPHABET, min_size=0, max_size=40),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(texts=_DOC_STRINGS)
def test_text_primitives_cross_engine(spark, texts):
    from redis_streams_spark.functions.hashing import h32, h32_sql
    from redis_streams_spark.functions.textfns import (
        word_shingles,
        word_shingles_sql,
        words,
        words_sql,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    # shingle arrays compare as SETS: array_distinct/list_distinct do not
    # agree on element order (see word_shingles docstring)
    srows = {
        r.id: (r.w, sorted(r.sh), r.h)
        for r in df.select(
            "id",
            words("text").alias("w"),
            word_shingles(words("text"), 3).alias("sh"),
            h32(F.col("text")).alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") AS v(id, text)",
        texts,
    )
    drows = {
        i: (w, sorted(sh), h)
        for i, w, sh, h in con.sql(
            f"SELECT id, {words_sql('text')}, "
            f"{word_shingles_sql(words_sql('text'), 3)}, {h32_sql('text')} FROM t"
        ).fetchall()
    }
    assert srows == drows


# ---- exactness of the prefix-filter set-similarity joins -------------
# One Spark round-trip per example is too slow for hypothesis, so the
# property runs pure-Python over the SAME prefix/length-filter logic the
# operator encodes, and a single Spark example cross-checks the wiring
# (tests/test_round5_ops.py holds the Spark-side equality tests).


def _prefix_survivors(sets_, t):
    """Reference implementation of candidate generation: rare-first
    (df, token) order, prefix length |x| - ceil(t|x|) + 1, length filter
    both directions."""
    import math
    from collections import Counter

    df = Counter()
    for s in sets_.values():
        for tok in s:
            df[tok] += 1
    prefixes = {}
    for d, s in sets_.items():
        ordered = sorted(s, key=lambda tok: (df[tok], tok))
        k = len(s) - math.ceil(t * len(s)) + 1
        prefixes[d] = set(ordered[:k])
    cands = set()
    docs = sorted(sets_)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            la, lb = len(sets_[a]), len(sets_[b])
            if lb < t * la or la < t * lb:
                continue
            if prefixes[a] & prefixes[b]:
                cands.add((a, b))
    return cands


@settings(max_examples=200, deadline=None)
@given(
    docs=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.frozensets(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    ),
    tq=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
def test_prefix_filter_never_loses_a_true_pair(docs, tq):
    """For EVERY pair with Jaccard >= t, the prefix+length filter must
    keep it as a candidate — the no-false-negative theorem the Spark
    operator relies on, swept over random set families."""
    cands = _prefix_survivors(docs, tq)
    names = sorted(docs)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            inter = len(docs[a] & docs[b])
            union = len(docs[a] | docs[b])
            if union and inter / union >= tq:
                assert (a, b) in cands, (a, b, docs[a], docs[b], tq)


@settings(max_examples=200, deadline=None)
@given(
    docs=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.frozensets(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    ),
    tq=st.sampled_from([0.4, 0.6, 0.8]),
)
def test_containment_prefix_never_loses_a_true_pair(docs, tq):
    """Containment variant: A-prefix × full-B-index candidates must keep
    every ordered pair with |A∩B|/|A| >= t."""
    import math
    from collections import Counter

    df = Counter()
    for s in docs.values():
        for tok in s:
            df[tok] += 1
    cands = set()
    for a, sa in docs.items():
        ordered = sorted(sa, key=lambda tok: (df[tok], tok))
        k = len(sa) - math.ceil(tq * len(sa)) + 1
        pref = set(ordered[:k])
        for b, sb in docs.items():
            if a == b or len(sb) < tq * len(sa):
                continue
            if pref & sb:
                cands.add((a, b))
    for a, sa in docs.items():
        for b, sb in docs.items():
            if a != b and len(sa & sb) / len(sa) >= tq:
                assert (a, b) in cands, (a, b, sa, sb, tq)


def test_weighted_sample_invariant_to_partition_layout(spark, sf_dir):
    """q_weighted_sample's result must be a pure function of the DATA:
    identical under any partitioning of the input — the property that
    separates hash-keyed sampling from RNG TABLESAMPLE (whose output
    depends on task layout)."""
    from redis_streams_spark.queries.analytics5 import q_weighted_sample

    base = [tuple(r) for r in q_weighted_sample(spark, sf_dir).collect()]

    # recompute from an adversarially re-partitioned orders table
    from pyspark.sql import functions as F

    from redis_streams_spark.functions.hashing import h32
    from redis_streams_spark.functions.rounding import rnd
    from redis_streams_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders").repartition(7, "o_orderpriority")
    u = (h32(F.col("o_orderkey").cast("string")) + 1) / F.lit(4294967296.0)
    keyed = orders.select(
        "o_orderkey",
        "o_totalprice",
        rnd(F.exp(F.log(u) / F.col("o_totalprice")), 9).alias("sample_key"),
    )
    shuffled = [
        tuple(r)
        for r in keyed.orderBy(F.desc("sample_key"), "o_orderkey")
        .limit(20)
        .collect()
    ]
    assert base == shuffled


# -- round-7 sketch guarantees under arbitrary batch splits ---------------

@given(
    items=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=300),
    k=st.integers(min_value=1, max_value=8),
    splits=st.lists(st.integers(min_value=1, max_value=50), max_size=10),
)
@settings(max_examples=80, deadline=None)
def test_misra_gries_guarantees_any_batching(items, k, splits):
    """The Misra-Gries merge keeps its textbook guarantees no matter how
    the stream is cut into micro-batches: estimates never exceed truth,
    undercount is bounded by the tracked decrement total (itself
    <= n/(k+1)), the summary never exceeds k entries, and every item
    above the n/(k+1) frequency threshold survives."""
    from collections import Counter

    from redis_streams_spark.streaming.topk import misra_gries_merge

    truth = Counter(str(x) for x in items)
    n = len(items)
    # cut the stream at the hypothesis-chosen points
    batches, pos = [], 0
    for w in splits:
        if pos >= n:
            break
        batches.append(items[pos : pos + w])
        pos += w
    if pos < n:
        batches.append(items[pos:])

    counters, dec = {}, 0
    for batch in batches:
        counters, m = misra_gries_merge(
            counters, dict(Counter(str(x) for x in batch)), k
        )
        dec += m

    assert len(counters) <= k
    assert dec <= n // (k + 1)
    for item, est in counters.items():
        assert 0 < est <= truth[item]
        assert truth[item] - est <= dec
    for item, c in truth.items():
        if c > n / (k + 1):
            assert item in counters


@given(
    vals=st.lists(
        st.floats(min_value=1e-6, max_value=1e12, exclude_min=True),
        min_size=1,
        max_size=200,
    ),
    cut=st.integers(min_value=0, max_value=200),
)
@settings(max_examples=80, deadline=None)
def test_quantile_sketch_bound_and_merge(vals, cut):
    """Log-histogram estimates stay within BASE of the exact order
    statistic for every tracked quantile, and merging two partial
    histograms equals the single-pass histogram."""
    import math

    import numpy as np

    from redis_streams_spark.streaming.quantiles import (
        BASE,
        N_BINS,
        QUANTILES,
        bin_index,
        estimate_quantiles,
    )

    a = np.bincount(bin_index(np.array(vals[:cut] or [])), minlength=N_BINS) if vals[:cut] else np.zeros(N_BINS, dtype=int)
    b = np.bincount(bin_index(np.array(vals[cut:] or [])), minlength=N_BINS) if vals[cut:] else np.zeros(N_BINS, dtype=int)
    u = np.bincount(bin_index(np.array(vals)), minlength=N_BINS)
    assert ((a + b) == u).all()

    s = sorted(vals)
    for q, est in zip(QUANTILES, estimate_quantiles(u)):
        exact = s[max(1, math.ceil(q * len(s))) - 1]
        assert exact <= est * (1 + 1e-9)
        assert est < exact * BASE * (1 + 1e-9)
