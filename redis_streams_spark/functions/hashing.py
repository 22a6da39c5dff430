"""Deterministic cross-engine hashing primitives.

``h32(x)`` = int(md5(x)[:8], 16) ∈ [0, 2^32): cheap, stable, and computable
with built-ins on both Spark (``conv(substr(md5(x),1,8),16,10)``) and DuckDB
(``('0x' || substr(md5(x),1,8))::BIGINT``).  Spark's own ``xxhash64``/``hash``
are NOT portable to DuckDB, which is why md5 is the shared backbone.

Minhash permutations use ``(a*h + b) mod P`` with ``P`` the smallest prime
above 2^32 and ``a < 2^30`` so products stay below 2^62 — no 64-bit overflow
in either engine (DuckDB raises on bigint overflow; Spark would silently
wrap).  Coefficients come from a fixed seeded RNG so Spark code and oracle
SQL embed the same literals.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32
NUM_PERM = 32
LSH_BANDS = 16
ROWS_PER_BAND = NUM_PERM // LSH_BANDS  # 2 → candidate P≈0.89 at j=0.5

_rng = random.Random(42)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, 1 << 30) | 1, _rng.randrange(0, MINHASH_PRIME)) for _ in range(NUM_PERM)
]


def h32(col: Column | str) -> Column:
    """Spark column: md5-based unsigned 32-bit hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB SQL snippet computing the same value as :func:`h32`."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def h60(col: Column | str) -> Column:
    """Spark column: md5-based unsigned 60-bit hash (first 15 hex
    digits) — same cross-engine backbone as :func:`h32` with a collision
    regime fit for corpus-scale keys: 32 bits birthday-collides at ~10^5
    distinct values (fine for shingle SETS, fatal for a global
    duplicated-n-gram join), 60 bits at ~10^9.  Stays below 2^63 so
    BIGINT arithmetic is safe in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB SQL snippet computing the same value as :func:`h60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def h32_py(s: str) -> int:
    """Python twin of :func:`h32` (first 8 md5 hex digits as an unsigned
    32-bit int).  The ONE Python-side copy of the cross-engine hash
    contract — driver-side sketches and test recomputations import this
    instead of re-implementing the md5 slice (review finding, r08)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
