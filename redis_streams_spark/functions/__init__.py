"""Engine-agnostic deterministic column helpers.

Everything here exists in two renderings — a Spark ``Column`` builder and a
DuckDB SQL snippet builder — guaranteed to compute bit-identical values, so
hash-based operators (minhash, simhash, fingerprints, bucketed ANN) can be
verified against the SQL oracle exactly.  The shared primitive is
``h32``: the first 8 hex chars of MD5 parsed as an unsigned 32-bit integer
(both engines implement standard MD5; both parse hex identically).
"""

from redis_streams_spark.functions.hashing import (  # noqa: F401
    MINHASH_COEFFS,
    MINHASH_PRIME,
    h32,
    h32_sql,
)
