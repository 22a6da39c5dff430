"""Cross-engine-stable float rounding.

Spark's ``round`` on doubles goes through ``BigDecimal.valueOf`` (shortest
decimal repr, HALF_UP); DuckDB rounds the raw binary value.  For values
that sit EXACTLY on a rounding boundary — which happens systematically for
averages over power-of-two group sizes (e.g. 307.03/8 = 38.37875, exact in
binary) — the two disagree by one ulp of the target scale.

``rnd`` adds +5e-10 before rounding on BOTH engines: boundary values move
strictly above the boundary (same decision both sides), while any value
farther than 5e-10 from a boundary is unaffected at scales ≤ 6 dp.
Exact-decimal data can only produce boundary distances of 0 or ≥ 1e-6, so
the epsilon never flips a legitimate value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 5e-10


def rnd(col: Column | str, scale: int) -> Column:
    """Spark: epsilon-stabilized float round (pair with :func:`rnd_sql`)."""
    if isinstance(col, str):
        col = F.col(col)
    return F.round(col + F.lit(EPS), scale)


def rnd_sql(expr: str, scale: int) -> str:
    """DuckDB snippet computing the same stabilized round."""
    return f"round(5e-10 + {expr}, {scale})"
