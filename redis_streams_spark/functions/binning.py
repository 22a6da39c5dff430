"""The cross-engine log-histogram bin grid: 16 geometric bins per
decade over 1e-6..1e12 plus one underflow bin — THE single definition.

Three consumers compute identical bin indices from it: the streaming
quantile/drift sketches (numpy, ``streaming/quantiles.py``), the batch
sketch audits (``q_quantile_sketch_audit``), and the PSI drift score
(``q_psi_drift``) — one source so retuning the grid can never silently
desynchronize them (review finding, r08; same consolidation as
``h32_py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

N_PER_DECADE = 16
DECADES = 18  # 1e-6 .. 1e12
N_BINS = N_PER_DECADE * DECADES + 1  # +1 underflow bin at index 0
LO_EXP = -6  # smallest bin edge is 10^-6


def log_bin_index_col(value: Column) -> Column:
    """Spark column: bin index of a positive double on the shared grid
    (index i covers (BASE^(i-1+16*LO_EXP), BASE^(i+16*LO_EXP)]; index 0
    catches v <= 1e-6)."""
    return F.least(
        F.greatest(
            F.ceil(F.log10(F.greatest(value, F.lit(1e-300))) * N_PER_DECADE)
            .cast("long")
            + (-LO_EXP * N_PER_DECADE),
            F.lit(0),
        ),
        F.lit(N_BINS - 1),
    )


def log_bin_index_sql(expr: str) -> str:
    """DuckDB SQL snippet computing the same bin index as
    :func:`log_bin_index_col`."""
    return (
        f"least(greatest(ceil(log10(greatest({expr}, 1e-300)) * {N_PER_DECADE})"
        f"::BIGINT + {-LO_EXP * N_PER_DECADE}, 0), {N_BINS - 1})"
    )
