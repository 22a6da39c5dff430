"""Z-order (Morton-curve) file layout: multi-dimensional data skipping.

The third physical-layout tool next to directory partitioning
(layout.py) and bucketing (bucketing.py): sorting files by the
INTERLEAVED bits of two columns gives every file a tight min/max range
on BOTH columns, so parquet row-group/file statistics prune 2-D box
predicates — where a single-column sort only skips on its leading
column.  This is the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
built here from plain Spark primitives: an arithmetic z-value expression,
`repartitionByRange` on it (range partitioning = globally ordered,
non-overlapping file ranges), and an ordinary parquet write.

Everything is deterministic JVM arithmetic (shifts/masks composed per
bit), so the z-value itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 10  # per-dimension resolution: 2^10 cells per axis


def _scale(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale a long column onto [0, 2^bits): floor((v - min) *
    2^bits / (max - min + 1)).  Integer arithmetic only — deterministic
    on both engines."""
    span = cmax - cmin + 1
    return ((col - cmin) * (1 << bits) / span).cast("long")


def z_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two already-scaled [0, 2^bits) longs:
    bit b of x lands at position 2b, bit b of y at 2b+1.  Built as a sum
    of per-bit shift/mask terms — disjoint bit positions, so `+` is `|`
    and the whole expression stays in whole-stage codegen."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def z_value_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """DuckDB rendering of :func:`z_value` (identical arithmetic)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = Z_BITS,
) -> None:
    """Lay ``df`` out as ``n_files`` parquet files ordered by the Morton
    value of (x_col, y_col).  ``repartitionByRange`` gives globally
    ordered, non-overlapping z ranges per file; within a file rows are
    sorted so row-group stats are tight too.  Bounds for the scaling are
    computed from the data (one tiny agg, broadcast as a scalar join).

    100 TB deployment note: compute the min/max bounds ONCE and freeze
    them in table metadata — rescaling on every incremental write would
    shift the curve.  n_files scales with data volume (files of
    ~128 MB-1 GB); the write is one range shuffle, same cost class as any
    global sort."""
    bounds = df.agg(
        F.min(x_col).alias("xmin"),
        F.max(x_col).alias("xmax"),
        F.min(y_col).alias("ymin"),
        F.max(y_col).alias("ymax"),
    )
    with_z = df.crossJoin(F.broadcast(bounds)).withColumn(
        "zval",
        z_value(
            _scale(F.col(x_col), F.col("xmin"), F.col("xmax"), bits),
            _scale(F.col(y_col), F.col("ymin"), F.col("ymax"), bits),
            bits,
        ),
    ).drop("xmin", "xmax", "ymin", "ymax")
    (
        with_z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def candidate_files(
    path: str, x_col: str, y_col: str, x_rng: tuple, y_rng: tuple
) -> tuple[int, int]:
    """Data-skipping audit: (files whose [min,max] stats overlap the 2-D
    box, total files) — the fraction a stats-aware reader must touch.
    Uses parquet footer column statistics only (what any engine's
    skipping layer reads)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        overlaps = False
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            stats = {}
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                # has_min_max guard: a statistics object with absent
                # min/max (all-NULL chunk, stats-suppressed writer) must
                # fall through to the conservative no-stats branch, not
                # TypeError in the overlap compare (review finding)
                if col.statistics is not None and col.statistics.has_min_max:
                    stats[name] = (col.statistics.min, col.statistics.max)
            sx, sy = stats.get(x_col), stats.get(y_col)
            if sx is None or sy is None:
                overlaps = True  # no stats -> cannot skip
                break
            if sx[0] <= x_rng[1] and sx[1] >= x_rng[0] and sy[0] <= y_rng[1] and sy[1] >= y_rng[0]:
                overlaps = True
                break
        hit += 1 if overlaps else 0
    return hit, len(files)
