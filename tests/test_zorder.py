"""Z-order layout: Morton arithmetic parity and the data-skipping claim
itself — a 2-D box must touch fewer z-ordered files than single-column-
sorted files."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_streams_spark.operators.zorder import (
    Z_BITS,
    candidate_files,
    write_zordered,
    z_value,
    z_value_sql,
)
from redis_streams_spark.session import load_table


def _morton_py(x: int, y: int, bits: int = Z_BITS) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_z_value_matches_python_and_sql(spark, duck):
    rows = [(x, y) for x in (0, 1, 5, 513, 1023) for y in (0, 2, 7, 800, 1023)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", z_value(F.col("x"), F.col("y")).alias("z")).collect()
    }
    assert got == {(x, y): _morton_py(x, y) for x, y in rows}
    vals = ", ".join(f"({x}, {y})" for x, y in rows)
    sql = duck.sql(
        f"SELECT x, y, {z_value_sql('x', 'y')} AS z FROM (VALUES {vals}) t(x, y)"
    ).fetchall()
    assert {(x, y): z for x, y, z in sql} == got


def test_zorder_serves_both_dimensions(spark, sf_dir, tmp_path):
    """The z-order claim, measured: a single-column sort aces boxes on
    its own column and reads EVERY file for boxes on the other column;
    the Morton layout prunes meaningfully on BOTH.  Summed over one
    x-selective and one y-selective box, z-order must touch fewer
    candidate files than the user_id-sorted baseline."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    umax, emax = ev.agg(
        F.max("user_id"), F.max("event_id")
    ).first()
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(ev, zpath, "user_id", "event_id", n_files=16)
    # baseline: same target file count, sorted by user_id only
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    full_u, full_e = (0, umax), (0, emax)
    box_x = dict(
        x_col="user_id", y_col="event_id",
        x_rng=(umax * 3 // 10, umax * 4 // 10), y_rng=full_e,
    )
    box_y = dict(
        x_col="user_id", y_col="event_id",
        x_rng=full_u, y_rng=(emax * 1 // 10, emax * 3 // 10),
    )
    z_x, z_total = candidate_files(zpath, **box_x)
    z_y, _ = candidate_files(zpath, **box_y)
    s_x, s_total = candidate_files(spath, **box_x)
    s_y, _ = candidate_files(spath, **box_y)
    # range partitioner may merge sparse key ranges (fewer files than
    # requested at tiny SF); compare hit FRACTIONS so different file
    # counts between the two layouts can't fake (or mask) pruning
    assert z_total > 0 and s_total > 0
    zf_x, zf_y = z_x / z_total, z_y / z_total
    sf_x, sf_y = s_x / s_total, s_y / s_total
    # the y-selective box defeats the x-sorted layout entirely
    assert sf_y == 1.0
    # z-order prunes on y too (strictly fewer than all files), and wins
    # on the two-box fractional total
    assert zf_y < sf_y, (zf_y, sf_y)
    assert zf_x + zf_y < sf_x + sf_y, ((zf_x, zf_y), (sf_x, sf_y))


def test_zordered_rows_are_value_identical(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "z2")
    write_zordered(ev, path, "user_id", "event_id", n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert sorted(back.collect()) == sorted(ev.collect())
