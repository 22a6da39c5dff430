"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

import decimal  # noqa: E402

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from redis_streams_spark.oracle import compare  # noqa: E402
from redis_streams_spark.session import TABLES, get_spark  # noqa: E402


def _to_py(v):
    """numpy/pandas scalar → native Python, preserving int-vs-float kind
    (that kind distinction is what the driver's hash is sensitive to)."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, np.generic):  # np.int64 → int, np.float64 → float, ...
        v = v.item()
    if isinstance(v, float) and pd.isna(v):
        return None  # pandas NULL-in-float column; Spark .collect() gives None
    if isinstance(v, np.ndarray):
        # element-wise: tolist() yields native scalars but leaves float
        # NaN as NaN, while Spark .collect() gives None for NULL-in-array
        # — normalize recursively so a NULL-element regression fails HERE,
        # not only at the driver gate.
        return [_to_py(x) for x in v.tolist()]
    if isinstance(v, list):
        return [_to_py(x) for x in v]
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def _spark_to_py(v):
    """Spark-side canonicalization mirroring the DuckDB pandas path: the
    pandas fetch float-promotes DECIMAL columns, and the real driver gate
    still passes decimal queries (CORRECTNESS_r03 q_decimal_money
    hash_match=true), so convert Spark Decimals symmetrically rather than
    reporting a false type-family FAIL here.  The float conversion is
    symmetric (DuckDB's pandas fetch float-promotes DECIMAL too) and the
    comparison in oracle.canon rounds floats at 9 dp, which acts as the
    scale-aware epsilon: every DECIMAL column in the registry has scale
    <= 6, so promotion noise is absorbed while real value drift is not."""
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, list):
        return [_spark_to_py(x) for x in v]
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_skip = 0
    wall: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(_spark_to_py(v) for v in r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=6)
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(srows)} rows, spark={t_spark:.1f}s)")
            n_skip += 1
            continue
        t1 = time.time()
        try:
            # Fetch via pandas, mirroring the driver's canonicalizer path:
            # e.g. DuckDB HUGEINT sums arrive as float64 there (hash-mismatch
            # vs Spark int64) while fetchall() would hide it as Python int.
            pdf = con.sql(oracles[name]).df()
            dcols = list(pdf.columns)
            drows = [
                tuple(_to_py(v) for v in row)
                for row in pdf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR: {str(e)[:300]}")
            n_fail += 1
            continue
        t_duck = time.time() - t1

        wall[name] = t_spark + t_duck
        problems = compare(scols, srows, dcols, drows)
        if problems:
            print(f"FAIL {name} (spark={t_spark:.1f}s duck={t_duck:.1f}s)")
            for p in problems:
                print(f"   {p}")
            n_fail += 1
        else:
            print(
                f"PASS {name} ({len(srows)} rows, "
                f"spark={t_spark:.1f}s duck={t_duck:.1f}s)"
            )
            n_pass += 1

    if len(wall) > 5:
        slow = sorted(wall.items(), key=lambda kv: -kv[1])[:5]
        print(
            "\nslowest (spark+duck): "
            + ", ".join(f"{n}={s:.1f}s" for n, s in slow)
            + f"  |  total={sum(wall.values()):.0f}s"
        )
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
