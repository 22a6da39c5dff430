"""Comparison helpers shared by tools/check_oracle.py and the test suite.

Mimics the driver's correctness gate: row count + column names + type
family + order-insensitive canonical value comparison between a Spark
result and a DuckDB oracle result.
"""

from __future__ import annotations

import datetime as dt
import math


def family(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (dt.datetime, dt.date)):
        return "ts"
    if isinstance(v, (list, tuple)):
        return "list"
    return type(v).__name__


def canon(v) -> str:
    """Canonical cell repr: int-valued floats collapse to ints; floats are
    compared at 9 dp (queries round far coarser than that)."""
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_to_canon(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(
    scols: list[str], srows: list[tuple], dcols: list[str], drows: list[tuple]
) -> list[str]:
    """Return a list of problems (empty == match)."""
    problems: list[str] = []
    scols_l = [c.lower() for c in scols]
    dcols_l = [c.lower() for c in dcols]
    if sorted(scols_l) != sorted(dcols_l):
        problems.append(f"columns spark={sorted(scols_l)} duckdb={sorted(dcols_l)}")
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
    if problems:
        return problems
    sorder = sorted(range(len(scols_l)), key=lambda i: scols_l[i])
    dorder = sorted(range(len(dcols_l)), key=lambda i: dcols_l[i])
    for si, di in zip(sorder, dorder):
        sfam = next((family(r[si]) for r in srows if r[si] is not None), "null")
        dfam = next((family(r[di]) for r in drows if r[di] is not None), "null")
        if sfam != dfam:
            problems.append(f"type family col={scols_l[si]} spark={sfam} duckdb={dfam}")
    sc = rows_to_canon(scols_l, srows)
    dc = rows_to_canon(dcols_l, drows)
    if sc != dc:
        ndiff = sum(1 for a, b in zip(sc, dc) if a != b)
        problems.append(f"values differ ({ndiff}/{len(sc)} rows)")
        for a, b in zip(sc, dc):
            if a != b:
                problems.append(f"  spark : {a}")
                problems.append(f"  duckdb: {b}")
                break
    return problems
