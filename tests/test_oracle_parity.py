"""Every registered query matches its DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01); sf0.001 keeps the
suite fast.  tools/check_oracle.py runs the same comparison at any sf.
"""

from __future__ import annotations

import pytest

from redis_streams_spark.oracle import compare
from redis_streams_spark.queries import all_queries


def _params():
    return sorted(all_queries().keys())


@pytest.mark.parametrize("name", _params())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = all_queries()[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        # rows-only check (driver's weaker tier): query must run and
        # return a stable schema
        assert sdf.columns
        return
    rel = duck.sql(spec.oracle)
    problems = compare(sdf.columns, srows, list(rel.columns), rel.fetchall())
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns[0] == "l_returnflag"


def test_registry_consistency():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert qs, "registry must not be empty"


def test_documented_counts_match_registry():
    """README.md / COVERAGE.md query counts must track the registry —
    the r04 verdict asked for the doc counts to be CI-enforced."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = len(all_queries())
    with open(os.path.join(root, "COVERAGE.md")) as f:
        m = re.search(r"registry holds (\d+) queries", f.read())
    assert m and int(m.group(1)) == n, (
        f"COVERAGE.md says {m and m.group(1)}, registry has {n}"
    )
    with open(os.path.join(root, "README.md")) as f:
        m = re.search(r"(\d+) registered operators", f.read())
    assert m and int(m.group(1)) == n, (
        f"README.md says {m and m.group(1)}, registry has {n}"
    )


def test_catalog_tracks_registry():
    """CATALOG.md is generated (tools/gen_catalog.py); its row count and
    header count must match the registry so it can't silently go stale."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CATALOG.md")) as f:
        text = f.read()
    n = len(all_queries())
    m = re.search(r"^(\d+) operators;", text.splitlines()[2])
    assert m and int(m.group(1)) == n, "run tools/gen_catalog.py"
    rows = [ln for ln in text.splitlines() if ln.startswith("| `")]
    assert len(rows) == n, "run tools/gen_catalog.py"


def test_plans_report_tracks_registry():
    """PLANS.md is generated (tools/plan_audit.py); its totals line must
    match the registry so the audit can't silently go stale (the CATALOG
    guard's twin — PLANS.md drifted once within round 5)."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md")) as f:
        text = f.read()
    n = len(all_queries())
    m = re.search(r"Totals: (\d+) queries, (\d+) cartesian products", text)
    assert m and int(m.group(1)) == n, "run tools/plan_audit.py"
    assert int(m.group(2)) == 0


def test_driver_pins_self_expire():
    """A pinned name holds front-of-line rank only while it has no green
    driver row; once verified, the pin is inert — a stale pin list can
    never displace unverified queries from the driver window again
    (the round-6->7 rotation trap, made structural)."""
    import redis_streams_spark.queries as Q

    Q._load_all()
    real = dict(Q._driver_history())
    try:
        # BOTH halves stub the history: asserting the live repo state
        # would make this test start failing the moment the driver's
        # next CORRECTNESS file marks any pin green — the exact outcome
        # pins exist to produce (review finding, round 7)
        # never-green pins occupy the front...
        Q._HISTORY_CACHE = {
            k: v for k, v in real.items() if k not in Q._DRIVER_PIN
        }
        front = list(Q.all_queries())[: len(Q._DRIVER_PIN)]
        assert front == Q._DRIVER_PIN
        # ...and once the driver verifies them (round 99) they are inert
        Q._HISTORY_CACHE = {**real, **{n: 99 for n in Q._DRIVER_PIN}}
        front50 = list(Q.all_queries())[:50]
        assert not set(front50) & set(Q._DRIVER_PIN)
    finally:
        Q._HISTORY_CACHE = None
