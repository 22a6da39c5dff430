"""Scale-up measurement runner: time named registry queries against an
arbitrary sf directory (typically one synthesized by make_scale_data.py)
in a warm session, mirroring bench.py's discipline — codegen shapes are
compiled at sf0.001 first, timings exclude warm-up, results go to a noop
sink so the number measures the engine, not driver result shipping.

Usage:
    python tools/scale_run.py <sf_dir> <query> [query ...]
Prints one JSON line: {"sf_dir": ..., "queries": {name: sec, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.queries import all_queries  # noqa: E402
from redis_streams_spark.session import get_spark, load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("scale-run")
    specs = all_queries()
    missing = [n for n in names if n not in specs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    spark.range(1000).selectExpr("sum(id)").collect()
    for t in (
        "lineitem",
        "orders",
        "customer",
        "supplier",
        "part",
        "documents",
        "embeddings",
        "events",
    ):
        try:
            load_table(spark, sf_dir, t).limit(10).collect()
        except Exception as e:
            print(f"warn: table warm-up {t} failed: {e}", file=sys.stderr)
    # a silently skipped warm-up would fold cold codegen compile into the
    # first timed number — the exact artifact this tool exists to exclude
    # — so failures are LOUD, never swallowed (review finding, round 6)
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        raise SystemExit(
            f"warm dir {warm_dir} missing (set SPARK_GRAFT_WARM_DIR); "
            "refusing to time cold-codegen runs"
        )
    for n in names:
        try:
            specs[n].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:
            print(
                f"warn: codegen warm-up for {n} failed ({e}); its timing "
                "below includes cold compile",
                file=sys.stderr,
            )

    timings: dict[str, float] = {}
    for n in names:
        t0 = time.perf_counter()
        specs[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[n] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
