"""Interleaved warm A/B for bench watch items (SCALE.md protocol):
alternate the watch queries with a control inside ONE warm session,
median over reps, so cold-start and machine-load effects cancel.

Usage: python tools/ab_watch.py [reps] [sf_dir] query [query ...]
(first listed query is the control)."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.queries import all_queries  # noqa: E402
from redis_streams_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    spark = get_spark("ab-watch")
    specs = {n: all_queries()[n] for n in names}
    # warm-up: one untimed pass of every query
    for n, s in specs.items():
        s.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for n, s in specs.items():  # interleaved within each rep
            t0 = time.perf_counter()
            s.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[n].append(dt)
            print(f"rep {rep} {n}: {dt:.3f}s", flush=True)
    for n in names:
        xs = times[n]
        print(
            f"{n}: median {statistics.median(xs):.3f}s "
            f"min {min(xs):.3f} max {max(xs):.3f} reps {len(xs)}"
        )


if __name__ == "__main__":
    main()
