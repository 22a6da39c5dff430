"""Growth + data-quality audit session over the round-6 operators:
new-vs-returning accounting → decile lift → audience overlap →
attribution split → seasonality residuals, then the data-quality gate
(Benford, IQR fences, ingest coverage, join-fanout pre-check) a
pipeline runs before trusting the numbers.

Run: python examples/growth_quality_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.queries.analytics5 import (  # noqa: E402
    q_attribution,
    q_cdc_compact,
)
from redis_streams_spark.queries.analytics6 import (  # noqa: E402
    q_audience_overlap,
    q_benford,
    q_decile_lift,
    q_ingest_gap_islands,
    q_iqr_outliers,
    q_join_fanout_audit,
    q_new_vs_returning,
)
from redis_streams_spark.queries.timeseries3 import (  # noqa: E402
    q_activity_streaks,
    q_seasonal_residual,
)
from redis_streams_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("growth-quality-audit")

    print("== growth accounting: new vs returning actives ==")
    q_new_vs_returning(spark, sf_dir).show(10, truncate=False)

    print("== whale analysis: value decile lift ==")
    q_decile_lift(spark, sf_dir).show(10, truncate=False)

    print("== cross-feature adoption: audience overlap ==")
    q_audience_overlap(spark, sf_dir).show(truncate=False)

    print("== revenue attribution: first vs last touch ==")
    q_attribution(spark, sf_dir).show(truncate=False)

    print("== engagement streaks (top 5 by longest) ==")
    q_activity_streaks(spark, sf_dir).orderBy(
        "longest_streak", ascending=False
    ).show(5, truncate=False)

    print("== de-seasonalized residuals (sample) ==")
    q_seasonal_residual(spark, sf_dir).show(5, truncate=False)

    print("== net state after CDC compaction (sample) ==")
    q_cdc_compact(spark, sf_dir).show(5, truncate=False)

    print("== data-quality gate ==")
    print("-- Benford first-digit audit --")
    q_benford(spark, sf_dir).show(truncate=False)
    print("-- IQR outlier fences --")
    q_iqr_outliers(spark, sf_dir).show(truncate=False)
    print("-- ingest coverage islands --")
    q_ingest_gap_islands(spark, sf_dir).show(truncate=False)
    print("-- join fanout pre-check (top keys) --")
    q_join_fanout_audit(spark, sf_dir).show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
