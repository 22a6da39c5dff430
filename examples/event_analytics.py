"""End-to-end product-analytics session over the ``events`` stream
table: funnel → attribution as-of join → experiment readout → anomaly
triage → seasonality — each stage one of the engine's registered
operators composed as plain DataFrames.

Run: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.queries.analytics3 import (  # noqa: E402
    q_ab_test,
    q_changepoint_cusum,
    q_funnel_windowed,
    q_mad_anomaly,
    q_seasonal_profile,
)
from redis_streams_spark.queries.timeseries2 import (  # noqa: E402
    q_asof_tolerance,
    q_decay_score,
)
from redis_streams_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("event-analytics-example")

    print("== Windowed funnel (view → click → purchase, 24h steps) ==")
    q_funnel_windowed(spark, sf_dir).show(truncate=False)

    print("== Purchase attribution: latest click within 30 min ==")
    q_asof_tolerance(spark, sf_dir).where("matched_click_id != -1").show(5)

    print("== Experiment readout: Welch t between value distributions ==")
    q_ab_test(spark, sf_dir).show()

    print("== Anomaly triage: 5×MAD robust outlier census ==")
    q_mad_anomaly(spark, sf_dir).show()

    print("== Change-point scan (CUSUM peak day per type) ==")
    q_changepoint_cusum(spark, sf_dir).show()

    print("== Seasonality heatmap cells (top 10 by share) ==")
    q_seasonal_profile(spark, sf_dir).orderBy("share", ascending=False).show(10)

    print("== Engagement decay scores (top 5 users) ==")
    q_decay_score(spark, sf_dir).orderBy("decayed_score", ascending=False).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
