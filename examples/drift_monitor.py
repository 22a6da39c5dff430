"""Statistical drift-monitoring session over the round-7 stats toolkit:
the checks a data platform runs per ingest batch before trusting (or
training on) new data.

Order of escalation mirrors practice: cheap per-source screens first
(Mann-Whitney rank shift, ANOVA mean shift, Brown-Forsythe spread
shift), then the focused two-sample comparisons (KS "did it shift",
Wasserstein "by how much", Cohen's d "does it matter"), then the
time-axis monitors (JS mix drift per day, runs test for trend,
Kendall/Spearman for cross-series association).

Run: python examples/drift_monitor.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.queries.stats import (  # noqa: E402
    q_anova_oneway,
    q_cohens_d,
    q_kendall_tau,
    q_ks_test,
    q_levene_test,
    q_mann_whitney,
    q_mix_drift,
    q_runs_test,
    q_spearman_daily,
    q_wasserstein_1d,
)
from redis_streams_spark.queries.stats2 import (  # noqa: E402
    q_benjamini_hochberg,
)
from redis_streams_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("drift-monitor")

    print("== per-source screens ==")
    print("-- Mann-Whitney U: length-distribution shift per source --")
    q_mann_whitney(spark, sf_dir).show(truncate=False)
    print("-- one-way ANOVA: any mean-length difference at all? --")
    q_anova_oneway(spark, sf_dir).show(truncate=False)
    print("-- Brown-Forsythe: are the spreads comparable? --")
    q_levene_test(spark, sf_dir).show(truncate=False)
    print("-- Benjamini-Hochberg: which of the 25 simultaneous brand")
    print("   tests survive at FDR 0.05? (screens emit many p-values;")
    print("   this is the multiplicity control before acting on any) --")
    q_benjamini_hochberg(spark, sf_dir).show(5, truncate=False)

    print("== focused two-sample comparison (first two sources) ==")
    print("-- KS: did the distribution shift? --")
    q_ks_test(spark, sf_dir).show(truncate=False)
    print("-- Wasserstein-1: by how much (in value units)? --")
    q_wasserstein_1d(spark, sf_dir).show(truncate=False)
    print("-- Cohen's d: does the mean shift matter? --")
    q_cohens_d(spark, sf_dir).show(truncate=False)

    print("== time-axis monitors ==")
    print("-- JS mix drift per day vs corpus baseline (worst 5 days) --")
    q_mix_drift(spark, sf_dir).orderBy(
        "js_divergence", ascending=False
    ).show(5, truncate=False)
    print("-- runs test: is the daily series trending or random? --")
    q_runs_test(spark, sf_dir).show(truncate=False)
    print("-- rank association between revenue and volume --")
    q_kendall_tau(spark, sf_dir).show(truncate=False)
    q_spearman_daily(spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
