"""Dedup-tuning walkthrough (round-8 family end-to-end): how to pick
LSH parameters BEFORE burning a 100-TB pass.

  1. band tuning      — the S-curve P(collide | Jaccard=s) for three
                        (bands x rows) splits of the same 32-perm
                        signature, with measured candidate volume per
                        config: where to put the collision threshold.
  2. accuracy audit   — measured |minhash-estimate − exact Jaccard| for
                        verified candidate pairs: is 32 permutations
                        enough resolution for the chosen threshold?
  3. tier dashboard   — exact-hash / near-dup / unique tiers of the
                        corpus under the chosen config: what the
                        pipeline would actually drop.
  4. threshold curve  — survivor counts across Jaccard cutoffs: the
                        cost/quality dial for the final decision.

Every stage is a registered, oracle-verified query; this script
composes them into the decision narrative.

Run: python examples/dedup_tuning.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.queries import all_queries
from redis_streams_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dedup-tuning")
    q = all_queries()

    print("== 1. band tuning: S-curve + candidate volume per config ==")
    print("   (threshold ~ (1/b)^(1/r): 16x2 fires early/noisy, 4x8")
    print("    fires late/precise — pick the knee nearest your cutoff)")
    q["dedup_lsh_band_tuning"].fn(spark, sf_dir).show(30, truncate=False)

    print("== 2. minhash accuracy: estimate vs exact Jaccard ==")
    q["dedup_minhash_accuracy"].fn(spark, sf_dir).show(truncate=False)

    print("== 3. corpus tier dashboard under the chosen config ==")
    q["dedup_tier_summary"].fn(spark, sf_dir).show(truncate=False)

    print("== 4. survivor counts across Jaccard thresholds ==")
    q["dedup_threshold_curve"].fn(spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
