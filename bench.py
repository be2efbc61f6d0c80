"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the scale-relevant operators (one per family), not the
whole registry: dedup window vs max_by, wide agg, star join, range join,
top-k window, minhash-LSH near-dup, brute-force + LSH ANN, event-time
windows, co-occurrence. Each is timed over a full action (count) so scan
+ shuffle + agg are all inside the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "latest_version_dedup",
    "latest_version_window",
    "pricing_summary",
    "join_star_revenue",
    "range_join_events",
    "topk_per_group",
    "running_sum",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "simhash_bits",
    "cosine_topk",
    "lsh_embedding_topk",
    "tumbling_window",
    "session_windows",
    "brand_cooccurrence",
    "analyzer_terms",
    "quality_scores",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from library_beam_spark import registry
    from library_beam_spark.session import get_spark

    spark = get_spark("bench")
    qs = registry.queries()

    # Warm the JVM/paths once with a trivial action (JIT + filesystem
    # metadata); not counted.
    spark.range(1).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
