#!/usr/bin/env python
"""Scale-factor stress sweep: time a set of registry queries at several
SF dirs (bench.py methodology — min-of-2 full-action passes, cache
cleared between passes, local[$SPARK_GRAFT_CPUS]) and print one JSON
line per query with the per-SF seconds and the pairwise ratios.

The point (r5 VERDICT #1): a query whose cost grows FASTER than its
input between sf1 and sf5 is hiding a super-linear plan — exactly how
the triangle shuffle-byte blowup was caught. Ratios well under the
data-scale multiple are expected (fixed overheads amortize); ratios
above it demand either a fix or a work-linearity proof.

Usage:
  python tools/scaling_sweep.py .sfdata/sf1 .sfdata/sf5 -- q1 q2 ...
  python tools/scaling_sweep.py .sfdata/sf1 .sfdata/sf5   # default set
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# VERDICT r5 #1: the top-cost family beyond the queries already swept
DEFAULT = [
    "copurchase_pagerank",
    "cluster_safe_split",
    "prefix_filter_jaccard",
    "incremental_dedup_matches",
    "bloom_decontaminated_docs",
    "cms_heavy_hitter_terms",
    "bpe_merges",
    "copurchase_triangle_nodes",  # validates the r5 broadcast-adj fix at sf5
    "semdedup_adaptive",          # validates adaptive cells at sf5
]


def main() -> None:
    argv = sys.argv[1:]
    if "--" in argv:
        cut = argv.index("--")
        sf_dirs, names = argv[:cut], argv[cut + 1 :]
    else:
        sf_dirs, names = argv, DEFAULT
    if len(sf_dirs) < 2:
        sys.exit("need at least two SF dirs")

    from library_beam_spark import registry
    from library_beam_spark.session import get_spark

    spark = get_spark("scaling_sweep")
    qs = registry.queries()
    spark.range(1).count()  # JVM warmup, not counted

    rows = []
    for name in names:
        fn = qs[name]
        secs = {}
        for sf_dir in sf_dirs:
            best, n = None, 0
            for _ in range(2):
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            secs[sf_dir] = round(best, 3)
            print(f"# {name} @ {sf_dir}: {secs[sf_dir]:.3f}s ({n} rows)",
                  file=sys.stderr, flush=True)
        ratios = {
            f"{sf_dirs[i]}->{sf_dirs[i+1]}": round(
                secs[sf_dirs[i + 1]] / max(secs[sf_dirs[i]], 1e-9), 2
            )
            for i in range(len(sf_dirs) - 1)
        }
        row = {"query": name, "secs": secs, "ratios": ratios}
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
