"""Core-count scaling sweep (r15 judge item #9): time a query list at
the CURRENT ``$SPARK_GRAFT_CPUS`` (bench methodology — full .count()
actions, cache cleared between passes, min/med of N passes) and print
one JSON line per query. Run it twice — SPARK_GRAFT_CPUS=32 then 8 —
back-to-back on the SAME sf dir and compare: the c8/c32 ratio
approaches the core ratio for data-bound queries once the SF is large
enough that fixed per-action overheads stop dominating (at sf0.1 they
dominate, which is why the r15 ratios were uninformative).

    SPARK_GRAFT_CPUS=32 python tools/cores_sweep.py /root/sfdata/sf1 q1 q2 ...

Pure measurement tool — never imported by the engine/bench/tests.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0]
    names = args[1:]
    passes = int(os.environ.get("SPARK_GRAFT_SWEEP_PASSES", "2"))

    from library_beam_spark import registry
    from library_beam_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("cores_sweep")
    qs = registry.queries()
    spark.range(1).count()
    spark.range(64).repartition(int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    for name in names:
        fn = qs[name]
        runs = []
        n = 0
        for _ in range(passes):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        runs.sort()
        print(
            json.dumps(
                {
                    "query": name,
                    "cpus": int(cpus),
                    "sf_dir": sf_dir,
                    "rows": n,
                    "runs": runs,
                    "min": runs[0],
                    "med": round(statistics.median(runs), 3),
                }
            )
        )


if __name__ == "__main__":
    main()
