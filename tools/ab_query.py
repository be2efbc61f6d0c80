"""A/B harness: alternate two env-gated variants of registry queries in
ONE Spark session so load noise hits both arms equally (guide §1).

    python tools/ab_query.py [sf_dir] --env NAME --a VAL --b VAL \
        [--passes N] query [query ...]

Runs each query ``passes`` times per arm, interleaved (A,B,A,B,...),
with the cache cleared between passes, and prints per-arm min/med.
The toggled env var is read by the engine at plan-build time, so each
pass rebuilds the query under its arm's setting. Pure measurement tool —
never imported by the engine, the bench, or the tests.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    env_name, a_val, b_val, passes = None, None, None, 3
    names: list[str] = []
    sf_dir = "/root/testdata/sf0.1"
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--env":
            env_name = args[i + 1]
            i += 2
        elif a == "--a":
            a_val = args[i + 1]
            i += 2
        elif a == "--b":
            b_val = args[i + 1]
            i += 2
        elif a == "--passes":
            passes = int(args[i + 1])
            i += 2
        elif os.path.isdir(a):
            sf_dir = a
            i += 1
        else:
            names.append(a)
            i += 1
    assert env_name and names, "need --env NAME and at least one query"

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from library_beam_spark import registry
    from library_beam_spark.session import get_spark

    spark = get_spark("ab")
    qs = registry.queries()
    spark.range(1).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    for name in names:
        fn = qs[name]
        runs: dict[str, list[float]] = {"A": [], "B": []}
        rows: dict[str, int] = {}
        for p in range(passes):
            for arm, val in (("A", a_val), ("B", b_val)):
                if val is None:
                    os.environ.pop(env_name, None)
                else:
                    os.environ[env_name] = val
                spark.sparkContext.setJobDescription(f"{name}::{arm}::{p}")
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                runs[arm].append(time.time() - t0)
                rows[arm] = n
                spark.sparkContext.setJobDescription(None)
                spark.catalog.clearCache()
        for arm, val in (("A", a_val), ("B", b_val)):
            r = sorted(runs[arm])
            print(
                f"{name} [{arm}={env_name}={val!r}] rows={rows[arm]} "
                f"runs={[round(x, 2) for x in r]} min={r[0]:.3f} "
                f"med={statistics.median(r):.3f}"
            )
        if rows["A"] != rows["B"]:
            print(f"!! {name}: ROW COUNT MISMATCH A={rows['A']} B={rows['B']}")


if __name__ == "__main__":
    main()
