"""One-off dump of the CC/LPA round-0 sub-plans (r15 O7 evidence):
the identity-label build + first-round join (before) vs the folded
single aggregation (after), as explain("formatted") text under
plans/r15/. Pure measurement tool — never imported by the engine.

    python tools/dump_round0_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from library_beam_spark.session import get_spark

    spark = get_spark("round0-plans")
    spark.sparkContext.setLogLevel("ERROR")
    half = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(300) if i != (i * 7) % 50],
        "u long, v long",
    )
    e = (
        half.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .distinct()
        .repartition(F.col("v"))
        .persist()
    )
    e.count()

    # BEFORE: identity labels (distinct over the edge list) + the
    # first round's edge-labels join and neighbor-min aggregation.
    identity = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    nbr_min0 = (
        e.join(identity.select(F.col("node").alias("v"), "component"), "v")
        .groupBy("u")
        .agg(F.min("component").alias("_nbr"))
    )
    before = identity.join(
        nbr_min0.select(F.col("u").alias("node"), "_nbr"), "node", "left"
    ).select(
        "node",
        F.least("component", F.coalesce("_nbr", "component")).alias(
            "component"
        ),
    )

    # AFTER: the folded round 0 — one map-side-partial aggregation.
    after = (
        e.groupBy("u")
        .agg(F.min("v").alias("_nbr"))
        .select(
            F.col("u").alias("node"),
            F.least("u", "_nbr").alias("component"),
        )
    )

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    for name, df in (("cc_round0_before", before), ("cc_round0_after", after)):
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(_formatted(df))
        print("wrote", name)
    e.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
