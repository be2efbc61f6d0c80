"""Streaming skyline maintenance — the Pareto front kept current as
points ARRIVE (the preference-query twin of streaming/lossy.py's
heavy hitters).

The fold leans on the skyline closure law: for insertion-only
streams, ``skyline(A ∪ B) = skyline(skyline(A) ∪ B)`` — a dominated
point can never re-enter the front when new points are added, so the
committed front is a LOSSLESS summary of everything seen and each
batch folds as one skyline pass over (committed front ∪ batch). The
law is associative and batch-order-free, which makes the fold
redelivery-idempotent under the shared commit protocol. Deletions are
out of scope by construction (a removed front point can resurrect
dominated history — decremental skylines need the full point set).

State grain — stated plainly: the committed front itself, i.e.
skyline-sized. Real tradeoff fronts are tiny (log-ish in n for
independent objectives); the adversarial worst case (perfectly
anti-correlated objectives) is the whole stream, the same worst case
any exact skyline maintenance pays.

Per-batch cost: skyline_2d over |front| + |batch| rows — the
range-partition form, never a global window, never quadratic
(operators/skyline.skyline_2d).

State layout per commit: batch=N/front (the full front rows).
Crash/replay contract: shared atomic CURRENT-pointer commit
(streaming/dedup helpers); redelivered batches dropped by the
batch-id check; a committed pointer whose state partition is missing
fails loudly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.skyline import skyline_2d
from .dedup import _check_config, _commit, _read_meta


def skyline_stream_batches(
    index_dir: str,
    x_col: str,
    y_col: str,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: any columns including the two integer objective
    columns (``x_col`` minimized, ``y_col`` maximized)."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"x_col": x_col, "y_col": y_col}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "skyline_stream_batches",
            "objective columns would silently change mid-stream; "
            "restart with the same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = batch.sparkSession
        pts = batch
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and not os.path.isdir(prev_dir):
            raise RuntimeError(
                f"committed pointer batch={committed} has no state "
                f"directory under {index_dir} — state store corrupted; "
                "refusing to fold from a partial prefix"
            )
        if committed >= 0:
            pts = pts.unionByName(
                spark.read.parquet(os.path.join(prev_dir, "front"))
            )
        front = skyline_2d(pts, x_col, y_col)
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            front.write.mode("overwrite").parquet(
                os.path.join(out, "front")
            )
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step


def skyline_result(spark, index_dir: str) -> DataFrame:
    """Current committed Pareto front."""
    committed, _ = _read_meta(index_dir)
    if committed < 0:
        raise ValueError(f"no committed state in {index_dir}")
    return spark.read.parquet(
        os.path.join(index_dir, f"batch={committed}", "front")
    )
