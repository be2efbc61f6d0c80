"""Slowly-changing-dimension (type 2) history builder.

The reference keeps only the LATEST version of each record
(``GetLatestVersion``, /root/reference/main.py:576-587) — type-1
semantics that discard history. Warehouses that audit *when* an
attribute held a value need the type-2 generalization: one row per
(key, attribute-state) interval with ``valid_from`` / ``valid_to``
bounds and an ``is_current`` flag, where consecutive versions whose
tracked attributes did NOT change are collapsed into one interval
(change-data-capture compaction).

Scale notes (100 TB):
- Both windows (the change-detection ``lag`` and the interval-closing
  ``lead``) partition by the dimension key — never a global sort. The
  second window runs on the FILTERED change rows and reuses the first
  window's hash partitioning (Catalyst keeps the child distribution
  through the filter, so the plan carries ONE exchange; asserted in
  tests/test_plans.py).
- Per-key state is the version list of one key — the same skew profile
  as ``latest_version``; no broadcast, no driver state.
- Output is strictly smaller than the input (change rows only), so the
  operator composes with downstream merges without re-exploding.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    attr_cols: list[str],
    keep_order_tail: bool = False,
) -> DataFrame:
    """Collapse a versioned record stream into type-2 dimension history.

    ``order_cols`` must be a deterministic total order within each key
    (pass a unique tiebreaker last — same contract as
    ``dedup.latest_version``). A row OPENS a new interval iff it is the
    key's first version or any ``attr_cols`` value differs from the
    previous version (null-safe). ``valid_from`` is the opening row's
    first order column; ``valid_to`` is the next interval's
    ``valid_from`` (null for the current interval).

    ``keep_order_tail=True`` keeps the OPENING event's remaining order
    columns (``order_cols[1:]``) on each interval row — the streaming
    fold (streaming/scd.py) needs them so a carried open interval
    re-enters a later fold at its original sort position.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    changed = functools.reduce(
        operator.or_,
        [~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w)) for a in attr_cols],
    )
    opens = (F.row_number().over(w) == 1) | changed
    change_rows = (
        df.withColumn("_opens", opens)
        .filter(F.col("_opens"))
        .drop("_opens")
    )
    valid_from = F.col(order_cols[0]).alias("valid_from")
    # The lead() window shares `w`'s partition keys: the filtered child
    # is already hash-distributed by the key, so it only re-sorts locally.
    return (
        change_rows.select(*key_cols, *attr_cols, valid_from, *order_cols[1:])
        .withColumn("valid_to", F.lead("valid_from").over(
            Window.partitionBy(*key_cols).orderBy(
                "valid_from", *order_cols[1:]
            )
        ))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(*([] if keep_order_tail else order_cols[1:]))
    )
