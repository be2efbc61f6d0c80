"""Bucketed tables for co-located joins (SURVEY 'Partitioning & shuffle').

A join between two tables bucketed the same way (same column, same
bucket count) needs NO exchange: each task reads matching bucket files
from both sides. At 100 TB this converts the dominant shuffle of
repeated fact-to-fact joins (e.g. concepts ⋈ publications on pub_id,
run by every co-occurrence query) into a scan-local merge.

Spark only honors bucketing through the catalog (``saveAsTable``), not
raw parquet paths — so these helpers manage catalog tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets upgrades the join to a zero-sort merge."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a leftover warehouse dir without a catalog entry (e.g. from a prior
    # session) blocks managed-table creation — clear it
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name.split('.')[-1]}", ignore_errors=True)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str],
    how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs
    Catalyst plans a SortMergeJoin with NO Exchange on either side
    (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
