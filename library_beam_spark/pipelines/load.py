"""Load stage (reference load2es.py, S8-S11).

The engine's primary queryable store is partitioned Parquet + Spark SQL
views (the ES indexes' role — SURVEY §1.1 "search index documents").
The reference's whole generator/thread/bulk machinery (load2es.py:53-228)
disappears into ``DataFrameWriter``; its index-lifecycle tuning
(refresh_interval:-1, replicas:0 — load2es.py:178-186) maps to writer
options (overwrite mode, file sizing).

An Elasticsearch sink is still exposed behind a capability check: with
the ``elasticsearch-spark`` connector on the classpath it writes with
``es.mapping.id = pub_id`` (the reference's _id mapping for 3 of 4
indexes, load2es.py:90-98); without it, it raises with instructions —
never a silent fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


# doc _id mapping parity: concept docs get an auto id; the others key by
# pub_id (load2es.py:23-50 index_config)
INDEX_CONFIG = {
    "publication": {"id_col": "pub_id"},
    "bioentities": {"id_col": "pub_id"},
    "taggedtext": {"id_col": "pub_id"},
    "concepts": {"id_col": None},
}


def run_load(
    outputs: dict[str, DataFrame],
    base_path: str,
    max_records_per_file: int = 500_000,
) -> dict[str, str]:
    """Write every split output as a Parquet table and register a temp
    view (the `!publication-data` alias role, publication_alias.sh).

    ``maxRecordsPerFile`` is the Parquet analog of bulk chunk sizing
    (load2es.py:209-220): bounds file sizes so downstream scans
    parallelize well.
    """
    paths: dict[str, str] = {}
    for name, df in outputs.items():
        path = f"{base_path}/{name}"
        (
            df.write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
            .parquet(path)
        )
        paths[name] = path
        df.sparkSession.read.parquet(path).createOrReplaceTempView(name)
    return paths


def write_elasticsearch(
    df: DataFrame,
    index: str,
    es_nodes: str,
    id_col: str | None = "pub_id",
) -> None:
    """S9: optional ES bulk sink via the elasticsearch-spark connector."""
    spark = df.sparkSession
    try:
        spark._jvm.org.elasticsearch.spark.sql.EsSparkSQL  # noqa: B018
    except Exception as e:  # connector jar not on classpath
        raise RuntimeError(
            "elasticsearch-spark connector not available; add "
            "org.elasticsearch:elasticsearch-spark-30_2.13 to spark.jars.packages "
            "or use run_load() (Parquet) instead"
        ) from e
    writer = (
        df.write.format("org.elasticsearch.spark.sql")
        .option("es.nodes", es_nodes)
        .option("es.resource", index)
        .option("es.batch.size.entries", "1000")  # load2es.py:214 chunk_size
    )
    if id_col:
        writer = writer.option("es.mapping.id", id_col)
    writer.mode("overwrite").save()


def register_views(spark: SparkSession, base_path: str) -> None:
    """Re-register the four tables as views in a fresh session."""
    for name in INDEX_CONFIG:
        spark.read.parquet(f"{base_path}/{name}").createOrReplaceTempView(name)
