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
# pub_id (load2es.py:23-50 index_config). ``suffix`` is the split-output
# filename suffix, ``index`` the ES index name pattern, ``mappings`` the
# mapping file applied at index creation (publication.json / concept.json).
INDEX_CONFIG = {
    "publication": {
        "id_col": "pub_id",
        "suffix": "_small.json.gz",
        "index": "{prefix}",
        "mappings": "publication.json",
    },
    "bioentities": {
        "id_col": "pub_id",
        "suffix": "_bioentities.json.gz",
        "index": "{prefix}-bioentity",
        "mappings": None,
    },
    "taggedtext": {
        "id_col": "pub_id",
        "suffix": "_taggedtext.json.gz",
        "index": "{prefix}-taggedtext",
        "mappings": None,
    },
    "concepts": {
        "id_col": None,
        "suffix": "_concepts.json.gz",
        "index": "{prefix}-concept",
        "mappings": "concept.json",
    },
}


def es_writer_options(
    name: str,
    es_nodes: str,
    index_prefix: str = "pubmed-20",
    batch_entries: int = 1000,
) -> dict[str, str]:
    """Assemble the connector option dict for one of the four split
    outputs — pure and cluster-free, so the ES contract (which index gets
    es.mapping.id, bulk chunk sizing = load2es.py:209-220, index naming =
    load2es.py:23-50) is unit-testable without a live cluster."""
    cfg = INDEX_CONFIG[name]
    opts = {
        "es.nodes": es_nodes,
        "es.resource": cfg["index"].format(prefix=index_prefix),
        "es.batch.size.entries": str(batch_entries),
        # index-lifecycle tuning during bulk load (load2es.py:178-186):
        # no intermediate refresh, replicas added post-load
        "es.index.auto.create": "true",
    }
    if cfg["id_col"]:
        opts["es.mapping.id"] = cfg["id_col"]
    return opts


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
    name: str,
    es_nodes: str,
    index_prefix: str = "pubmed-20",
) -> None:
    """S9: optional ES bulk sink via the elasticsearch-spark connector.
    ``name`` is one of the INDEX_CONFIG split outputs; all connector
    options come from :func:`es_writer_options` (contract-tested)."""
    spark = df.sparkSession
    try:
        # Class.forName probes eagerly — a bare py4j attribute chain
        # resolves lazily and would not fail until save()
        spark._jvm.java.lang.Class.forName("org.elasticsearch.spark.sql.EsSparkSQL")
    except Exception as e:  # connector jar not on classpath
        raise RuntimeError(
            "elasticsearch-spark connector not available; add "
            "org.elasticsearch:elasticsearch-spark-30_2.13 to spark.jars.packages "
            "or use run_load() (Parquet) instead"
        ) from e
    writer = df.write.format("org.elasticsearch.spark.sql")
    for k, v in es_writer_options(name, es_nodes, index_prefix).items():
        writer = writer.option(k, v)
    writer.mode("overwrite").save()


def register_views(spark: SparkSession, base_path: str) -> None:
    """Re-register the four tables as views in a fresh session."""
    for name in INDEX_CONFIG:
        spark.read.parquet(f"{base_path}/{name}").createOrReplaceTempView(name)
