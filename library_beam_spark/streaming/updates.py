"""Streaming updates feed: latest-version-per-PMID as a stateful stream.

Batch semantics (operators/dedup.latest_version) re-expressed over a
file-arrival stream:

- source: a directory where parsed-citation JSON lands as update files
  arrive (the parse stage itself stays batch per file — gzip XML is a
  per-file unit in either engine);
- state: per pub_id, the (version tuple, row) of the current winner;
  a newer version (filename, ingest order) replaces it; tombstones
  store a deleted marker so later stale versions stay suppressed;
- output: one row per state CHANGE (update-mode upsert feed) with an
  ``is_deleted`` retraction flag — exactly the delete-propagation
  contract of main.py:290-305;
- late data: a file arriving late still wins/loses by filename order,
  not arrival order, so event-time = filename sequence (SURVEY §2.9);
  the watermark only bounds state growth for sessionized consumers.

Scale: state is hash-partitioned by pub_id (30 M keys ≈ a few GB of
winner rows across executors); ``applyInPandasWithState`` processes each
key group Arrow-batched. The ``foreach_batch_merge`` alternative keeps
the winners in a Parquet table per micro-batch for engines without state
stores.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import RAW_CITATION

# upsert feed schema: the citation columns + the change marker
UPSERT_SCHEMA = RAW_CITATION

_STATE_SCHEMA = "filename string, is_deleted boolean, payload string"


def stream_raw_citations(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over parsed-citation JSON (schema fixed, never
    inferred — S5 discipline)."""
    return spark.readStream.schema(RAW_CITATION).json(path)


def latest_version_upsert(stream: DataFrame) -> DataFrame:
    """Stateful latest-version-wins upsert keyed by pub_id.

    Emits a row whenever a key's winner CHANGES (including tombstone
    retractions, carried as is_deleted=true rows). Stale versions —
    older filenames arriving late — are absorbed silently.
    """
    import json

    cols = [f.name for f in RAW_CITATION.fields]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_filename, cur_deleted, payload = state.get
        else:
            cur_filename, cur_deleted, payload = None, False, None

        best: dict[str, Any] | None = None
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                if best is None or (rec["filename"], not rec["is_deleted"]) > (
                    best["filename"], not best["is_deleted"]
                ):
                    best = rec

        changed = False
        if best is not None and (cur_filename is None or best["filename"] >= cur_filename):
            if best["filename"] != cur_filename or bool(best["is_deleted"]) != bool(cur_deleted):
                changed = True
            cur_filename = best["filename"]
            cur_deleted = bool(best["is_deleted"])
            payload = json.dumps(
                {k: (str(v) if v is not None else None) if k in ("pub_date", "first_publication_date") else v
                 for k, v in best.items()
                 if k in ("pub_id", "filename", "is_deleted", "title", "abstract", "doi")},
                default=str,
            )
            state.update((cur_filename, cur_deleted, payload))

        if changed and payload is not None:
            rec = json.loads(payload)
            row = {c: rec.get(c) for c in cols}
            row["is_deleted"] = cur_deleted
            yield pd.DataFrame([row], columns=cols)

    return stream.groupBy("pub_id").applyInPandasWithState(
        update,
        outputStructType=UPSERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def foreach_batch_merge(stream: DataFrame, table_path: str):
    """The state-store-free alternative: per micro-batch, merge the new
    versions into a Parquet 'winners' table (read-modify-write compaction;
    with a Delta/Iceberg catalog this becomes a real MERGE INTO)."""
    from ..operators.dedup import latest_version

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            current = spark.read.parquet(table_path)
            merged = current.unionByName(batch, allowMissingColumns=True)
        except Exception:
            merged = batch
        winners = latest_version(
            merged, key_cols=["pub_id"], version_cols=["filename"],
            tombstone_col=None,
        )
        winners.write.mode("overwrite").parquet(table_path + "_tmp")
        spark.read.parquet(table_path + "_tmp").write.mode("overwrite").parquet(table_path)

    return stream.writeStream.foreachBatch(merge)
