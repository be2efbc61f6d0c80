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

import datetime
import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import RAW_CITATION

# upsert feed schema: the citation columns + the change marker
UPSERT_SCHEMA = RAW_CITATION

# seq = per-key arrival counter, the streaming twin of the batch
# _ingest_id tie-break (pipelines/enrich.py:42-48): it strictly increases,
# so a later arrival wins any filename tie both within a micro-batch and
# against prior state — one total order, batch-boundary independent.
_STATE_SCHEMA = "filename string, seq bigint, is_deleted boolean, payload string"

_DATE_COLS = ("pub_date", "first_publication_date")


def _jsonable(v: Any) -> Any:
    """Recursively convert a pandas record value to JSON-clean Python
    (ndarray→list, numpy scalar→item, date→ISO string, NaN→None)."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return [_jsonable(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, np.generic):
        return _jsonable(v.item())
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


def stream_raw_citations(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over parsed-citation JSON (schema fixed, never
    inferred — S5 discipline)."""
    return spark.readStream.schema(RAW_CITATION).json(path)


def latest_version_upsert(stream: DataFrame) -> DataFrame:
    """Stateful latest-version-wins upsert keyed by pub_id.

    Emits a row whenever a key's winner CHANGES (including tombstone
    retractions, carried as is_deleted=true rows). Stale versions —
    older filenames arriving late — are absorbed silently.

    The full RAW_CITATION record is serialized into the state payload, so
    the upsert feed carries every column the batch ``latest_version`` path
    keeps (streaming == batch parity). The version order is the total
    order (filename, seq): seq is a per-key arrival counter, so a later
    arrival wins a filename tie exactly as the batch tie-break
    (filename, _ingest_id) does — independent of micro-batch boundaries.
    """
    import json

    cols = [f.name for f in RAW_CITATION.fields]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_filename, cur_seq, cur_deleted, payload = state.get
        else:
            cur_filename, cur_seq, cur_deleted, payload = None, -1, False, None

        old_payload = payload
        seq = cur_seq
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                seq += 1
                # (rec.filename, seq) > (cur_filename, cur_seq) reduces to
                # filename >= cur_filename because seq strictly increases.
                if cur_filename is None or rec["filename"] >= cur_filename:
                    cur_filename = rec["filename"]
                    cur_seq = seq
                    cur_deleted = bool(rec["is_deleted"])
                    payload = json.dumps({k: _jsonable(v) for k, v in rec.items()})

        if payload != old_payload:
            state.update((cur_filename, cur_seq, cur_deleted, payload))
            rec = json.loads(payload)
            row = {c: rec.get(c) for c in cols}
            row["is_deleted"] = cur_deleted
            for c in _DATE_COLS:
                if row.get(c) is not None:
                    row[c] = datetime.date.fromisoformat(str(row[c])[:10])
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
