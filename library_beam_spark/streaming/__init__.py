"""Structured Streaming layer (SURVEY §2.9).

The reference is batch-only, but its baseline + updatefiles design is an
incremental-ingest contract (README.md:14-23): update files keep
arriving; each re-run regroups by PMID and the latest filename wins;
DeleteCitation tombstones retract.

Modules:
    updates.py  file-source stream of parsed citations + stateful
                latest-version upsert (applyInPandasWithState) and the
                foreachBatch-merge alternative
    windows.py  watermarked tumbling/sliding/session windows over an
                event stream (the batch twins live in the registry:
                tumbling_window / sliding_window / session_windows)
    joins.py    stream-stream interval join + stream-static broadcast
                enrichment
    manifest.py manifest-committed parquet table: snapshot isolation,
                time travel, vacuum, compaction (the Delta/Iceberg
                mechanism without the dependency)
    sessions.py stateful gap-based sessionization (O(1) state per
                user), parity-locked to operators/sessions
    sketches.py bounded-state heavy hitters (count-min) and exact-key
                firehose dedup (Bloom), with crash-safe pointer commits
    dedup.py    NEAR-dup stream dedup: the LSH band index of all
                admitted docs is the only cross-batch state — a few
                dozen bytes per doc, independent of text size
"""
