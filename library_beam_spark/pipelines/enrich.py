"""Enrichment pipeline (reference main.py:757-787).

read baseline ∪ updates → parse XML → latest-version dedup (tombstones
win-and-drop) → NLP enrichment → enriched output.

Plan shape & scale notes:
- baseline and updates are one unioned scan (U1) — no separate jobs;
- the ONLY shuffle before the NLP stage is the pub_id dedup, executed as
  a max_by partial aggregation (one candidate row per key per map task;
  the reference's GroupByKey shuffled every version — SURVEY §4);
- dedup runs BEFORE the NLP stage, so deleted/stale versions never pay
  the expensive kernel (the reference enriches after grouping too);
- NLP is mapInPandas with a broadcast vocabulary; no further shuffles —
  enrich output is written straight from the same stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_medline_xml
from ..nlp_ops import get_text_to_analyze, nlp_enrich
from ..operators.dedup import latest_version


def parse_and_dedup(
    spark: SparkSession,
    baseline_glob: str,
    updates_glob: str | None = None,
) -> DataFrame:
    """Parse + latest-version-wins dedup + tombstone filter.

    Version order = (filename, ingest id): lexicographic filename order
    IS MEDLINE's version order (updatefiles sort after baseline —
    main.py:585), and the per-file ingest id makes ties deterministic
    (SURVEY §4 watch-list: the reference tie-breaks arbitrarily).
    """
    parsed = read_medline_xml(spark, baseline_glob)
    if updates_glob:
        parsed = parsed.unionByName(read_medline_xml(spark, updates_glob))
    with_id = parsed.withColumn("_ingest_id", F.monotonically_increasing_id())
    deduped = latest_version(
        with_id,
        key_cols=["pub_id"],
        version_cols=["filename", "_ingest_id"],
        tombstone_col="is_deleted",
    ).drop("_ingest_id")
    return deduped


def run_enrich(
    spark: SparkSession,
    baseline_glob: str,
    updates_glob: str | None = None,
    vocab: dict[str, list[dict]] | None = None,
) -> DataFrame:
    """Full enrichment: the output carries every RAW_CITATION column plus
    ``text_mined_entities`` (PUBLICATION shape minus the declared-empty
    parity columns, which the split stage adds as nulls)."""
    deduped = parse_and_dedup(spark, baseline_glob, updates_glob)
    with_text = deduped.withColumn(
        "text_to_analyze", get_text_to_analyze("title", "abstract")
    )
    enriched = nlp_enrich(with_text, text_col="text_to_analyze", vocab=vocab)
    return enriched.drop("text_to_analyze")
