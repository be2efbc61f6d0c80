"""Split stage (reference main.py:789-812, P6-P9): one enriched stream →
four denormalized outputs, single pass.

Spark has no multi-sink single-action batch primitive (SURVEY §4), so the
engine pattern is: persist the enriched frame once, derive the four
projections lazily, let the caller trigger the writes; every derivation
is pure column algebra (explode / dropFields / transform) — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel


def _und(c: Column) -> Column:
    return F.regexp_replace(c, " ", "_")


def _self_concept_tag(text: Column, rng: Column) -> Column:
    """P6 (main.py:598-623): inject a self-CONCEPT tag for the subject /
    object span so every concept is guaranteed at least one reference on
    each side of the relation."""
    return F.struct(
        text.alias("match"),
        rng["start"].alias("start"),
        rng["end"].alias("end"),
        F.lit("CONCEPT").alias("category"),
        F.lit("CONCEPT").alias("reference_db"),
        F.array(_und(text)).alias("reference"),
        text.alias("original_value"),
        text.alias("label"),
        F.lit(0).alias("sentence"),
    )


def _tag_refs(tags: Column) -> Column:
    """First reference id per tag (label as fallback), underscored."""
    return F.transform(
        tags, lambda t: _und(F.coalesce(F.get(t["reference"], 0), t["label"]))
    )


def extract_concepts(enriched: DataFrame) -> DataFrame:
    """P6: one row per concept; relations.directed = s_ref|o_ref over the
    cross product of subject × object tag references; undirected = both
    orders (main.py:624-633). Carries pub_id, date, abbreviations."""
    c = F.col("concept")
    exploded = enriched.select(
        "pub_id",
        F.col("pub_date").alias("date"),
        F.col("text_mined_entities.nlp.abbreviations").alias("abbreviations"),
        F.explode("text_mined_entities.nlp.concepts").alias("concept"),
    )
    subject_tags = F.concat(
        c["subject_tags"], F.array(_self_concept_tag(c["subject"], c["subject_range"]))
    )
    object_tags = F.concat(
        c["object_tags"], F.array(_self_concept_tag(c["object"], c["object_range"]))
    )
    s_refs, o_refs = _tag_refs(subject_tags), _tag_refs(object_tags)
    directed = F.flatten(
        F.transform(
            s_refs,
            lambda s: F.transform(o_refs, lambda o: F.concat_ws("|", s, o)),
        )
    )
    undirected = F.flatten(
        F.transform(
            s_refs,
            lambda s: F.flatten(
                F.transform(
                    o_refs,
                    lambda o: F.array(
                        F.concat_ws("|", s, o), F.concat_ws("|", o, s)
                    ),
                )
            ),
        )
    )
    return exploded.select(
        "pub_id",
        "date",
        "abbreviations",
        c["subject"].alias("subject"),
        c["subject_range"].alias("subject_range"),
        c["verb"].alias("verb"),
        c["verb_path"].alias("verb_path"),
        c["object"].alias("object"),
        c["object_range"].alias("object_range"),
        c["negated"].alias("negated"),
        c["sentence_text"].alias("sentence_text"),
        c["sentence"].alias("sentence"),
        subject_tags.alias("subject_tags"),
        object_tags.alias("object_tags"),
        F.struct(
            F.array_distinct(directed).alias("directed"),
            F.array_distinct(undirected).alias("undirected"),
        ).alias("relations"),
    )


def extract_bioentities(enriched: DataFrame) -> DataFrame:
    """P7 (main.py:648-661)."""
    return enriched.select(
        "pub_id", F.col("text_mined_entities.nlp.tagged_entities").alias("entities")
    )


def extract_taggedtext(enriched: DataFrame) -> DataFrame:
    """P8 (main.py:664-688): tagged_text.partition('. ') → title/abstract."""
    parts = F.split(F.col("text_mined_entities.nlp.tagged_text"), r"\. ", 2)
    return enriched.select(
        "pub_id",
        F.element_at(parts, 1).alias("title"),
        F.when(F.size(parts) > 1, F.element_at(parts, 2)).otherwise(F.lit("")).alias(
            "abstract"
        ),
    )


def clean_publication(enriched: DataFrame) -> DataFrame:
    """P9 (main.py:691-716): drop the heavy nested fields from the
    publication ('small') output via dropFields — Catalyst prunes the
    columns at the scan when this is the only consumer."""
    return enriched.withColumn(
        "text_mined_entities",
        F.col("text_mined_entities").withField(
            "nlp",
            F.col("text_mined_entities.nlp").dropFields(
                "tagged_text", "tagged_entities", "concepts", "embedding_text"
            ),
        ),
    )


def run_split(enriched: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
    """The four outputs off ONE materialization of the enriched frame
    (single-pass multi-sink: S7)."""
    if persist:
        enriched = enriched.persist(StorageLevel.MEMORY_AND_DISK)
    return {
        "concepts": extract_concepts(enriched),
        "bioentities": extract_bioentities(enriched),
        "taggedtext": extract_taggedtext(enriched),
        "publication": clean_publication(enriched),
    }
