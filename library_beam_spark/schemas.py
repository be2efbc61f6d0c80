"""Fixed StructTypes — the engine's declared data model (SURVEY §1.2).

Transcribed from the reference's authoritative BQ_SCHEMA
(/root/reference/main.py:35-68) plus the shapes the parse/NLP code builds
(main.py:235-428, NLP.py:691-700, BioentityTagger.py:287-307). No schema
inference in production paths (SURVEY §1: "fixed StructTypes in one
schemas.py module").
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --- span annotation (MatchedTag, BioentityTagger.py:287-307) -------------
TAG = StructType(
    [
        _f("match", StringType()),
        _f("start", IntegerType()),
        _f("end", IntegerType()),
        _f("category", StringType()),
        _f("reference_db", StringType()),
        _f("reference", ArrayType(StringType())),
        _f("original_value", StringType()),
        _f("label", StringType()),
        _f("sentence", IntegerType()),
    ]
)

RANGE = StructType([_f("start", IntegerType()), _f("end", IntegerType())])

# --- SVO concept (NLP.py:1095-1112 + relation enrichment main.py:596-633) -
CONCEPT = StructType(
    [
        _f("subject", StringType()),
        _f("subject_range", RANGE),
        _f("verb", StringType()),
        _f("verb_path", ArrayType(StringType())),
        _f("object", StringType()),
        _f("object_range", RANGE),
        _f("negated", BooleanType()),
        _f("sentence_text", StringType()),
        _f("sentence", IntegerType()),
        _f("subject_tags", ArrayType(TAG)),
        _f("object_tags", ArrayType(TAG)),
        _f(
            "relations",
            StructType(
                [
                    _f("directed", ArrayType(StringType())),
                    _f("undirected", ArrayType(StringType())),
                ]
            ),
        ),
    ]
)

ABBREVIATION = StructType([_f("short", StringType()), _f("long", StringType())])

# --- text_mined_entities.nlp (DocumentAnalysisSpacy result, NLP.py:691-700)
NLP_RESULT = StructType(
    [
        _f("chunks", ArrayType(StringType())),
        _f("recurring_chunks", ArrayType(StringType())),
        _f("top_chunks", ArrayType(StringType())),
        _f("abbreviations", ArrayType(ABBREVIATION)),
        _f("concepts", ArrayType(CONCEPT)),
        _f("tagged_entities", ArrayType(TAG)),
        _f("tagged_entities_grouped", MapType(StringType(), ArrayType(TAG))),
        _f("tagged_text", StringType()),
        _f(
            "embedding_text",
            StructType(
                [
                    _f("plain", StringType()),
                    _f("pos_tag", StringType()),
                    _f("ent_tag", StringType()),
                ]
            ),
        ),
    ]
)

# --- text_mined_entities.noun_phrases (NounChuncker.digest, NLP.py:342-345)
NOUN_PHRASES_RESULT = StructType(
    [
        _f("chunks", ArrayType(StringType())),
        _f("recurring_chunks", ArrayType(StringType())),
        _f("top_chunks", ArrayType(StringType())),
        _f("abbreviations", ArrayType(ABBREVIATION)),
    ]
)

TEXT_MINED_ENTITIES = StructType(
    [_f("nlp", NLP_RESULT), _f("noun_phrases", NOUN_PHRASES_RESULT)]
)

# --- publication record (BQ_SCHEMA main.py:35-68 + parse main.py:235-428) -
AUTHOR = StructType(
    [
        _f("LastName", StringType()),
        _f("ForeName", StringType()),
        _f("Initials", StringType()),
        _f("CollectiveName", StringType()),
        _f("Suffix", StringType()),
        _f("Identifier", StringType()),
        _f("affiliation", StringType()),
        _f("short_name", StringType()),
        _f("full_name", StringType()),
    ]
)

JOURNAL = StructType(
    [_f("title", StringType()), _f("medlineAbbreviation", StringType())]
)

JOURNAL_REFERENCE = StructType(
    [_f("volume", StringType()), _f("issue", StringType()), _f("pgn", StringType())]
)

MESH_HEADING = StructType([_f("id", StringType()), _f("label", StringType())])

CHEMICAL = StructType(
    [
        _f("name", StringType()),
        _f("name_id", StringType()),
        _f("registryNumber", StringType()),
    ]
)

# Pre-NLP parsed citation (parse stage output; also the dedup input —
# FIXTURES.md A1 shape).
RAW_CITATION = StructType(
    [
        _f("pub_id", StringType(), nullable=False),
        _f("filename", StringType(), nullable=False),
        _f("is_deleted", BooleanType(), nullable=False),
        _f("title", StringType()),
        _f("abstract", StringType()),
        _f("pub_date", DateType()),
        _f("first_publication_date", DateType()),
        _f("doi", StringType()),
        _f("journal", JOURNAL),
        _f("journal_reference", JOURNAL_REFERENCE),
        _f("authors", ArrayType(AUTHOR)),
        _f("keywords", ArrayType(StringType())),
        _f("pub_type", ArrayType(StringType())),
        _f("mesh_headings", ArrayType(MESH_HEADING)),
        _f("chemicals", ArrayType(CHEMICAL)),
    ]
)

# Enriched publication = raw + text_mined_entities + the declared-but-empty
# parity columns (main.py:315-322).
PUBLICATION = StructType(
    RAW_CITATION.fields
    + [
        _f("text_mined_entities", TEXT_MINED_ENTITIES),
        _f("full_text", StringType()),
        _f("full_text_url", ArrayType(StringType())),
        _f("cited_by", StringType()),
        _f("references", ArrayType(StringType())),
        _f("is_open_access", BooleanType()),
        _f("has_references", BooleanType()),
        _f("data_release", StringType()),
    ]
)

# --- the four split outputs (load2es.py:23-50 index_config) ---------------
BIOENTITY_DOC = StructType(
    [_f("pub_id", StringType()), _f("entities", ArrayType(TAG))]
)

TAGGEDTEXT_DOC = StructType(
    [
        _f("pub_id", StringType()),
        _f("title", StringType()),
        _f("abstract", StringType()),
    ]
)

CONCEPT_DOC = StructType(
    [
        _f("pub_id", StringType()),
        _f("date", DateType()),
        _f("abbreviations", ArrayType(ABBREVIATION)),
    ]
    + [f for f in CONCEPT.fields]
)
