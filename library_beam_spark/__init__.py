"""library_beam_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``opentargets-archive/library-beam``.

The reference (read-only at /root/reference) is an Apache Beam (Python 2)
batch ETL + NLP pipeline over MEDLINE XML. This package re-expresses every
capability Spark-first:

- relational spine (scans, filters, joins, aggs, windows, set ops) as plain
  DataFrame / Spark SQL so Catalyst owns pushdown/pruning/join selection;
- the NLP kernels (normalize, Schwartz–Hearst abbreviations, dictionary
  tagging, SVO concepts, noun chunking) as pure-Python modules wrapped in
  Arrow-batched ``mapInPandas`` stages with broadcast dictionaries;
- the baseline+updates ingest contract as both a batch window dedup and a
  Structured Streaming stateful upsert;
- plus the LLM-training-data operators (exact/minhash/simhash dedup,
  similarity search, text quality, multimodal column plumbing) the
  reference never had but a 100 TB pipeline needs.

Layout:
    session.py    SparkSession factory tuned for the scale profile
    schemas.py    fixed StructTypes (publication/tag/concept shapes, §1.2)
    io.py         sources & sinks (MEDLINE XML assembler, JSON, Parquet)
    operators/    dedup, relational, co-occurrence, similarity, multimodal
    functions/    column-level text & date functions (no UDF where avoidable)
    kernels/      pure-Python NLP kernels (no Spark imports; unit-golden-tested)
    nlp_ops.py    mapInPandas wrappers: kernels -> text_mined_entities struct
    pipelines/    enrich / split / load assemblies (main.py:757-812 parity)
    streaming/    Structured Streaming updates feed + window ops
    registry.py   the driver-facing queries()/oracle_sql() registry
"""

__version__ = "0.1.0"
