"""Pure-Python NLP kernels — no Spark imports.

These implement the reference's text-analysis semantics (SURVEY §2.8)
as deterministic, unit-golden-tested functions. The Spark layer wraps
them in Arrow-batched ``mapInPandas`` stages (library_beam_spark.nlp_ops)
with executor-local lazy initialization — the Spark idiom for Beam's
``start_bundle`` (main.py:459-470).

Everything here is a re-implementation from observed behavior, not a
port: the reference's spaCy/NLTK/TextBlob model stack is unavailable in
this environment, so the dependency-parse SVO extractor and the
POS-based noun chunker are re-expressed as documented heuristics behind
the same output contracts (shape + golden sentences). Modules:

    normalize.py      T1 AbstractNormalizer (greek→latin, spaces, ascii)
    abbreviations.py  T2 Schwartz–Hearst abbreviation pairs
    tagger.py         T3-T8 Aho-Corasick dictionary tagger + span ops
    sentences.py      T9/T10 sentence segmentation + tokenizer
    chunker.py        T13 noun-phrase statistics
    svo.py            T11 subject-verb-object concept extraction
    stopwords.py      T16 stopword corpora (compact engine copies)
"""
