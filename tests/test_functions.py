"""Column-function unit tests (the fns not already pinned by oracle
queries): ascii_fold pandas UDF, multi-format date parsing, normalize."""

from pyspark.sql import functions as F


def test_ascii_fold_pandas_udf(spark):
    from library_beam_spark.functions.text import ascii_fold

    df = spark.createDataFrame(
        [("naïve café",), ("São Tomé",), (None,)], "s string"
    )
    got = [r[0] for r in df.select(ascii_fold(F.col("s"))).collect()]
    assert got == ["naive cafe", "Sao Tome", None]


def test_normalize_abstract_column(spark):
    from library_beam_spark.functions.text import normalize_abstract

    df = spark.createDataFrame([("TNF-α  rises",)], "s string")
    assert df.select(normalize_abstract(F.col("s"))).first()[0] == "TNF-alpha rises"
    assert (
        df.select(normalize_abstract(F.col("s"), fold_ascii=True)).first()[0]
        == "TNF-alpha rises"
    )


def test_parse_multi_format_dates(spark):
    from library_beam_spark.functions.dates import parse_multi_format

    df = spark.createDataFrame(
        [("2020-05-17 10:30:00",), ("2020-05-17T10:30:00",), ("2020-05-17",),
         ("garbage",)],
        "s string",
    )
    got = [r[0] for r in df.select(parse_multi_format(F.col("s"))).collect()]
    assert str(got[0]) == "2020-05-17 10:30:00"
    assert str(got[1]) == "2020-05-17 10:30:00"
    assert str(got[2]) == "2020-05-17 00:00:00"
    assert got[3] is None


def test_uri_tail(spark):
    from library_beam_spark.functions.text import uri_tail

    df = spark.createDataFrame(
        [("http://identifiers.org/ensembl/ENSG00000120907",)], "s string"
    )
    assert df.select(uri_tail(F.col("s"))).first()[0] == "ENSG00000120907"


def test_bpe_tokens_contractions_and_runs(spark):
    from library_beam_spark.functions.text import bpe_tokens
    from pyspark.sql import functions as F

    got = (
        spark.createDataFrame([("don't stop, it's 2024-ready!!",)], "t STRING")
        .select(bpe_tokens(F.col("t")).alias("o"))
        .first()
        .o
    )
    assert got == ["don", "'t", "stop", ",", "it", "'s", "2024", "-", "ready", "!!"]


def test_bpe_token_count_tracks_words(spark):
    from library_beam_spark.functions.text import count_bpe_tokens
    from pyspark.sql import functions as F

    n = (
        spark.createDataFrame([("plain words with no punctuation here",)], "t STRING")
        .select(count_bpe_tokens(F.col("t")).alias("n"))
        .first()
        .n
    )
    assert n == 6
