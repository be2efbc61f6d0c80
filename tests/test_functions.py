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


# --- Z-order layout keys --------------------------------------------------


def test_zorder_interleaves_bits(spark):
    from library_beam_spark.functions.layout import zorder_key

    df = spark.createDataFrame(
        [(0b11, 0b00), (0b00, 0b11), (0b11, 0b11), (5, 3)], "x long, y long"
    )
    out = [r.z for r in df.select(zorder_key(F.col("x"), F.col("y"), 4).alias("z")).collect()]
    # x bits at even positions, y bits at odd
    assert out[0] == 0b0101
    assert out[1] == 0b1010
    assert out[2] == 0b1111
    # x=0b101, y=0b011 -> z = x0(1)@0 y0(1)@1 x1(0)@2 y1(1)@3 x2(1)@4 y2(0)@5
    assert out[3] == (1 << 0) | (1 << 1) | (0 << 2) | (1 << 3) | (1 << 4)


def test_zorder_sql_twin_matches(spark):
    import duckdb

    from library_beam_spark.functions.layout import sql_zorder_key, zorder_key

    rows = [(x, y) for x in range(0, 300, 7) for y in range(0, 300, 11)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(
        (r.x, r.y, r.z)
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y"), 9).alias("z")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        con.execute(f"SELECT x, y, {sql_zorder_key('x', 'y', 9)} FROM t").fetchall()
    )
    assert got == want


def test_zorder_locality_beats_single_column_sort(spark):
    from library_beam_spark.functions.layout import zorder_key

    # 32x32 grid split into 16 equal "files" by z-key order vs by x order:
    # the z layout must give a strictly smaller total y-span across files.
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = df.select("x", "y", zorder_key(F.col("x"), F.col("y"), 5).alias("k"))
    xs = df.select("x", "y", (F.col("x") * 32 + F.col("y")).alias("k"))

    def total_y_span(d):
        binned = d.select((F.ntile(16).over(__import__("pyspark").sql.Window.orderBy("k"))).alias("f"), "y")
        spans = binned.groupBy("f").agg((F.max("y") - F.min("y")).alias("s")).collect()
        return sum(r.s for r in spans)

    assert total_y_span(z) < total_y_span(xs)


def test_zorder_bits_bounds(spark):
    import pytest as _pytest

    from library_beam_spark.functions.layout import zorder_key

    with _pytest.raises(ValueError):
        zorder_key(F.lit(1), F.lit(1), 0)
    with _pytest.raises(ValueError):
        zorder_key(F.lit(1), F.lit(1), 32)
