"""CUSUM changepoint query (registry q:cusum_changepoint semantics,
checked on a planted level shift)."""

from datetime import date, timedelta


def _series(spark, counts, etype="a"):
    # one event per unit of count on consecutive days
    rows = []
    d0 = date(2024, 1, 1)
    for i, c in enumerate(counts):
        day = d0 + timedelta(days=i)
        for j in range(c):
            rows.append((etype, day.isoformat() + " 12:00:00", j))
    df = spark.createDataFrame(rows, "event_type string, ts string, k long")
    from pyspark.sql import functions as F

    return df.select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )


def _cusum_top(spark, df):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    daily = df.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    wd = Window.partitionBy("event_type").orderBy("day")
    wa = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type", "day",
        F.row_number().over(wd).alias("d"),
        F.sum("x").over(wd).alias("prefix"),
        F.sum("x").over(wa).alias("total"),
        F.count(F.lit(1)).over(wa).alias("n"),
    )
    score = F.abs(F.col("n") * F.col("prefix") - F.col("d") * F.col("total"))
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(score.desc(), F.col("day"))
    )
    return (
        idx.withColumn("score", score).withColumn("rn", rn)
        .filter("rn = 1")
        .select("event_type", "day", "score")
        .collect()
    )


def test_level_shift_found_at_boundary(spark):
    # 5 days at rate 2, then 5 days at rate 8: max |CUSUM| lands on the
    # last low day (cumulative deficit peaks just before the shift)
    counts = [2] * 5 + [8] * 5
    [row] = _cusum_top(spark, _series(spark, counts))
    assert row["day"] == date(2024, 1, 5)
    # exact score: n=10, total=50; at d=5 prefix=10 -> |10*10-5*50|=150
    assert row["score"] == 150


def test_flat_series_scores_zero_first_day(spark):
    counts = [3] * 6
    [row] = _cusum_top(spark, _series(spark, counts))
    assert row["score"] == 0
    assert row["day"] == date(2024, 1, 1)  # tie-break: earliest day
