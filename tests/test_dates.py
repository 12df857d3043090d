import datetime as dt

from fbs_data_pipelines_spark.functions.dates import (
    conditional_datediff,
    datediff_days,
    format_dates_for_export,
    parse_flexible_date,
    parse_timestamp,
)


def test_parse_flexible_date_variants(spark):
    rows = [
        ("01/02/2020",),
        ("01-02-2020",),
        ("01.02.2020",),
        (" 01/02/2020 10:30",),
        ("31/12/1999",),
        ("notadate",),
        ("",),
        (None,),
    ]
    df = spark.createDataFrame(rows, ["v"])
    got = [r[0] for r in df.select(parse_flexible_date("v")).collect()]
    feb = dt.date(2020, 2, 1)
    assert got == [feb, feb, feb, feb, dt.date(1999, 12, 31), None, None, None]


def test_parse_timestamp(spark):
    df = spark.createDataFrame([("15/06/2023 14:30",), ("junk",)], ["v"])
    got = [r[0] for r in df.select(parse_timestamp("v")).collect()]
    assert got == [dt.datetime(2023, 6, 15, 14, 30), None]


def test_datediffs(spark):
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 10), dt.date(2020, 1, 1), None),
         (None, dt.date(2020, 1, 1), None)],
        "end date, start date, giro date",
    )
    out = df.select(
        datediff_days("end", "start").alias("d"),
        conditional_datediff("giro", "end", "start").alias("w"),
    ).collect()
    assert out[0]["d"] == 9 and out[0]["w"] == 9
    assert out[1]["d"] is None and out[1]["w"] is None


def test_conditional_datediff_not_null_gives_null(spark):
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 5), dt.date(2020, 1, 10), dt.date(2020, 1, 1))],
        "giro date, end date, start date",
    )
    out = df.select(conditional_datediff("giro", "end", "start").alias("w")).collect()
    assert out[0]["w"] is None


def test_format_dates_for_export(spark):
    df = spark.createDataFrame(
        [(dt.date(2020, 2, 1), dt.datetime(2020, 2, 1, 10, 30, 0))],
        "d date, ts timestamp",
    )
    out = format_dates_for_export(df).collect()[0]
    assert out["d"] == "2020-02-01"
    assert out["ts"] == "2020-02-01 10:30:00"
