import math

from pyspark.sql import functions as F

from fbs_data_pipelines_spark.functions.cleaning import (
    cast_all_to_string,
    clean_percent,
    decimal_comma_to_double,
    drop_columns_matching,
    empty_to_null_all,
    map_values,
    nan_to_null_all,
    split_unnest,
)


def test_clean_percent(spark):
    df = spark.createDataFrame(
        [(" 950847 %",), ("12.5%",), ("junk",), ("",), (None,)], ["v"]
    )
    got = [r[0] for r in df.select(clean_percent("v")).collect()]
    assert got == [950847.0, 12.5, None, None, None]


def test_decimal_comma(spark):
    df = spark.createDataFrame([("20648000,50",), ("1,5",), ("x",)], ["v"])
    got = [r[0] for r in df.select(decimal_comma_to_double("v")).collect()]
    assert got == [20648000.5, 1.5, None]


def test_empty_to_null_all(spark):
    df = spark.createDataFrame([("", 1), ("a", 2)], ["s", "i"])
    got = empty_to_null_all(df).collect()
    assert got[0]["s"] is None and got[1]["s"] == "a"
    assert got[0]["i"] == 1  # non-string untouched


def test_nan_to_null_all(spark):
    df = spark.createDataFrame([(float("nan"), "x"), (1.5, "y")], ["d", "s"])
    got = [r["d"] for r in nan_to_null_all(df).collect()]
    assert got == [None, 1.5]
    assert not any(v is not None and math.isnan(v) for v in got)


def test_split_unnest_with_defaults(spark):
    df = spark.createDataFrame(
        [("Jefe-GTICS-Ana",), ("Maria Lopez",), ("Sub-GGF",)], ["Destino"]
    )
    cond = F.col("Destino").contains("-")
    out = df.select(
        "Destino",
        *split_unnest(
            "Destino",
            "-",
            ["cargo", "cod", "func"],
            defaults={"cod": F.lit("GAUEGI")},
            condition=cond,
        ),
    ).collect()
    assert (out[0]["cargo"], out[0]["cod"], out[0]["func"]) == ("Jefe", "GTICS", "Ana")
    assert (out[1]["cargo"], out[1]["cod"], out[1]["func"]) == (None, "GAUEGI", None)
    assert (out[2]["cargo"], out[2]["cod"], out[2]["func"]) == ("Sub", "GGF", None)


def test_map_values_default_null(spark):
    df = spark.createDataFrame([("GTICS",), ("NOPE",), (None,)], ["cod"])
    got = [r[0] for r in df.select(map_values("cod", {"GTICS": "Tech"})).collect()]
    assert got == ["Tech", None, None]


def test_drop_columns_matching(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b_duplicated_0", "c"])
    assert drop_columns_matching(df, "duplicated").columns == ["a", "c"]


def test_cast_all_to_string(spark):
    df = spark.createDataFrame([(1, 2.5)], ["a", "b"])
    out = cast_all_to_string(df)
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["string", "string"]


def test_fold_accents(spark):
    from fbs_data_pipelines_spark.functions.cleaning import fold_accents

    df = spark.createDataFrame(
        [("Crédito añejo GÓMEZ ü",), (None,)], ["v"]
    )
    out = [r.f for r in df.select(fold_accents("v").alias("f")).collect()]
    assert out[0] == "Credito anejo GOMEZ u"
    assert out[1] is None
