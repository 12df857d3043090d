"""lit_array: parsed-SQL literal arrays ≡ F.lit, bit-for-bit.

The r18 optimization round replaced element-wise F.lit(list) builds
(one py4j round trip per element on classic PySpark — ~270 ms per
32×8 codebook of pure driver time) with one parsed SQL expression.
These pins guarantee the swap can never drift a value, a dtype, or a
null-handling edge.
"""

import struct

import pyspark.sql.functions as F
import pytest

from fbs_data_pipelines_spark.functions.vectors import lit_array


def _bits(x):
    return struct.pack("<d", x)


@pytest.mark.parametrize(
    "values",
    [
        [0.1, -2.5e-17, 3.141592653589793, 1e308, -0.0],
        [[0.1, 0.2], [0.30000000000000004, -4.9e-324]],
        [[[1.5, 2.5]], [[-3.5, 0.0]]],
        [float("nan"), float("inf"), float("-inf"), 1.0],
    ],
)
def test_lit_array_doubles_bit_identical_to_f_lit(spark, values):
    df = spark.range(1).select(
        F.lit(values).alias("a"), lit_array(values).alias("b")
    )
    assert df.dtypes[0][1] == df.dtypes[1][1]
    r = df.collect()[0]

    def flat(v):
        if isinstance(v, list):
            for x in v:
                yield from flat(x)
        else:
            yield v

    for x, y in zip(flat(r["a"]), flat(r["b"])):
        assert _bits(x) == _bits(y), (x, y)


def test_lit_array_int_inference_matches_f_lit(spark):
    small = [1, 2, 3]
    big = [1, 2**40]
    df = spark.range(1).select(
        F.lit(small).alias("a"),
        lit_array(small).alias("b"),
        F.lit(big).alias("c"),
        lit_array(big).alias("d"),
    )
    d = dict(df.dtypes)
    assert d["a"] == d["b"] == "array<int>"
    assert d["c"] == d["d"] == "array<bigint>"
    r = df.collect()[0]
    assert r["a"] == r["b"] and r["c"] == r["d"]


def test_lit_array_empty_falls_back_to_f_lit(spark):
    df = spark.range(1).select(lit_array([]).alias("a"))
    assert df.collect()[0]["a"] == []


def test_lit_array_rejects_bool(spark):
    with pytest.raises(TypeError):
        lit_array([True, False])
