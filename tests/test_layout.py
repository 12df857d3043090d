"""Z-order layout: multi-dimensional clustering and data skipping."""

import pyspark.sql.functions as F

from fbs_data_pipelines_spark.sources.layout import zorder_key, zorder_write


def _files_hit(spark, path, cond):
    """Number of files containing at least one row matching ``cond`` —
    the data-skipping potential a min/max pruning layer exploits."""
    return (
        spark.read.parquet(path)
        .filter(cond)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def test_zorder_clusters_every_dimension(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    # ~10% selectivity band per dimension, derived from the data so the
    # test holds at any SF
    (ok_lo, ok_hi), (pk_lo, pk_hi) = (
        li.approxQuantile(["l_orderkey", "l_partkey"], [0.45, 0.55], 0.01)
    )
    ok_cond = f"l_orderkey between {ok_lo} and {ok_hi}"
    pk_cond = f"l_partkey between {pk_lo} and {pk_hi}"

    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "z")
    # baseline: classic single-dimension range layout on the leading key
    li.repartitionByRange(16, "l_orderkey").write.parquet(linear)
    zorder_write(li, ["l_orderkey", "l_partkey"], zpath, n_files=16)

    # the non-leading dimension is where z-order pays: a linear layout
    # scatters l_partkey over every file
    z_pk, lin_pk = _files_hit(spark, zpath, pk_cond), _files_hit(
        spark, linear, pk_cond
    )
    assert z_pk < lin_pk, (z_pk, lin_pk)
    # the leading dimension still prunes (worse than the perfectly
    # sorted baseline, but far from a full scan)
    assert _files_hit(spark, zpath, ok_cond) < 16
    # layout never changes data
    a = sorted(map(tuple, spark.read.parquet(zpath).collect()))
    b = sorted(map(tuple, li.collect()))
    assert a == b


def test_zorder_key_is_jvm_only_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0)], "a int, b double"
    )
    out = df.withColumn("z", zorder_key(df, ["a", "b"], bits=4))
    rows = {r.a: r.z for r in out.collect()}
    assert all(v is not None for v in rows.values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_key_on_date_column(spark):
    """DATE columns must z-order (r17 advisor high item: the rank
    expression cast DATE→DOUBLE directly, which Spark rejects at plan
    time, while the quantile cuts went through datediff — any date
    column threw AnalysisException). Both sides now share _value_sql,
    so the units agree and dates cluster like any numeric."""
    import datetime as dt

    rows = [
        (i, dt.date(2020, 1, 1) + dt.timedelta(days=i * 3), float(i % 7))
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "id int, d date, v double")
    out = df.withColumn("z", zorder_key(df, ["d", "v"], bits=4))
    got = out.orderBy("id").collect()
    assert all(r.z is not None for r in got)
    # equi-depth on a monotone date: z-key must order WITH the date on
    # the date-major bits — adjacent-in-date rows land in nearby
    # buckets, so Spearman-style monotonicity holds bucket-wise
    by_date = [r.z for r in sorted(got, key=lambda r: r.d)]
    # date bucket rank occupies interleaved bits; coarse check: the
    # first-date quartile's max date-bucket is below the last
    # quartile's min (needs only that ranks increase with the date)
    import statistics

    q1 = by_date[:16]
    q4 = by_date[-16:]
    assert statistics.mean(q1) < statistics.mean(q4)
