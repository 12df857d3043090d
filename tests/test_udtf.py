"""Spark-4 Python UDTF surface — split_sentences lateral TVF."""

from fbs_data_pipelines_spark.functions.udtf_text import (
    SplitSentences,
    register_text_udtfs,
)


def _lateral(spark, rows):
    register_text_udtfs(spark)
    spark.createDataFrame(rows, "id int, text string") \
        .createOrReplaceTempView("__udtf_t")
    return sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT t.id, s.idx, s.sentence, s.n_tokens "
            "FROM __udtf_t t, LATERAL split_sentences(t.text) s"
        ).collect()
    )


def test_udtf_splits_trims_counts(spark):
    got = _lateral(spark, [(1, "Hello there. Big   world. ")])
    assert got == [(1, 1, "Hello there", 2), (1, 2, "Big   world", 2)]


def test_udtf_null_text_yields_nothing(spark):
    assert _lateral(spark, [(1, None), (2, "One only")]) == [
        (2, 1, "One only", 2)
    ]


def test_udtf_idx_preserves_positional_gaps(spark):
    # '. . tail' -> split gives ['', '', 'tail'] -> only idx 3 survives
    got = _lateral(spark, [(1, ". . tail")])
    assert got == [(1, 3, "tail", 1)]


def test_udtf_eval_is_pure_python(spark):
    rows = list(SplitSentences.func().eval("a b. c"))
    assert rows == [(1, "a b", 2), (2, "c", 1)]
