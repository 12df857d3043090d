"""Distributed BPE training/encoding against the classic worked
example and structural invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fbs_data_pipelines_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    word_freq_table,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # the Sennrich paper's toy distribution: low/lower/newest/widest
    rows = []
    for word, n in (("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)):
        rows += [(len(rows) + i, word) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_train_classic_first_merges(spark, corpus):
    wf = word_freq_table(corpus, "text")
    merges = bpe_train(wf, num_merges=4)
    # highest-count pair is (e, s) from newest(6)+widest(3) = 9
    assert (merges[0]["left"], merges[0]["right"]) == ("e", "s")
    assert merges[0]["pair_count"] == 9
    # then (es, t) 9 → then (est, </w>) 9
    assert (merges[1]["left"], merges[1]["right"]) == ("es", "t")
    assert (merges[2]["left"], merges[2]["right"]) == ("est", EOW)
    assert [m["rank"] for m in merges] == [0, 1, 2, 3]


def test_bpe_train_deterministic(spark, corpus):
    wf = word_freq_table(corpus, "text")
    a = bpe_train(wf, num_merges=6)
    b = bpe_train(wf.repartition(7), num_merges=6)  # layout-independent
    assert a == b


def test_bpe_encode_compresses_and_roundtrips(spark, corpus):
    wf = word_freq_table(corpus, "text")
    merges = bpe_train(wf, num_merges=8)
    enc = bpe_encode(corpus.limit(5), "doc_id", "text", merges)
    for r in enc.collect():
        toks = r["bpe_tokens"]
        # concatenating subwords restores word + EOW marker
        joined = "".join(toks).replace(EOW, " ").strip()
        assert joined in {"low", "lower", "newest", "widest"}
        # merges learned on this corpus compress below char count
        assert len(toks) < len(joined) + 1


def test_bpe_greedy_overlap_rule(spark):
    # "aaa": merging (a,a) greedily left-to-right → ["aa", "a", EOW]
    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    wf = word_freq_table(docs, "text")
    merges = bpe_train(wf, num_merges=1, min_pair_count=1)
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    enc = bpe_encode(docs, "doc_id", "text", merges).collect()[0]
    assert enc["bpe_tokens"] == ["aa", "a", EOW, "aa", "a", EOW]


def test_bpe_min_pair_count_stops_early(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    wf = word_freq_table(docs, "text")
    merges = bpe_train(wf, num_merges=10, min_pair_count=2)
    assert merges == []  # every pair occurs once


def test_merge_expr_matches_python_reference_bulk(spark):
    """The greedy left-to-right merge fold vs a Python reference over
    200 random symbol arrays — one Spark job for the whole batch."""
    import random

    from pyspark.sql import functions as F

    from fbs_data_pipelines_spark.operators.bpe import _merge_expr

    def ref_merge(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    rng = random.Random(7)
    alphabet = ["a", "b", "ab", "c"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        "i long, syms array<string>",
    )
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", _merge_expr(F.col("syms"), "a", "b").alias("m")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == ref_merge(c, "a", "b"), (i, c)


def test_bpe_train_stops_when_vocabulary_collapses(spark):
    """Every word reduced to ONE symbol before num_merges runs out:
    the empty pair table yields an all-null aggregate row — training
    must stop, not crash (review finding)."""
    docs = spark.createDataFrame(
        [(i, "ab ab ab") for i in range(3)], "doc_id long, text string"
    )
    wf = word_freq_table(docs, "text")
    merges = bpe_train(wf, num_merges=10, min_pair_count=1)
    # 'ab' collapses in 2 merges: (a,b) then (ab,</w>)
    assert [m["merged"] for m in merges] == ["ab", "ab" + EOW]
