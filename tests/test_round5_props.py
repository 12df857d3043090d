"""Randomized brute-force equivalence for the round-5 continuation
operators: each distributed implementation is compared against a
straightforward Python reference on hypothesis-generated inputs.
Example counts are small (each example runs Spark jobs) but the
generators bias toward the adversarial shapes: duplicate-heavy
corpora, dense graphs, tie-heavy logs."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# triangle_count vs brute force
# ---------------------------------------------------------------------------


@_SET
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0, max_size=30,
    )
)
def test_triangle_count_matches_bruteforce(spark, edges):
    from fbs_data_pipelines_spark.operators.graph import triangle_count

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {v for e in canon for v in e}
    expect = sum(
        1
        for u, v, w in itertools.combinations(sorted(nodes), 3)
        if (u, v) in canon and (u, w) in canon and (v, w) in canon
    )
    if edges:
        df = spark.createDataFrame(list(edges), "src long, dst long")
    else:
        df = spark.createDataFrame([], "src long, dst long")
    r = triangle_count(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (
        len(nodes), len(canon), expect
    )


# ---------------------------------------------------------------------------
# paragraph_dedup vs a Python reference
# ---------------------------------------------------------------------------


def _pd_reference(docs, sep, min_chars):
    seen = set()
    out = {}
    for doc_id in sorted(docs):
        kept, removed = [], 0
        for seg in docs[doc_id].split(sep):
            if len(seg) < min_chars:
                kept.append(seg)
            elif seg not in seen:
                seen.add(seg)
                kept.append(seg)
            else:
                removed += 1
        out[doc_id] = (sep.join(kept), len(kept), removed)
    return out


@_SET
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", ""]),
            min_size=1, max_size=6,
        ),
        min_size=1, max_size=8,
    ),
    min_chars=st.sampled_from([1, 2]),
)
def test_paragraph_dedup_matches_reference(spark, texts, min_chars):
    from fbs_data_pipelines_spark.operators.dedup import paragraph_dedup

    docs = {i: "|".join(segs) for i, segs in enumerate(texts)}
    expect = _pd_reference(docs, "|", min_chars)
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in paragraph_dedup(
            df, "doc_id", "text", sep="|", min_chars=min_chars
        ).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# scd2_build vs a Python reference
# ---------------------------------------------------------------------------


@_SET
@given(
    log=st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),       # key
            st.sampled_from(["a", "b", None]),   # state
        ),
        min_size=1, max_size=12,
    )
)
def test_scd2_matches_reference(spark, log):
    from fbs_data_pipelines_spark.operators.audit import scd2_build

    rows = [(k, s, i, i) for i, (k, s) in enumerate(log)]
    # reference: per key in seq order, collapse unchanged, close at next
    by_key = {}
    for k, s, ts, _ in rows:
        by_key.setdefault(k, []).append((ts, s))
    expect = set()
    for k, seq in by_key.items():
        versions = []
        prev = object()
        for ts, s in seq:
            if s != prev:
                versions.append([s, ts, None])
                prev = s
        for a, b in zip(versions, versions[1:]):
            a[2] = b[1]
        for s, vf, vt in versions:
            expect.add((k, s, vf, vt, vt is None))

    df = spark.createDataFrame(
        rows, "key string, state string, ts long, seq long"
    )
    got = {
        (r.key, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_build(
            df, "key", ["state"], "ts", tiebreak_col="seq"
        ).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# bm25_search vs a Python reference
# ---------------------------------------------------------------------------


@_SET
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["hit", "miss", "pad", "word"]),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=8,
    )
)
def test_bm25_matches_reference(spark, docs):
    import math

    from fbs_data_pipelines_spark.operators.similarity import bm25_search

    terms = ["hit", "word"]
    k1, b = 1.2, 0.75
    n = len(docs)
    dls = [len(d) for d in docs]
    avgdl = sum(dls) / float(n)
    expect = {}
    for t in terms:
        df_t = sum(1 for d in docs if t in d)
        if df_t == 0:
            continue
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        for i, d in enumerate(docs):
            tf = d.count(t)
            if tf == 0:
                continue
            denom = tf + k1 * (1.0 - b + b * dls[i] / avgdl)
            expect[i] = expect.get(i, 0.0) + idf * tf * (k1 + 1.0) / denom

    sdf = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bm25
           for r in bm25_search(sdf, "doc_id", "text", terms).collect()}
    assert set(got) == set(expect)
    for i, s in expect.items():
        assert abs(got[i] - s) < 1e-9, (i, got[i], s)


# ---------------------------------------------------------------------------
# sliding_topk vs a Python reference
# ---------------------------------------------------------------------------


@_SET
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 6),                  # hour offset
            st.sampled_from(["x", "y", "z"]),   # key
        ),
        min_size=1, max_size=20,
    )
)
def test_sliding_topk_matches_reference(spark, events):
    import datetime as dt

    from fbs_data_pipelines_spark.operators.events import sliding_topk

    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [(base + dt.timedelta(hours=h), key) for h, key in events]
    # reference: 2h windows sliding 1h, epoch-aligned
    from collections import Counter, defaultdict

    per_window = defaultdict(Counter)
    for ts, key in rows:
        hb = int(ts.timestamp()) // 3600
        for w in (hb, hb - 1):
            per_window[w * 3600][key] += 1
    expect = set()
    for ws, counts in per_window.items():
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (key, nn) in enumerate(ranked[:2], start=1):
            expect.add((ws, key, nn, rank))

    df = spark.createDataFrame(rows, "ts timestamp, k string")
    got = {
        (int(r.window_start.timestamp()), r.k, r.n, r.rank)
        for r in sliding_topk(df, "ts", "k", "2 hours", "1 hour",
                              k=2).collect()
    }
    assert got == expect
