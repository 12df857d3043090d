"""QUALIFY front-door rewriter (sql_qualify.py): alias scoping,
inline windows in the predicate, trailing ORDER BY/LIMIT placement,
WITH clauses, quote safety, and the DISTINCT refusal."""

from __future__ import annotations

import pytest

from fbs_data_pipelines_spark.sql_qualify import rewrite_qualify, sql_qualify


@pytest.fixture()
def t(spark):
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 30.0), (3, "a", 20.0),
         (4, "b", 5.0), (5, "b", 15.0)],
        "id int, g string, v double",
    ).createOrReplaceTempView("qt")


def test_passthrough_without_qualify(spark, t):
    assert rewrite_qualify("SELECT id FROM qt") is None
    assert sql_qualify(spark, "SELECT count(*) AS n FROM qt").collect()[0][
        "n"
    ] == 5


def test_alias_reference(spark, t):
    out = sql_qualify(
        spark,
        """
        SELECT g, id, v,
               row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
        FROM qt
        QUALIFY rn <= 1
        """,
    ).collect()
    assert {(r["g"], r["id"]) for r in out} == {("a", 2), ("b", 5)}
    assert out[0].asDict().keys() == {"g", "id", "v", "rn"}


def test_inline_window_predicate(spark, t):
    out = sql_qualify(
        spark,
        """
        SELECT g, id FROM qt
        QUALIFY row_number() OVER (PARTITION BY g ORDER BY id) = 1
        """,
    ).collect()
    assert {(r["g"], r["id"]) for r in out} == {("a", 1), ("b", 4)}


def test_trailing_order_by_and_limit_apply_after_filter(spark, t):
    out = sql_qualify(
        spark,
        """
        SELECT id, v,
               rank() OVER (ORDER BY v DESC) AS price_rank
        FROM qt
        QUALIFY price_rank <= 3
        ORDER BY v ASC
        LIMIT 2
        """,
    ).collect()
    # survivors are v in {30, 20, 15}; ORDER BY v ASC LIMIT 2 → 15, 20
    assert [r["v"] for r in out] == [15.0, 20.0]


def test_with_clause_and_group_by(spark, t):
    out = sql_qualify(
        spark,
        """
        WITH big AS (SELECT * FROM qt WHERE v >= 10)
        SELECT g, sum(v) AS total
        FROM big
        GROUP BY g
        QUALIFY row_number() OVER (ORDER BY total DESC) = 1
        """,
    ).collect()
    assert [(r["g"], r["total"]) for r in out] == [("a", 60.0)]


def test_quoted_literal_not_parsed(spark, t):
    # the word QUALIFY inside a string literal must not trigger
    out = sql_qualify(
        spark, "SELECT 'no QUALIFY here' AS s FROM qt LIMIT 1"
    ).collect()
    assert out[0]["s"] == "no QUALIFY here"


def test_distinct_rejected(spark, t):
    with pytest.raises(ValueError, match="DISTINCT"):
        sql_qualify(
            spark,
            "SELECT DISTINCT g FROM qt "
            "QUALIFY row_number() OVER (ORDER BY g) = 1",
        )


def test_alias_substitution_is_word_bounded(spark, t):
    # alias `rn` must not rewrite the column name `rn2` or text
    # inside other identifiers
    out = sql_qualify(
        spark,
        """
        SELECT id,
               row_number() OVER (ORDER BY id) AS rn,
               row_number() OVER (ORDER BY id DESC) AS rn2
        FROM qt
        QUALIFY rn = 1 OR rn2 = 1
        """,
    ).collect()
    assert {r["id"] for r in out} == {1, 5}


def test_star_exclude_and_replace(spark, t):
    from fbs_data_pipelines_spark.sql_qualify import sql_dialect

    out = sql_dialect(
        spark,
        "SELECT * EXCLUDE (g) REPLACE (v * 2 AS v) FROM qt WHERE id <= 2",
    )
    assert out.columns == ["id", "v"]
    assert {(r["id"], r["v"]) for r in out.collect()} == {
        (1, 20.0), (2, 60.0),
    }


def test_star_modifiers_compose_with_qualify(spark, t):
    from fbs_data_pipelines_spark.sql_qualify import sql_dialect

    out = sql_dialect(
        spark,
        """
        SELECT * EXCLUDE (id) REPLACE (v * 10 AS v)
        FROM qt
        QUALIFY row_number() OVER (PARTITION BY g ORDER BY id) = 1
        """,
    ).collect()
    assert {(r["g"], r["v"]) for r in out} == {("a", 100.0), ("b", 50.0)}


def test_star_modifier_errors(spark, t):
    from fbs_data_pipelines_spark.sql_qualify import (
        expand_star_modifiers,
        sql_dialect,
    )

    with pytest.raises(ValueError, match="not in schema"):
        sql_dialect(spark, "SELECT * EXCLUDE (nope) FROM qt")
    with pytest.raises(ValueError, match="GROUP BY"):
        sql_dialect(
            spark,
            "SELECT * EXCLUDE (v) FROM qt GROUP BY id, g",
        )
    # plain statements pass through untouched
    stmt = "SELECT id, v FROM qt"
    assert expand_star_modifiers(spark, stmt) == stmt


def test_star_replace_expr_with_commas_and_parens(spark, t):
    from fbs_data_pipelines_spark.sql_qualify import sql_dialect

    out = sql_dialect(
        spark,
        "SELECT * EXCLUDE (g, id) "
        "REPLACE (least(greatest(v, 10.0), 20.0) AS v) FROM qt",
    ).collect()
    assert sorted(r["v"] for r in out) == [10.0, 10.0, 15.0, 20.0, 20.0]


def test_time_travel_version_as_of(spark, tmp_path):
    from fbs_data_pipelines_spark.sources.versioned import VersionedTable
    from fbs_data_pipelines_spark.sql_qualify import sql_time_travel

    vt = VersionedTable(spark, str(tmp_path / "tt"))
    v1 = vt.commit(spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id int, v double"))
    v2 = vt.commit(spark.createDataFrame(
        [(1, 11.0), (3, 30.0)], "id int, v double"))
    # plain name = latest; VERSION AS OF pins the snapshot
    out = sql_time_travel(
        spark,
        f"""
        SELECT a.id, a.v AS v_old, b.v AS v_new
        FROM tt VERSION AS OF {v1} a JOIN tt b ON a.id = b.id
        """,
        {"tt": vt},
    ).collect()
    assert [(r["id"], r["v_old"], r["v_new"]) for r in out] == [
        (1, 10.0, 11.0)
    ]
    # FOR VERSION AS OF spelling + compose with QUALIFY
    out2 = sql_time_travel(
        spark,
        f"""
        SELECT id, v FROM tt FOR VERSION AS OF {v2}
        QUALIFY row_number() OVER (ORDER BY v DESC) = 1
        """,
        {"tt": vt},
    ).collect()
    assert [(r["id"], r["v"]) for r in out2] == [(3, 30.0)]


def test_time_travel_quoted_literal_untouched(spark, tmp_path):
    from fbs_data_pipelines_spark.sources.versioned import VersionedTable
    from fbs_data_pipelines_spark.sql_qualify import sql_time_travel

    vt = VersionedTable(spark, str(tmp_path / "tt2"))
    vt.commit(spark.createDataFrame([(1,)], "id int"))
    out = sql_time_travel(
        spark,
        "SELECT id, 'tt2 VERSION AS OF 9' AS s FROM tt2",
        {"tt2": vt},
    ).collect()
    assert out[0]["s"] == "tt2 VERSION AS OF 9"
