"""Gap-filling semantics (operators/timeseries.py): dense grid
bounds, LOCF carry rules, linear interpolation arithmetic, leading/
trailing-gap fallbacks — on a hand-built series where every expected
value is computable by eye."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from fbs_data_pipelines_spark.operators.timeseries import gapfill


def _series(spark):
    # group g: observations at hours 0, 1, 4 (gaps at 2, 3);
    # group h: single observation (degenerate grid)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("g", base, 10.0),
        ("g", base + dt.timedelta(hours=1), 20.0),
        ("g", base + dt.timedelta(hours=1, minutes=30), 40.0),  # same bucket
        ("g", base + dt.timedelta(hours=4), 50.0),
        ("h", base + dt.timedelta(hours=2), 7.0),
    ]
    return spark.createDataFrame(rows, "g string, ts timestamp, value double")


def test_gapfill_grid_locf_and_lerp(spark):
    out = {
        (r["g"], r["bucket"].hour): r
        for r in gapfill(_series(spark), ["g"], "ts", "value", 3600).collect()
    }
    # dense grid: g spans hours 0..4 inclusive (5 rows), h has 1 row
    assert len(out) == 6
    g = {h: out[("g", h)] for h in range(5)}
    # bucket aggregate: hour 1 averages the two in-bucket rows
    assert [g[h]["value"] for h in range(5)] == [10.0, 30.0, None, None, 50.0]
    assert [g[h]["is_gap"] for h in range(5)] == [
        False, False, True, True, False,
    ]
    # LOCF carries 30 across the gap
    assert [g[h]["value_locf"] for h in range(5)] == [
        10.0, 30.0, 30.0, 30.0, 50.0,
    ]
    # lerp: between (h1, 30) and (h4, 50): h2 -> 30+20*(1/3), h3 -> +2/3
    assert g[2]["value_lerp"] == 36.666667
    assert g[3]["value_lerp"] == 43.333333
    # observed buckets interpolate to themselves
    assert g[0]["value_lerp"] == 10.0 and g[4]["value_lerp"] == 50.0
    # degenerate single-observation group: no gaps, fills = value
    h2 = out[("h", 2)]
    assert (h2["value"], h2["value_locf"], h2["value_lerp"]) == (
        7.0, 7.0, 7.0,
    )


def test_gapfill_leading_gap_falls_back(spark):
    # force a leading gap by grouping two series that share a grid? A
    # single group's grid starts at its OWN min bucket, so a leading
    # null can only appear via lerp's one-sided fallback — assert the
    # one-sided rules directly: before the first observation there is
    # nothing to carry (locf null => lerp falls back to next_v).
    rows = [
        ("g", dt.datetime(2024, 1, 1, 0, 30), None),
        ("g", dt.datetime(2024, 1, 1, 2, 30), 8.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = sorted(
        gapfill(df, ["g"], "ts", "value", 3600).collect(),
        key=lambda r: r["bucket"],
    )
    # hour 0 bucket aggregates only a NULL -> avg null -> a gap row
    assert [r["value"] for r in out] == [None, None, 8.0]
    # locf has nothing to carry at hours 0-1; lerp falls back to the
    # next observation (TimescaleDB's interpolate boundary behavior)
    assert [r["value_locf"] for r in out] == [None, None, 8.0]
    assert [r["value_lerp"] for r in out] == [8.0, 8.0, 8.0]


def test_gapfill_explicit_range_extends_grid(spark):
    # time_bucket_gapfill(start, finish): bounds beyond the observed
    # span densify LEADING and TRAILING gaps
    out = sorted(
        gapfill(
            _series(spark),
            ["g"],
            "ts",
            "value",
            3600,
            start=dt.datetime(2023, 12, 31, 23, 0),
            end=dt.datetime(2024, 1, 1, 5, 0),
        ).collect(),
        key=lambda r: (r["g"], r["bucket"]),
    )
    g = [r for r in out if r["g"] == "g"]
    h = [r for r in out if r["g"] == "h"]
    # g: 23:00 .. 05:00 inclusive = 7 buckets (was 5 observed)
    assert [r["bucket"].hour for r in g] == [23, 0, 1, 2, 3, 4, 5]
    # leading bucket: nothing to carry, lerp falls forward
    assert (g[0]["value_locf"], g[0]["value_lerp"]) == (None, 10.0)
    # trailing bucket: LOCF carries the last observation
    assert (g[-1]["value_locf"], g[-1]["value_lerp"]) == (50.0, 50.0)
    # h (single obs at hour 2) also gets the full explicit grid
    assert len(h) == 7 and h[3]["value"] == 7.0 and h[0]["value"] is None


def test_gapfill_explicit_range_windows_into_span(spark):
    # bounds INSIDE the observed span window the grid; observations
    # outside are excluded from the fills (LOCF does not reach back)
    out = sorted(
        gapfill(
            _series(spark),
            ["g"],
            "ts",
            "value",
            3600,
            start=dt.datetime(2024, 1, 1, 2, 0),
            end=dt.datetime(2024, 1, 1, 3, 0),
        ).collect(),
        key=lambda r: (r["g"], r["bucket"]),
    )
    g = [r for r in out if r["g"] == "g"]
    assert [r["bucket"].hour for r in g] == [2, 3]
    # hours 0-1 observations are outside the range: nothing to carry
    assert [r["value_locf"] for r in g] == [None, None]
    # h's only observation (hour 2) is in range; with BOTH bounds
    # explicit every group with data gets the same grid
    h = [r for r in out if r["g"] == "h"]
    assert [r["bucket"].hour for r in h] == [2, 3]
    assert h[0]["value"] == 7.0 and h[1]["value_locf"] == 7.0


def test_gapfill_epoch_bounds_snap_to_bucket(spark):
    # integer epoch-second bounds are accepted and snap DOWN to the
    # bucket grid (here: mid-hour start snaps to its hour)
    base_epoch = int(dt.datetime(2024, 1, 1).timestamp())
    out = sorted(
        gapfill(
            _series(spark).filter("g = 'g'"),
            ["g"],
            "ts",
            "value",
            3600,
            start=base_epoch + 3600 + 1800,  # 01:30 -> bucket 01:00
            end=base_epoch + 4 * 3600,
        ).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"].hour for r in out] == [1, 2, 3, 4]
    assert out[0]["value"] == 30.0


def test_gapfill_one_sided_and_degenerate_range(spark):
    df = _series(spark).filter("g = 'g'")
    # end-only bound truncates the tail, keeps observed start
    out = sorted(
        gapfill(df, ["g"], "ts", "value", 3600,
                end=dt.datetime(2024, 1, 1, 1, 0)).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"].hour for r in out] == [0, 1]
    # start beyond every observation with an observed end bound:
    # inverted range (mn > mx) yields no rows rather than an error
    assert (
        gapfill(df, ["g"], "ts", "value", 3600,
                start=dt.datetime(2024, 1, 2)).count() == 0
    )


def test_ohlc_buckets_and_tie_rules(spark):
    from fbs_data_pipelines_spark.operators.timeseries import ohlc

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # hour 0: open=10 (earliest), close=5 (latest), high=30, low=5
        ("g", base + dt.timedelta(minutes=0), 10.0),
        ("g", base + dt.timedelta(minutes=20), 30.0),
        ("g", base + dt.timedelta(minutes=50), 5.0),
        # hour 1: ts TIE at minute 0 — open takes the smaller value,
        # close the larger (both rows share the extreme timestamp)
        ("g", base + dt.timedelta(hours=1), 7.0),
        ("g", base + dt.timedelta(hours=1), 3.0),
        # other group, single row: open=high=low=close
        ("h", base, 42.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = {
        (r["g"], r["bucket"].hour): r
        for r in ohlc(df, ["g"], "ts", "value", 3600).collect()
    }
    g0 = out[("g", 0)]
    assert (g0["open"], g0["high"], g0["low"], g0["close"], g0["n"]) == (
        10.0, 30.0, 5.0, 5.0, 3,
    )
    g1 = out[("g", 1)]
    assert (g1["open"], g1["close"]) == (3.0, 7.0)
    h = out[("h", 0)]
    assert (h["open"], h["high"], h["low"], h["close"], h["n"]) == (
        42.0, 42.0, 42.0, 42.0, 1,
    )


# ---------------------------------------------------------------------------
# ewma
# ---------------------------------------------------------------------------


def _py_ewma(xs, alpha):
    acc = xs[0]
    for x in xs[1:]:
        acc = alpha * x + (1 - alpha) * acc
    return acc


def test_ewma_matches_reference_fold(spark):
    from fbs_data_pipelines_spark.operators.timeseries import ewma

    xs = [10.0, 12.0, 11.0, 15.0, 14.0]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)],
        "grp string, ts long, x double",
    )
    out = {
        r.ts: r.ewma
        for r in ewma(df, ["grp"], "ts", "x", alpha=0.3).collect()
    }
    for t in range(len(xs)):
        assert abs(out[t] - _py_ewma(xs[: t + 1], 0.3)) < 1e-12


def test_ewma_lookback_truncates_frame(spark):
    from fbs_data_pipelines_spark.operators.timeseries import ewma

    xs = [float(v) for v in range(10)]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)],
        "grp string, ts long, x double",
    )
    out = {
        r.ts: r.ewma
        for r in ewma(
            df, ["grp"], "ts", "x", alpha=0.5, lookback=3
        ).collect()
    }
    # row 9 sees only rows 7..9
    assert abs(out[9] - _py_ewma(xs[7:10], 0.5)) < 1e-12


def test_ewma_groups_and_ties(spark):
    from fbs_data_pipelines_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("a", 1, 1, 4.0), ("a", 1, 2, 8.0), ("b", 1, 1, 100.0)],
        "grp string, ts long, tb long, x double",
    )
    out = ewma(
        df, ["grp"], "ts", "x", alpha=0.5, tiebreak_col="tb"
    ).collect()
    got = {(r.grp, r.tb): r.ewma for r in out}
    assert got[("a", 1)] == 4.0
    assert got[("a", 2)] == 6.0  # 0.5*8 + 0.5*4
    assert got[("b", 1)] == 100.0


def test_ewma_alpha_validation(spark):
    import pytest as _pt

    from fbs_data_pipelines_spark.operators.timeseries import ewma

    df = spark.range(1).withColumn("x", F.lit(1.0))
    with _pt.raises(ValueError):
        ewma(df, [], "id", "x", alpha=0.0)
