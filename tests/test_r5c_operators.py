"""Property tests for the round-5 batch-C operators (k-core, linear
interpolation, calibration bins, lift/gains, watermarked left-outer
stream-stream join, sliding-window streaming counts), beyond the
DuckDB oracle equality the driver gate enforces."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import suite
from covid_19_fl_spark.operators.graph import kcore

from .conftest import SF_SMOKE


def test_kcore_peels_and_degrees_are_internal(spark):
    # a 5-clique survives k=3 peeling; a chain hanging off it peels
    # away completely, round by round (chain length forces >1 round)
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(
        clique + chain, "id_a long, id_b long"
    ).repartition(3)
    out = {r.id: r.core_degree for r in kcore(df, 3, max_rounds=6).collect()}
    assert out == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_kcore_raises_instead_of_partial(spark):
    # a long chain peels one leaf-pair per round under k=2? no — a
    # chain has internal degree 2, so k=3 kills it in one round; use
    # max_rounds=0 to force the budget failure path deterministically
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    import pytest

    with pytest.raises(RuntimeError, match="no fixpoint"):
        kcore(df, 3, max_rounds=0)


def test_kcore_suite_query_nonempty_and_consistent(spark):
    from covid_19_fl_spark.suite_r5c import _KCORE_K

    out = suite.QUERIES["x_kcore"](spark, SF_SMOKE)
    rows = out.collect()
    assert rows, "k-core empty at smoke SF — parameters degenerate"
    assert all(r.core_degree >= _KCORE_K for r in rows)
    # handshake: sum of core degrees is even (each edge counted twice)
    assert sum(r.core_degree for r in rows) % 2 == 0


def test_linear_interpolation_fills_every_day(spark):
    out = suite.QUERIES["x_linear_interpolation"](spark, SF_SMOKE).collect()
    days = sorted(r.day_idx for r in out)
    # contiguous spine, no missing values anywhere
    assert days == list(range(days[0], days[-1] + 1))
    assert all(r.value_filled is not None for r in out)
    by_day = {r.day_idx: r for r in out}
    # interpolated days are exactly the in-range days % 3 == 0 (the
    # deterministic thinning) — and their value sits between the
    # neighboring observed values
    for r in out:
        assert r.interpolated == (r.day_idx % 3 == 0)
        if r.interpolated:
            prev_d = next(
                (d for d in range(r.day_idx - 1, days[0] - 1, -1)
                 if not by_day[d].interpolated),
                None,
            )
            next_d = next(
                (d for d in range(r.day_idx + 1, days[-1] + 1)
                 if not by_day[d].interpolated),
                None,
            )
            if prev_d is not None and next_d is not None:
                lo = min(by_day[prev_d].value_filled,
                         by_day[next_d].value_filled)
                hi = max(by_day[prev_d].value_filled,
                         by_day[next_d].value_filled)
                assert lo - 1e-6 <= r.value_filled <= hi + 1e-6


def test_calibration_bins_partition_the_corpus(spark):
    out = suite.QUERIES["ml_calibration_bins"](spark, SF_SMOKE).collect()
    n_events = (
        suite.QUERIES["ml_calibration_bins"]
        .__globals__["_t"](spark, SF_SMOKE, "events")
        .count()
    )
    assert sum(r.n for r in out) == n_events
    assert all(0 <= r.bin <= 9 for r in out)
    for r in out:
        assert 0.0 <= r.empirical_rate <= 1.0
        assert r.bin / 10 - 1e-9 <= r.mean_predicted <= (r.bin + 1) / 10
        assert abs(
            abs(r.mean_predicted - r.empirical_rate) - r.abs_gap
        ) < 2e-6
    # the +300 click shift makes high bins purer in positives: bins
    # >= 7 (score >= 700 requires the click shift) are all-positive
    assert all(r.empirical_rate == 1.0 for r in out if r.bin >= 7)


def test_lift_gains_shape(spark):
    out = sorted(
        suite.QUERIES["ml_lift_gains"](spark, SF_SMOKE).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in out] == list(range(1, 11))
    # cumulative gain is monotone and ends at 1
    gains = [r.cum_gain for r in out]
    assert all(a <= b + 1e-9 for a, b in zip(gains, gains[1:]))
    assert abs(gains[-1] - 1.0) < 1e-9
    # lift averages to ~1 weighted by n
    n = sum(r.n for r in out)
    assert abs(sum(r.lift * r.n for r in out) / n - 1.0) < 0.01
    # cum_pos consistency
    run = 0
    for r in out:
        run += r.n_pos
        assert r.cum_pos == run


def test_left_outer_wm_join_matches_inner_plus_frontier(spark):
    rows = {
        r.returnflag: r
        for r in suite.QUERIES["st_stream_left_outer_wm"](
            spark, SF_SMOKE
        ).collect()
    }
    assert "UNMATCHED" in rows
    un = rows.pop("UNMATCHED")
    assert un.revenue is None and un.n_rows > 0
    # the inner part equals the watermarked inner join's aggregate
    inner = {
        r.l_returnflag: r
        for r in suite.QUERIES["st_stream_stream_join_wm"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(rows) == set(inner)
    for k, r in rows.items():
        assert r.n_rows == inner[k].n_items
        assert abs(r.revenue - inner[k].revenue) < 1e-6


def test_sliding_windows_cover_each_day_twice(spark):
    slide = {
        r.win_start: r
        for r in suite.QUERIES["st_sliding_counts_wm"](
            spark, SF_SMOKE
        ).collect()
    }
    assert slide, "no finalized sliding windows at smoke SF"
    # every 2-day window equals the sum of its two member days from
    # the tumbling append-mode twin (where both windows finalized)
    tumb = {
        r.event_date: r
        for r in suite.QUERIES["st_windowed_counts_append_wm"](
            spark, SF_SMOKE
        ).collect()
    }
    import datetime

    for ws, r in slide.items():
        d0 = ws.date()
        d1 = d0 + datetime.timedelta(days=1)
        if d0 in tumb and d1 in tumb:
            assert r.n_events == tumb[d0].n_events + tumb[d1].n_events
            assert (
                abs(
                    r.total_value
                    - (tumb[d0].total_value + tumb[d1].total_value)
                )
                < 1e-6
            )
