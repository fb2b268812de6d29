"""Binned interval-overlap join (operators/rangejoin.py) — exactness
vs a brute-force inequality join, plus the boundary cases the bin
rewrite can get wrong (bin-straddling spans, boundary-touching
intervals, duplicate emission)."""

from __future__ import annotations

import datetime as dt
import random

from covid_19_fl_spark.operators.rangejoin import interval_overlap_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, prefix):
    return spark.createDataFrame(
        rows, f"{prefix}_id long, {prefix}_start timestamp, {prefix}_end timestamp"
    )


def _pairs(df):
    return sorted((r.a_id, r.b_id) for r in df.collect())


def test_overlap_edges_and_exactly_once(spark):
    a = _mk(
        spark,
        [
            # spans 3 hour-bins: must still pair exactly once
            (1, _ts("2024-01-01T09:30:00"), _ts("2024-01-01T12:30:00")),
            # touches b20's start boundary exactly: half-open → NO match
            (2, _ts("2024-01-01T08:00:00"), _ts("2024-01-01T09:00:00")),
            # fully inside one bin
            (3, _ts("2024-01-01T10:10:00"), _ts("2024-01-01T10:20:00")),
        ],
        "a",
    )
    b = _mk(
        spark,
        [
            (10, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T14:00:00")),
            (20, _ts("2024-01-01T09:00:00"), _ts("2024-01-01T10:00:00")),
        ],
        "b",
    )
    got = _pairs(
        interval_overlap_join(a, b, "a_start", "a_end", "b_start", "b_end", 3600)
    )
    # a1 overlaps both (once each, despite sharing several bins with
    # each); a2 ends exactly where b20 starts → excluded; a3 ⊂ b10.
    assert got == [(1, 10), (1, 20), (3, 10)]


def test_matches_bruteforce_random(spark):
    rnd = random.Random(42)
    base = dt.datetime(2024, 1, 1)

    def rand_iv(i):
        s = base + dt.timedelta(minutes=rnd.randrange(0, 5000))
        e = s + dt.timedelta(minutes=rnd.randrange(1, 400))
        return (i, s, e)

    arows = [rand_iv(i) for i in range(120)]
    brows = [rand_iv(i) for i in range(80)]
    a, b = _mk(spark, arows, "a"), _mk(spark, brows, "b")

    got = _pairs(
        interval_overlap_join(a, b, "a_start", "a_end", "b_start", "b_end", 3600)
    )
    want = sorted(
        (ai, bi)
        for ai, as_, ae in arows
        for bi, bs, be in brows
        if as_ < be and bs < ae
    )
    assert got == want  # sorted lists: any dup or miss fails


def test_extra_key_narrows_join(spark):
    a = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00")),
         (2, "u2", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "a_id long, k string, a_start timestamp, a_end timestamp",
    )
    b = spark.createDataFrame(
        [(10, "u1", _ts("2024-01-01T10:30:00"), _ts("2024-01-01T12:00:00"))],
        "b_id long, k string, b_start timestamp, b_end timestamp",
    )
    out = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end", 3600, extra_key="k"
    )
    assert [(r.a_id, r.b_id) for r in out.collect()] == [(1, 10)]
