"""As-of join semantics tests (operators/asof.py) — brute-force checked."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from covid_19_fl_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00:00")),
         (2, "u1", _ts("2024-01-01T12:00:00")),
         (3, "u2", _ts("2024-01-01T09:00:00")),
         (4, "u3", _ts("2024-01-01T09:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T10:00:00"), 100.0),   # equal ts → matches (<=)
         ("u1", _ts("2024-01-01T11:00:00"), 200.0),
         ("u2", _ts("2024-01-01T09:30:00"), 300.0)],  # after left → no match
        "user_id string, ts timestamp, val double",
    )
    got = {
        r.event_id: r.val
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    assert got == {1: 100.0, 2: 200.0, 3: None, 4: None}


def test_asof_matches_bruteforce(spark):
    rnd = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, f"u{rnd.randrange(5)}", base + dt.timedelta(minutes=rnd.randrange(10_000)))
        for i in range(300)
    ]
    rrows_raw = {
        (f"u{rnd.randrange(5)}", base + dt.timedelta(minutes=rnd.randrange(10_000)))
        for _ in range(200)
    }
    rrows = [(u, t, float(i)) for i, (u, t) in enumerate(sorted(rrows_raw))]
    left = spark.createDataFrame(lrows, "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(rrows, "user_id string, ts timestamp, val double")

    got = {
        r.event_id: r.val
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }

    def brute(u, t):
        cands = [(rt, v) for ru, rt, v in rrows if ru == u and rt <= t]
        return max(cands)[1] if cands else None

    assert len(got) == 300
    for eid, u, t in lrows:
        assert got[eid] == brute(u, t), (eid, u, t)


def test_asof_plan_single_shuffle_no_rangejoin(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00:00"))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T09:00:00"), 1.0)], "user_id string, ts timestamp, val double"
    )
    plan = (
        asof_join(left, right, on="ts", by="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # The whole point: a window over a union — never a join (no
    # BroadcastNestedLoop/range-join candidate explosion at scale).
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_directions_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),  # b: 09:00, f: 10:30 → nearest f
            (2, "u1", _ts("2024-01-01T09:01:00")),  # b: 09:00, f: 10:30 → nearest b
            (3, "u1", _ts("2024-01-01T08:00:00")),  # b: none,  f: 09:00
            (4, "u2", _ts("2024-01-01T12:00:00")),  # no right rows at all
            (5, "u1", _ts("2024-01-01T10:30:00")),  # exact hit both directions
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:00:00"), 9.0),
            ("u1", _ts("2024-01-01T10:30:00"), 10.5),
        ],
        "user_id string, ts timestamp, val double",
    )

    def run(**kw):
        return {
            r.event_id: r.val
            for r in asof_join(left, right, on="ts", by="user_id", **kw).collect()
        }

    assert run() == {1: 9.0, 2: 9.0, 3: None, 4: None, 5: 10.5}
    assert run(direction="forward") == {1: 10.5, 2: 10.5, 3: 9.0, 4: None, 5: 10.5}
    assert run(direction="nearest") == {1: 10.5, 2: 9.0, 3: 9.0, 4: None, 5: 10.5}
    # 30-minute tolerance: row 1 backward match (60 min away) nulls out,
    # forward match (30 min) survives the boundary exactly.
    assert run(tolerance_sec=1800) == {1: None, 2: 9.0, 3: None, 4: None, 5: 10.5}
    assert run(direction="forward", tolerance_sec=1800) == {
        1: 10.5, 2: None, 3: None, 4: None, 5: 10.5,
    }
    assert run(direction="nearest", tolerance_sec=1800) == {
        1: 10.5, 2: 9.0, 3: None, 4: None, 5: 10.5,
    }


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:00:00"), 9.0),
            ("u1", _ts("2024-01-01T11:00:00"), 11.0),
        ],
        "user_id string, ts timestamp, val double",
    )
    got = asof_join(left, right, on="ts", by="user_id", direction="nearest").collect()
    assert got[0].val == 9.0
