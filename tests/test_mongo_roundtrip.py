"""Mongo boundary without a Mongo server: the Extended-JSON WRITE path
must round-trip the reference's own golden export bit-exactly at the
value level, full-refresh (K2) and keyed-merge (K4) semantics are
asserted against golden state (cv-api.py:184-207 delete_many +
insert_many ≡ state replace; cv.py:108-118 under-investigation
refresh), and the pushdown translator reproduces the reference's
hand-written find/aggregate shapes."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from covid_19_fl_spark.sources import mongo
from covid_19_fl_spark.sources.mongo_json import (
    parse_cases_export,
    read_cases_export,
    to_extended_json,
)

GOLDEN = "/root/reference/datasets/json/032720201716.json"


def _canon(rows):
    out = []
    for r in sorted(rows, key=lambda r: r.case_number):
        d = r.asDict(recursive=True)
        out.append(d)
    return out


def test_extended_json_roundtrip_identity(spark):
    golden = read_cases_export(spark, GOLDEN)
    back = parse_cases_export(to_extended_json(golden))
    assert back.schema == golden.schema
    assert _canon(back.collect()) == _canon(golden.collect())


def _unwrap(v):
    """Python-side Extended-JSON unwrapper (independent of the engine's
    regex chain) for structural comparison."""
    if isinstance(v, dict):
        if set(v) == {"$numberInt"} or set(v) == {"$numberLong"}:
            return int(next(iter(v.values())))
        if set(v) == {"$numberDouble"}:
            return float(next(iter(v.values())))
        if set(v) == {"$oid"}:
            return v["$oid"]
        if set(v) == {"$date"}:
            return _unwrap(v["$date"])
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unwrap(x) for x in v]
    return v


def test_written_lines_match_golden_grammar(spark):
    """The written line for a golden case parses (with an independent
    Python unwrapper) to the same document as the reference's own
    export line — same fields, same wrapper grammar, same values."""
    golden_line = next(
        ln
        for ln in open(GOLDEN)
        if '"case_number":{"$numberInt":"404"}' in ln
    )
    expect = _unwrap(json.loads(golden_line))
    df = read_cases_export(spark, GOLDEN).filter(F.col("case_number") == 404)
    written = to_extended_json(df).first().value
    got = _unwrap(json.loads(written))
    assert got == expect


def test_full_refresh_replaces_state(spark, tmp_path):
    """K2: overwrite-write of the new snapshot leaves EXACTLY the new
    snapshot readable — delete_many({}) + insert_many semantics."""
    golden = read_cases_export(spark, GOLDEN)
    out = str(tmp_path / "florida")
    # "previous" collection state: only the first 100 cases
    to_extended_json(golden.limit(100)).write.mode("overwrite").text(out)
    # full refresh with the complete snapshot
    to_extended_json(golden).write.mode("overwrite").text(out)
    back = read_cases_export(spark, out)
    assert back.count() == golden.count()
    assert _canon(back.collect()) == _canon(golden.collect())


def test_keyed_merge_refresh_under_investigation(spark, tmp_path):
    """K4 over the golden: the reference re-pulls cases whose travel is
    'Under Investigation' and replaces them keyed by case_number
    (cv.py:108-118). Simulate the refresh engine-side: updated rows
    win on key, everything else is untouched."""
    golden = read_cases_export(spark, GOLDEN).cache()
    # this golden snapshot carries no 'Under Investigation' rows; the
    # 'Unknown' cohort plays the refresh set — semantics identical
    # (keyed replace by case_number).
    inv = golden.filter(F.col("travel") == "Unknown")
    n_inv = inv.count()
    assert n_inv > 0
    updates = inv.withColumn("travel", F.lit("No"))
    merged = (
        golden.join(
            updates.select(F.col("case_number").alias("u_key")),
            golden.case_number == F.col("u_key"),
            "left_anti",
        ).unionByName(updates)
    )
    out = str(tmp_path / "florida_merged")
    to_extended_json(merged).write.mode("overwrite").text(out)
    back = read_cases_export(spark, out).cache()
    assert back.count() == golden.count()
    assert back.filter(F.col("travel") == "Unknown").count() == 0
    # untouched rows survive value-identical
    untouched = golden.filter(F.col("travel") != "Unknown")
    back_untouched = back.join(
        updates.select(F.col("case_number").alias("u_key")),
        back.case_number == F.col("u_key"),
        "left_anti",
    )
    assert _canon(back_untouched.collect()) == _canon(untouched.collect())


def test_pushdown_find_shapes_match_reference():
    # cv.py:113 — find({"travel": "Under Investigation"}, {"case_number": 1})
    assert mongo.find_to_pipeline(
        [("travel", "=", "Under Investigation")], ["case_number"]
    ) == [
        {"$match": {"travel": "Under Investigation"}},
        {"$project": {"case_number": 1}},
    ]
    # cv-stats.py:38-51 — find({"date_added": {"$lt": today}})
    assert mongo.find_to_pipeline([("date_added", "<", "2020-03-28")]) == [
        {"$match": {"date_added": {"$lt": "2020-03-28"}}}
    ]
    # range predicate (S7): implicit AND on one field
    assert mongo.filters_to_mongo(
        [("age", ">=", 18), ("age", "<", 65)]
    ) == {"age": {"$gte": 18, "$lt": 65}}
    # membership
    assert mongo.filters_to_mongo([("county", "in", ["Dade", "Duval"])]) == {
        "county": {"$in": ["Dade", "Duval"]}
    }


def test_pushdown_group_max_matches_reference():
    # cv.py:93-100 — the max-watermark aggregate
    assert mongo.group_max_pipeline("case_number") == [
        {"$group": {"_id": None, "max_case_number": {"$max": "$case_number"}}}
    ]


def test_pushdown_mixed_eq_and_operator_on_one_column():
    # ADVICE r4: '=' combined with another op on the same column must
    # compose as an explicit $eq, in either arrival order.
    assert mongo.filters_to_mongo(
        [("age", ">=", 18), ("age", "=", 30)]
    ) == {"age": {"$gte": 18, "$eq": 30}}
    assert mongo.filters_to_mongo(
        [("age", "=", 30), ("age", ">=", 18)]
    ) == {"age": {"$eq": 30, "$gte": 18}}
    # bare reference form preserved when '=' stands alone
    assert mongo.filters_to_mongo([("age", "=", 30)]) == {"age": 30}
    # duplicate operator on one column falls back to explicit $and
    assert mongo.filters_to_mongo(
        [("age", "=", 1), ("age", "=", 2)]
    ) == {"$and": [{"age": {"$eq": 1}}, {"age": {"$eq": 2}}]}
