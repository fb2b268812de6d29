"""Local replica of the driver's DuckDB-oracle comparison.

Runs a suite query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and exact values
after sorting rows (order-insensitive) and columns by name — a stricter
local stand-in for the driver's value hash, so anything that passes
here should hash-match in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb

from covid_19_fl_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL; returns (columns, rows) fetched eagerly."""
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
        rel = con.sql(sql)
        return rel.columns, rel.fetchall()
    finally:
        con.close()


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows_sorted(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    """Assert the Spark result and DuckDB oracle result are identical."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count differs: {len(s_rows)} vs {len(d_rows)}"

    sc, sr = _rows_sorted(s_cols, s_rows)
    dc, dr = _rows_sorted(d_cols, d_rows)
    mismatches = []
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            if float_tol and _close(a, b, float_tol):
                continue
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"value mismatches (spark vs duckdb): {mismatches}"


def _close(a, b, tol):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=tol, abs_tol=tol):
                return False
        elif x != y:
            return False
    return True
