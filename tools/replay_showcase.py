"""Replay a driver showcase prefix in ONE session to hunt session-state bugs.

Round 9's driver attestation recorded the repo's first red row since
round 1: ``x_modularity`` hash-mismatched (rows 90/90, schema ok) inside
the 50-query ``local[32]`` showcase session, 29 minutes after the full
sweep hash-matched the same query — while 4 isolated reruns were green.
That signature (green alone, red in a long session) means some query in
the showcase prefix mutates session state that changes a later query's
VALUES — leaked conf, cache-manager plan collision, or checkpoint/cache
eviction.

This tool replays the exact showcase order from a CORRECTNESS_r{N}.json
artifact in one session and, after each query, re-runs a probe query
(default ``x_modularity``) against its DuckDB oracle. The first query
after which the probe flips red is the polluter.

Usage:
    python tools/replay_showcase.py CORRECTNESS_r09.json            # probe after each
    python tools/replay_showcase.py CORRECTNESS_r09.json --no-probe # plain replay
    python tools/replay_showcase.py CORRECTNESS_r09.json --probe x_modularity \
        --master 'local[32]' --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def probe_check(qs, oracles, name, spark, sf_dir):
    """Run probe query vs oracle; return (ok, n_diff, sample_diffs)."""
    from oracle import _rows_sorted, run_oracle

    df = qs[name](spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    d_cols, d_rows = run_oracle(oracles[name], sf_dir)
    if len(s_rows) != len(d_rows) or sorted(s_cols) != sorted(d_cols):
        return False, -1, [("shape", len(s_rows), len(d_rows))]
    _, sr = _rows_sorted(s_cols, s_rows)
    _, dr = _rows_sorted(d_cols, d_rows)
    diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    return not diffs, len(diffs), diffs[:5]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--probe", default="x_modularity")
    ap.add_argument("--no-probe", action="store_true")
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--stop-at", default="", help="stop after this query")
    args = ap.parse_args()

    with open(os.path.join(REPO, args.artifact)) as f:
        order = [k for k in json.load(f) if not k.startswith("_")]

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(args.master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    qs, oracles = entry.queries(), entry.oracle_sql()

    if not args.no_probe:
        ok, n, diffs = probe_check(qs, oracles, args.probe, spark, args.sf)
        print(f"[baseline] probe {args.probe}: {'GREEN' if ok else 'RED'} "
              f"(diffs={n}) {diffs}", flush=True)

    for i, name in enumerate(order, 1):
        if name not in qs:
            print(f"[{i:2d}/{len(order)}] {name}: GONE from registry, skip",
                  flush=True)
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            nrows = len(df.collect())
            status = f"rows={nrows}"
        except Exception as e:  # noqa: BLE001 - replay must continue
            status = f"ERROR {type(e).__name__}: {e}"[:200]
        dt = time.time() - t0
        line = f"[{i:2d}/{len(order)}] {name}: {status} ({dt:.1f}s)"
        if not args.no_probe and name != args.probe:
            ok, n, diffs = probe_check(qs, oracles, args.probe, spark, args.sf)
            line += f" | probe {'GREEN' if ok else 'RED'}"
            if not ok:
                line += f" diffs={n} sample={diffs}"
        print(line, flush=True)
        if not args.no_probe and name != args.probe and not ok:
            print(f"POLLUTER FOUND: probe flipped red after {name}", flush=True)
            break
        if args.stop_at and name == args.stop_at:
            break

    if args.no_probe:
        ok, n, diffs = probe_check(qs, oracles, args.probe, spark, args.sf)
        print(f"[final] probe {args.probe}: {'GREEN' if ok else 'RED'} "
              f"(diffs={n}) {diffs}", flush=True)


if __name__ == "__main__":
    main()
