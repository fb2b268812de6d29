"""Scale-regression gate: compare per-ROW query cost between the
sf0.1 bench and the 10× synthetic corpus (tools/scale_up.py).

A healthy distributed plan keeps per-row cost roughly flat as data
grows 10×; a single-reducer sort, a driver-side materialization, or
quadratic candidate generation makes it climb. The gate flags any
query whose 10× per-row cost exceeds ``--factor`` (default 2.0) times
its sf0.1 per-row cost — VERDICT r3 item 9's acceptance bar — while
ignoring sub-100ms queries whose timings are all fixed overhead.

Usage:
  python tools/scale_regression.py BENCH_small.json BENCH_big.json \
         [--rows-ratio 10] [--factor 2.0] [--floor-sec 0.1]
Exit code 1 if any query regresses.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--rows-ratio", type=float, default=10.0)
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument("--floor-sec", type=float, default=0.1)
    ap.add_argument(
        "--expect-quadratic",
        nargs="*",
        default=[],
        help="queries whose ANSWER grows superlinearly on the "
        "key-remapped replica corpus — reported, not failed. The "
        "replica corpus duplicates every document ~10x, so exact "
        "similarity self-joins (dd_edit_distance_join, "
        "dd_jaccard_prefix_join) emit ~950x the pairs for 10x the "
        "rows (measured; every replica matches every replica): "
        "per-INPUT-row cost is the wrong metric there — their "
        "per-OUTPUT-row cost falls. ml_knn_accuracy (the round-4 "
        "entry) no longer needs this: it evaluates a fixed-size "
        "md5-ranked probe sample and sits under the standard gate",
    )
    args = ap.parse_args()

    small = json.load(open(args.small))["queries"]
    big = json.load(open(args.big))["queries"]
    rows = []
    bad = []
    for name in sorted(set(small) & set(big)):
        t_s, t_b = small[name], big[name]
        # per-row cost ratio: big/(small*ratio); 1.0 = perfect linear
        ratio = t_b / (t_s * args.rows_ratio) if t_s > 0 else float("inf")
        flagged = (
            t_b > args.floor_sec * args.rows_ratio
            and t_s > args.floor_sec / 2
            and ratio > args.factor
        )
        if flagged and name in args.expect_quadratic:
            rows.append((name, t_s, t_b, ratio, "expected-quadratic"))
            continue
        rows.append((name, t_s, t_b, ratio, flagged))
        if flagged:
            bad.append(name)

    rows.sort(key=lambda r: -r[3])
    print(f"{'query':34} {'sf0.1 s':>9} {'10x s':>9} {'perrow x':>9}  flag")
    for name, t_s, t_b, ratio, flagged in rows:
        mark = (
            flagged
            if isinstance(flagged, str)
            else ("REGRESSED" if flagged else "")
        )
        print(f"{name:34} {t_s:9.3f} {t_b:9.3f} {ratio:9.2f}  {mark}")
    missing = sorted(set(small) ^ set(big))
    if missing:
        print(f"only in one bench: {missing}")
    if bad:
        print(f"\nREGRESSED ({len(bad)}): {bad}")
        sys.exit(1)
    print(f"\nOK: no query exceeds {args.factor}x per-row cost at "
          f"{args.rows_ratio:g}x rows")


if __name__ == "__main__":
    main()
