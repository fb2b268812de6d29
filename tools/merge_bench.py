"""Merge a partial re-run bench sidecar into a base bench artifact.

Used when a long sweep is resumed after a mid-run failure (e.g. the
round-9 full 100× sweep, where a stream-stream join OOM killed the
SparkContext partway): the re-run covers the missing/errored queries
with SPARK_GRAFT_BENCH_ONLY, then this tool folds its timings into the
base artifact — re-run timings win, errors resolved by the re-run are
dropped, totals recomputed. The merged artifact records both source
runs in a ``merged_from`` block so the provenance is machine-visible.

Usage: python tools/merge_bench.py BASE.json PART2.json [-o OUT.json]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("part")
    ap.add_argument("-o", "--out", default=None, help="default: overwrite BASE")
    args = ap.parse_args()

    base = json.load(open(args.base))
    part = json.load(open(args.part))

    queries = dict(base.get("queries", {}))
    queries.update(part.get("queries", {}))
    # A part-run ERROR on a query the base timed successfully must not
    # be silently masked by the base timing (r9 advice): the part ran
    # later/at the same scale, so its failure is news — surface it.
    for k, v in part.get("errors", {}).items():
        if k in base.get("queries", {}):
            print(
                f"WARNING: {k} errored in the part run but keeps its base "
                f"timing {base['queries'][k]}s — part error: {v[:120]}"
            )
    errors = {
        k: v
        for k, v in {**base.get("errors", {}), **part.get("errors", {})}.items()
        if k not in queries
    }
    # Machine-readable scale-guard exemptions (bench.py "exempt" block):
    # merged the same way; a timing anywhere wins over an exemption.
    exempt = {
        k: v
        for k, v in {**base.get("exempt", {}), **part.get("exempt", {})}.items()
        if k not in queries
    }
    out = dict(base)
    out["queries"] = queries
    out["value"] = round(sum(queries.values()), 4)
    out["n_queries"] = len(queries)
    if errors:
        out["errors"] = errors
    else:
        out.pop("errors", None)
    if exempt:
        out["exempt"] = exempt
    else:
        out.pop("exempt", None)
    # Derived round-over-round comparison blocks were computed against
    # the BASE run's query map — after a merge they'd describe a map
    # that no longer exists. Drop them; tools/scale_regression.py (or a
    # fresh bench pass) recomputes them from the merged queries (r9
    # advice: stale-derived-blocks fix).
    for stale in ("regressions", "slowest10_vs_prior", "machine_factor_vs_prior"):
        out.pop(stale, None)
    out["merged_from"] = {
        "base": {"n_queries": len(base.get("queries", {})),
                 "n_errors": len(base.get("errors", {}))},
        "part": {"n_queries": len(part.get("queries", {})),
                 "n_errors": len(part.get("errors", {}))},
    }
    dest = args.out or args.base
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        f"{dest}: {out['n_queries']} queries, {len(errors)} errors, "
        f"{len(exempt)} exempt, total {out['value']}s"
    )


if __name__ == "__main__":
    main()
