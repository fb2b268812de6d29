"""Local replica of the driver's correctness gate at its real scale.

Runs every suite query against its DuckDB oracle at sf0.01 (the scale
CORRECTNESS_r{N}.json is computed at) using tests/oracle.compare, and
prints a one-line PASS/FAIL per query plus a summary. Run from repo
root:

    python tools/gate_check.py [sf_dir] [name_prefix ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_19_fl_spark import suite  # noqa: E402
from covid_19_fl_spark.session import get_spark  # noqa: E402
from tests.oracle import compare  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])
    spark = get_spark("gate-check")  # honors $SPARK_GRAFT_CPUS like every entry point
    names = [n for n in suite.ORACLES if not prefixes or n.startswith(prefixes)]
    failed = []
    for name in names:
        t0 = time.time()
        try:
            compare(suite.QUERIES[name](spark, sf_dir), suite.ORACLES[name], sf_dir)
            print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            msg = str(e).splitlines()
            print(f"FAIL {name}: {msg[0] if msg else type(e).__name__}", flush=True)
            traceback.print_exc(limit=3)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed; failed={failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
