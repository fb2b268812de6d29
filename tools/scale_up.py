"""Synthetic 10× corpus builder for the scale-regression check.

Replicates every sf0.1 table R times (default 10) with disjoint key
offsets into a parquet corpus under /tmp, preserving referential
integrity (orders.o_custkey follows customer.c_custkey into its
replica, lineitem follows orders/part/supplier, …) and all value
domains. Dimensions with fixed cardinality (region, nation) copy
as-is — exactly how a real 10× of this schema grows.

The point is to surface plan pathologies the sf0.1 bench cannot see:
single-partition sorts over data-sized series, driver-side
materializations, quadratic candidate generation. Pair with
``tools/scale_regression.py``, which compares per-ROW costs between
the two scales (a healthy distributed plan keeps per-row cost flat;
a single-reducer stage makes it climb).

Usage:  python tools/scale_up.py [--src /root/testdata/sf0.1]
                                 [--dst /tmp/covid_19_fl_spark-scale/sf1]
                                 [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from covid_19_fl_spark import tables  # noqa: E402
from covid_19_fl_spark.session import get_spark  # noqa: E402

# table -> columns carrying each key family; every replica shifts the
# whole family by the same step so joins stay consistent.
KEY_FAMILIES: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
}
COPY_AS_IS = ["region", "nation"]


def _steps(spark, src: str) -> dict[str, int]:
    """One step per key family: pow10 above the family's max key, so
    replica keys are disjoint AND visually decodable."""
    probes = {
        "cust": ("customer", "c_custkey"),
        "supp": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "order": ("orders", "o_orderkey"),
        "event": ("events", "event_id"),
        "user": ("events", "user_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }
    out = {}
    for fam, (tbl, col) in probes.items():
        mx = tables.load(spark, src, tbl).agg(F.max(col)).first()[0] or 0
        step = 10
        while step <= mx:
            step *= 10
        out[fam] = step
    return out


def _replicate(df: DataFrame, keys: list[tuple[str, str]], steps, replicas: int) -> DataFrame:
    reps = df.sparkSession.range(replicas).select(F.col("id").alias("__rep"))
    out = df.crossJoin(F.broadcast(reps))
    for col, fam in keys:
        out = out.withColumn(
            col, (F.col(col) + F.col("__rep") * F.lit(steps[fam])).cast("long")
        )
    return out.drop("__rep")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/covid_19_fl_spark-scale/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("covid_19_fl_spark-scale-up")
    steps = _steps(spark, args.src)
    os.makedirs(args.dst, exist_ok=True)
    for tbl in COPY_AS_IS:
        tables.load(spark, args.src, tbl).write.mode("overwrite").parquet(
            os.path.join(args.dst, f"{tbl}.parquet")
        )
        print(f"copied {tbl}")
    for tbl, keys in KEY_FAMILIES.items():
        df = tables.load(spark, args.src, tbl)
        # The broadcast-crossJoin replication preserves the SOURCE's
        # partition count — sf0.1 tables are single files, so a 100×
        # replica written as-is collapses to ONE file/row-group and
        # every downstream scan (and all per-row compute projected into
        # it: shingles, minhash, simhash) runs as ONE task. A corpus
        # meant to exhibit cluster behavior must fan out: 32 output
        # files ≈ one per local core, each with its own row groups.
        _replicate(df, keys, steps, args.replicas).repartition(32).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.dst, f"{tbl}.parquet"))
        print(f"replicated {tbl} x{args.replicas}")
    print(f"done: {args.dst}")


if __name__ == "__main__":
    main()
