"""Pandas UDF surface (Arrow-batched): scalar and grouped-agg demos.

Completes SURVEY §2.12's UDF inventory with the two pandas-UDF shapes
the engine had only referenced: a SCALAR pandas UDF (Arrow batch in →
Arrow batch out; the 10-100× faster path over row-at-a-time Python
UDFs) and a GROUPED_AGG pandas UDF (a custom aggregate the built-in
agg set lacks). Both are deliberately the flexibility path — every
hot-path computation in this engine stays in JVM Column expressions —
and both keep the cross-engine determinism contract: inner reductions
are SEQUENTIAL left folds (plain Python ``sum`` over a sorted/ordered
list), bit-identical to a DuckDB ``list_reduce``, never numpy pairwise
summation whose grouping an oracle can't reproduce.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def l2_norm(vecs: pd.Series) -> pd.Series:
    """Scalar pandas UDF: L2 norm of an array<float> column.

    The per-row sum of squares is a sequential left fold in float64
    (matches ``list_reduce`` exactly); sqrt is IEEE-correctly-rounded
    in every engine, so a 6dp round downstream is boundary-safe.
    """
    import math

    def norm(v) -> float:
        acc = 0.0
        for x in v:
            fx = float(x)
            acc = acc + fx * fx
        return math.sqrt(acc)

    return vecs.map(norm)


@pandas_udf("double")
def trimmed_mean_10(values: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: 10%-trimmed mean — drop the lowest and
    highest ``floor(n/10)`` values, average the rest (the robust mean
    no built-in aggregate provides). Sorting first makes the fold
    order canonical: the sequential sum over the sorted middle equals
    DuckDB's ``list_reduce`` over ``list_sort`` bit-for-bit, so the
    aggregate is partition-order-independent AND oracle-exact.
    """
    vs = sorted(float(v) for v in values if v is not None and v == v)
    n = len(vs)
    if n == 0:
        return None
    k = n // 10
    mid = vs[k : n - k] if n - 2 * k > 0 else vs
    acc = 0.0
    for v in mid:
        acc = acc + v
    return acc / len(mid)
