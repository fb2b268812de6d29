"""One-call literal-array constructors.

``F.array(*[F.lit(v) for v in values])`` costs 2+ py4j round-trips per
element — for plan-time constant tables (decay weights, LSH plane
coefficients) with hundreds of entries that is seconds of pure driver
overhead per query *construction*, before Spark runs anything (measured:
the 829-entry decay table alone added ~1.5 s per build). These helpers
render the whole array as ONE SQL expression string parsed JVM-side in
a single call; Catalyst constant-folds it identically either way, so
the physical plan and results are unchanged.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def long_array(values: Iterable[int]) -> Column:
    """array<bigint> literal from Python ints, one JVM parse."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in values) + ")")


def double_array(values: Iterable[float]) -> Column:
    """array<double> literal from Python floats, one JVM parse.

    Values go through ``repr`` (shortest round-trip decimal) and a
    string→double CAST, which parses back to the identical binary64 —
    bit-equal to ``F.lit(v)`` and to the same decimal literal in any
    correctly-rounding engine (the DuckDB oracles inline the same
    decimals), so engine-portable constants stay portable.
    """
    return F.expr(
        "array(" + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in values) + ")"
    )
