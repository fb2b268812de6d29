"""Canonical scalar-expression library (SURVEY.md §2.3 / §2.10).

Every per-row Python transform the reference performs in its ingest
loops is re-expressed here as a pure ``Column`` expression — JVM-side,
whole-stage-codegen'd, zero Python UDFs. Reference provenance is cited
per function; semantics deltas vs the reference (e.g. `'Unknown'` age
strings canonicalized to null) are documented in SURVEY.md §1.2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def digits_to_int(col: Column | str) -> Column:
    """P1 — strip non-digits, cast to int.

    Reference: ``int(re.sub("[^0-9]", "", s))`` (cv.py:61,63;
    cv-csv.py:49,51). Empty-after-strip → null (the reference raised).
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, "[^0-9]", "")
    return F.when(cleaned != "", cleaned.cast("int"))


def na_to_null(col: Column | str, sentinel: str = "NA") -> Column:
    """P2 — sentinel string → null (cv-api.py:110,113)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(sentinel))


def na_to_default(col: Column | str, default: str, sentinel: str = "NA") -> Column:
    """P2 — sentinel string → default value (cv-api.py:114,116)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.nullif(c, F.lit(sentinel)), F.lit(default))


def title_case(col: Column | str) -> Column:
    """P3 — title-case normalization: ``s.title()`` (cv-api.py:106,114,118,119)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.initcap(c)


def split_title_array(col: Column | str, sep: str = ";", min_len: int = 2) -> Column:
    """P4 — split to array; title-case tokens longer than ``min_len``.

    Reference (cv-api.py:106): preserves short tokens like state codes
    "NY"/"FL" verbatim while title-casing longer place names. A
    higher-order ``transform`` — no UDF, fully codegen'd.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.split(c, sep),
        lambda x: F.when(F.length(F.trim(x)) > min_len, F.initcap(F.trim(x))).otherwise(
            F.trim(x)
        ),
    )


def epoch_ms_to_day(col: Column | str) -> Column:
    """P5 — epoch-millis → day-truncated timestamp (cv-api.py:115).

    The reference used local wall-clock; the engine pins UTC via the
    session timezone (session.py), a documented canonicalization.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("DAY", F.timestamp_millis(c.cast("long")))


def parse_date(col: Column | str, fmt: str = "M/d/yy", strict: bool = False) -> Column:
    """P6 — string → date with explicit pattern (cv-csv.py:57,89; cv-api.py:156).

    Default is TOLERANT (``try_to_date``): malformed input → null, to be
    quarantined downstream (ingest.split_valid) — one bad row must not
    abort a 100 TB ingest, which is exactly what ``to_date`` does under
    Spark 4's default ANSI mode. ``strict=True`` restores the raising
    behavior (the reference's strptime also raised)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, fmt) if strict else F.try_to_date(c, fmt)


def guarded_ratio(num: Column, den: Column) -> Column:
    """P8 — ``num/den`` when ``den > 0`` else 0.0 (cv-api.py:161,164)."""
    return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))


def per_capita(count: Column, population: Column, per: int = 1000, dp: int = 2) -> Column:
    """P9 — ``round(count / (population / per), dp)`` (cv-county-stats.py:66)."""
    return F.round(count / (population / F.lit(per)), dp)
