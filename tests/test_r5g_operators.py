"""Property tests for the round-5 batch-G operators (mutual
information, spatial hotspots), beyond the DuckDB oracle equality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from covid_19_fl_spark import suite

from .conftest import SF_SMOKE


def test_mutual_information_nonnegative_and_bounded(spark):
    rows = suite.QUERIES["ml_mutual_information"](spark, SF_SMOKE).collect()
    assert len(rows) == 8
    n_labels = (
        suite._t(spark, SF_SMOKE, "embeddings")
        .select("label")
        .distinct()
        .count()
    )
    cap = math.log(min(8, n_labels))  # MI <= min(H(bin), H(label)) <= ln(min cards)
    for r in rows:
        assert -1e-9 <= r.mi_nats <= cap + 1e-9


def test_mutual_information_matches_python(spark):
    """Recompute MI for dim 1 from raw counts in Python."""
    emb = suite._t(spark, SF_SMOKE, "embeddings")
    rows = emb.select(
        F.least(
            F.lit(7),
            F.greatest(
                F.lit(0),
                (F.floor(F.element_at("embedding", 1).cast("double") * 4) + 4).cast(
                    "long"
                ),
            ),
        ).alias("bin"),
        "label",
    ).collect()
    from collections import Counter

    joint = Counter((r.bin, r.label) for r in rows)
    cb = Counter(r.bin for r in rows)
    cl = Counter(r.label for r in rows)
    n = len(rows)
    mi = sum(
        (c / n) * math.log(n * c / (cb[b] * cl[lab]))
        for (b, lab), c in joint.items()
    )
    got = {
        r.dim: r.mi_nats
        for r in suite.QUERIES["ml_mutual_information"](spark, SF_SMOKE).collect()
    }
    assert abs(got[1] - mi) < 1e-5


def test_spatial_hotspots_ordering_and_bounds(spark):
    rows = suite.QUERIES["x_spatial_hotspots"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    for a, b in zip(rows, rows[1:]):
        assert a.gi_z >= b.gi_z
        if a.gi_z == b.gi_z:
            assert (a.d, a.vb) < (b.d, b.vb)
    for r in rows:
        # neighborhood sum includes the cell itself
        assert r.s9 >= 1


def test_spatial_hotspots_s9_matches_naive(spark):
    """Recompute a few neighborhood sums naively from cell counts."""
    ev = suite._t(spark, SF_SMOKE, "events").filter(F.col("value").isNotNull())
    cells = {
        (r.d, r.vb): r.c
        for r in ev.groupBy(
            F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("d"),
            F.floor(F.col("value").cast("double") / 5).cast("long").alias("vb"),
        )
        .agg(F.count("*").alias("c"))
        .collect()
    }
    rows = suite.QUERIES["x_spatial_hotspots"](spark, SF_SMOKE).collect()
    for r in rows[:5]:
        want = sum(
            cells.get((r.d + dd, r.vb + dv), 0)
            for dd in (-1, 0, 1)
            for dv in (-1, 0, 1)
        )
        assert r.s9 == want


def test_adaboost_invariants(spark):
    rows = sorted(
        suite.QUERIES["ml_adaboost_stumps"](spark, SF_SMOKE).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [1, 2, 3]
    for r in rows:
        # argmin over both polarities guarantees e <= T/2 => rho >= Q
        assert r.rho_milli >= 1000
        assert 0.0 < r.train_acc <= 1.0
        assert 0 <= r.threshold <= 15 and r.polarity in (0, 1)


def test_adaboost_separable_data(spark):
    """A dataset perfectly split by one bin threshold: round 1 must
    reach accuracy 1.0 and the capped ratio."""
    rows = [([float(i % 2) - 0.5] * 64, i % 2) for i in range(40)]
    df = spark.createDataFrame(
        [(i, v, lab) for i, (v, lab) in enumerate(rows)],
        "vec_id long, embedding array<double>, label long",
    )
    import covid_19_fl_spark.suite_r5g as g
    from unittest import mock

    with mock.patch.object(g, "_t", lambda spark, sf, name: df):
        out = sorted(
            g.ml_adaboost_stumps(spark, "ignored").collect(),
            key=lambda r: r.round,
        )
    assert out[0].train_acc == 1.0
    # e=0 -> rho = min(cap, tot*Q) = 40 rows * 1000
    assert out[0].rho_milli == 40 * 1000


def test_sax_motifs_shape(spark):
    rows = suite.QUERIES["x_sax_motifs"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert len(r.motif) == 3
        assert all(c in "abcd" for c in r.motif)
        assert r.n >= 1
    for a, b in zip(rows, rows[1:]):
        assert (a.n > b.n) or (a.n == b.n and a.motif < b.motif)


def test_sax_symbols_balanced(spark):
    """Equi-depth NTILE symbols: the four symbol counts differ by at
    most one across the kept (full-width) windows."""
    orders = suite._t(spark, SF_SMOKE, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count("*").alias("v")
    )
    ext = daily.agg(
        F.min("d").alias("d0"),
        F.floor((F.datediff(F.max("d"), F.min("d")) + 1) / 8)
        .cast("long")
        .alias("n_full"),
    )
    paa = (
        daily.crossJoin(ext)
        .groupBy(
            F.floor(F.datediff(F.col("d"), F.col("d0")) / 8)
            .cast("long")
            .alias("widx"),
            F.col("n_full"),
        )
        .agg(F.sum("v").alias("s"))
        .filter(F.col("widx") < F.col("n_full"))
    )
    n = paa.count()
    from pyspark.sql import Window as W

    sym = paa.select(
        F.ntile(4).over(W.partitionBy().orderBy("s", "widx")).alias("nt")
    )
    counts = [r[1] for r in sym.groupBy("nt").count().collect()]
    assert max(counts) - min(counts) <= 1
    assert sum(counts) == n


def test_learning_curve_shape(spark):
    rows = sorted(
        suite.QUERIES["ml_learning_curve"](spark, SF_SMOKE).collect(),
        key=lambda r: r.train_pct,
    )
    assert [r.train_pct for r in rows] == [10, 25, 50]
    # training sets are nested prefixes, so n_train is non-decreasing
    assert rows[0].n_train <= rows[1].n_train <= rows[2].n_train
    for r in rows:
        assert 0.0 <= r.eval_acc <= 1.0
        assert r.n_train > 0
