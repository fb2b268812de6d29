"""Property tests for the round-5 batch-F operators (path trigrams,
BOM rollup), beyond the DuckDB oracle equality the driver gate
enforces."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import suite

from .conftest import SF_SMOKE


def test_path_trigrams_shape_and_ties(spark):
    rows = suite.QUERIES["x_path_trigrams"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 15
    # ordered by (n desc, path asc)
    for a, b in zip(rows, rows[1:]):
        assert (a.n, b.path) >= (b.n, a.path) or a.n > b.n
        if a.n == b.n:
            assert a.path < b.path
    for r in rows:
        assert r.path.count(">") == 2


def test_path_trigrams_handmade(spark):
    """Three users; only one has >= 3 events; trigram is the ordered
    type sequence regardless of input row order."""
    rows = [
        (3, "2024-01-01 00:00:03", 1, "c"),
        (1, "2024-01-01 00:00:01", 1, "a"),
        (2, "2024-01-01 00:00:02", 1, "b"),
        (4, "2024-01-01 00:00:04", 1, "d"),
        (5, "2024-01-01 00:00:01", 2, "a"),
        (6, "2024-01-01 00:00:02", 2, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("s")
    )
    types = F.transform(F.col("s"), lambda x: x["event_type"])
    tri = seq.filter(F.size("s") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s") - 2),
                lambda i: F.concat_ws(
                    ">",
                    F.element_at(types, i),
                    F.element_at(types, i + 1),
                    F.element_at(types, i + 2),
                ),
            )
        ).alias("path")
    )
    got = sorted(r.path for r in tri.collect())
    assert got == ["a>b>c", "b>c>d"]


def test_bom_rollup_root_invariants(spark):
    """Digit-tree invariants: the total over all sub-10 roots equals
    the whole table's count and value; every node's subtree contains
    itself."""
    out = suite.QUERIES["x_bom_rollup"](spark, SF_SMOKE)
    roots = out.filter(F.col("node") < 10)
    part = suite._t(spark, SF_SMOKE, "part")
    n_parts = part.count()
    total_value = float(
        part.agg(
            F.sum(F.col("p_retailprice").cast("decimal(28,2)")).cast("double")
        ).collect()[0][0]
    )
    agg = roots.agg(
        F.sum("n_desc").alias("n"), F.sum("subtree_value").alias("v")
    ).collect()[0]
    assert agg.n == n_parts
    assert abs(agg.v - total_value) < 1e-6
    assert out.filter(F.col("n_desc") < 1).count() == 0


def test_bom_rollup_parent_contains_children(spark):
    rows = {r.node: r for r in suite.QUERIES["x_bom_rollup"](spark, SF_SMOKE).collect()}
    for node, r in rows.items():
        parent = node // 10
        if node >= 10 and parent in rows:
            assert rows[parent].n_desc >= r.n_desc
            assert rows[parent].subtree_value >= r.subtree_value - 1e-9


def test_pq_adc_topk_shape_and_monotone(spark):
    rows = suite.QUERIES["ss_pq_adc_topk"](spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4, 5, 6, 7}
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # distances non-decreasing with rank; self excluded
        for a, b in zip(rs, rs[1:]):
            assert (a.adc_dist, a.neighbor_id) <= (b.adc_dist, b.neighbor_id)
        assert all(r.neighbor_id != q for r in rs)


def test_pq_adc_tournament_salt_invariant(spark):
    """The two-stage tournament must give identical results for any
    salt bucket count."""
    from covid_19_fl_spark import tables
    from covid_19_fl_spark.llmops import similarity

    emb = tables.load(spark, SF_SMOKE, "embeddings")
    a = similarity.pq_adc_topk(emb, [0, 1, 2], k=3, salt_buckets=64)
    b = similarity.pq_adc_topk(emb, [0, 1, 2], k=3, salt_buckets=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_welch_ttest_matches_scipy_formula(spark):
    """Recompute Welch's t from the raw data in Python."""
    import math

    row = suite.QUERIES["x_welch_ttest"](spark, SF_SMOKE).collect()[0]
    orders = suite._t(spark, SF_SMOKE, "orders")
    vals = {
        g: [
            round(float(r[0]) * 100)
            for r in orders.filter(F.col("o_orderpriority") == g)
            .select("o_totalprice")
            .collect()
        ]
        for g in ("1-URGENT", "5-LOW")
    }
    x, y = vals["1-URGENT"], vals["5-LOW"]
    mx, my = sum(x) / len(x), sum(y) / len(y)
    vx = sum((v - mx) ** 2 for v in x) / (len(x) - 1)
    vy = sum((v - my) ** 2 for v in y) / (len(y) - 1)
    t = (mx - my) / math.sqrt(vx / len(x) + vy / len(y))
    assert row.n_urgent == len(x) and row.n_low == len(y)
    assert abs(row.t_stat - t) < 1e-4
    se1, se2 = vx / len(x), vy / len(y)
    df = (se1 + se2) ** 2 / (se1**2 / (len(x) - 1) + se2**2 / (len(y) - 1))
    assert abs(row.df_welch - df) < 0.01
