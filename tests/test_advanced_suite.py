"""Property tests for the advanced analytics suite (suite_advanced.py).

The oracle gate already proves value-equality vs DuckDB; these tests
check the *semantic invariants* each operator claims — dominance for
the skyline, exact triadic closure vs brute force, NTILE balance,
CUSUM's closed-form-equals-recursion identity, OLS vs numpy — so a
future refactor that keeps hash parity with a wrong oracle still trips
a wire.
"""

from __future__ import annotations

import itertools
import math

from covid_19_fl_spark import suite

from .conftest import SF_SMOKE


def test_skyline_is_exactly_the_nondominated_set(spark):
    rows = suite.QUERIES["x_skyline"](spark, SF_SMOKE).collect()
    kept = [(r.l_partkey, r.best_price, r.total_qty) for r in rows]
    # no kept point dominates another kept point
    for a, b in itertools.permutations(kept, 2):
        dominates = (
            a[1] <= b[1]
            and a[2] >= b[2]
            and (a[1] < b[1] or a[2] > b[2])
        )
        assert not dominates, f"{a} dominates kept point {b}"


def test_triangle_count_matches_brute_force(spark):
    res = suite.QUERIES["x_triangle_count"](spark, SF_SMOKE).collect()[0]
    li = (
        suite._t(spark, SF_SMOKE, "lineitem")
        .filter("l_orderkey % 5 = 0")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            edges.add((u, v))
    nodes = {x for e in edges for x in e}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    tri = sum(
        1
        for (u, v) in edges
        for w in adj.get(v, ())
        if (u, w) in edges
    )
    assert (res.n_nodes, res.n_edges, res.n_triangles) == (
        len(nodes),
        len(edges),
        tri,
    )


def test_rfm_quintiles_are_balanced_and_complete(spark):
    rows = suite.QUERIES["x_rfm_segmentation"](spark, SF_SMOKE).collect()
    total = sum(r.n_customers for r in rows)
    n_cust = suite._t(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()
    assert total == n_cust
    for dim in ("r_score", "f_score", "m_score"):
        per_score: dict[int, int] = {}
        for r in rows:
            s = getattr(r, dim)
            assert 1 <= s <= 5
            per_score[s] = per_score.get(s, 0) + r.n_customers
        # NTILE balance: bucket sizes differ by at most 1
        assert max(per_score.values()) - min(per_score.values()) <= 1, dim


def test_cusum_closed_form_equals_textbook_recursion(spark):
    rows = sorted(
        suite.QUERIES["x_cusum_changepoint"](spark, SF_SMOKE).collect(),
        key=lambda r: r.order_date,
    )
    n = len(rows)
    total = sum(r.n_orders for r in rows)
    mu = total / n
    s_up = s_dn = 0.0
    for r in rows:
        s_up = max(0.0, s_up + (r.n_orders - mu))
        s_dn = max(0.0, s_dn + (mu - r.n_orders))
        assert r.cusum_up >= 0 and r.cusum_down >= 0
        assert abs(r.cusum_up - s_up) < 1e-6, r.order_date
        assert abs(r.cusum_down - s_dn) < 1e-6, r.order_date


def test_autocorrelation_bounds_and_pair_counts(spark):
    rows = suite.QUERIES["x_autocorrelation"](spark, SF_SMOKE).collect()
    n_days = (
        suite._t(spark, SF_SMOKE, "orders")
        .selectExpr("CAST(o_orderdate AS DATE) d")
        .distinct()
        .count()
    )
    assert {r.lag_k for r in rows} == set(range(1, 8))
    for r in rows:
        assert r.n_pairs == n_days - r.lag_k
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9


def test_linear_trend_matches_numpy_polyfit(spark):
    import numpy as np

    res = {r.event_type: r for r in suite.QUERIES["ml_linear_trend"](spark, SF_SMOKE).collect()}
    daily = (
        suite._t(spark, SF_SMOKE, "events")
        .selectExpr(
            "event_type", "CAST(ts AS DATE) AS d", "CAST(value AS DECIMAL(28,4)) AS v"
        )
        .groupBy("event_type", "d")
        .agg({"v": "sum"})
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, float(r["sum(v)"])))
    for etype, pts in series.items():
        pts.sort()
        d0 = pts[0][0]
        xs = np.array([(d - d0).days for d, _ in pts], dtype=float)
        ys = np.array([y for _, y in pts])
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(res[etype].slope - slope) < 1e-4, etype
        assert abs(res[etype].intercept - intercept) < 1e-4, etype
        assert res[etype].n_days == len(pts)


def test_equidepth_buckets_balanced(spark):
    rows = suite.QUERIES["x_equidepth_histogram"](spark, SF_SMOKE).collect()
    total = sum(r.n_rows for r in rows)
    assert total == suite._t(spark, SF_SMOKE, "lineitem").count()
    assert {r.bucket for r in rows} == set(range(1, 11))
    # tiebreak keys are unique → bucket sizes differ by at most 1
    assert max(r.n_rows for r in rows) - min(r.n_rows for r in rows) <= 1
    # bucket boundaries are non-decreasing in bucket order
    ordered = sorted(rows, key=lambda r: r.bucket)
    for a, b in zip(ordered, ordered[1:]):
        assert a.hi <= b.lo or math.isclose(a.hi, b.lo)


def test_naive_bayes_confusion_partitions_corpus(spark):
    rows = suite.QUERIES["ml_naive_bayes"](spark, SF_SMOKE).collect()
    docs = suite._t(spark, SF_SMOKE, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert {r.lang for r in rows} <= langs
    assert {r.pred_lang for r in rows} <= langs


def test_knn_accuracy_counts_consistent(spark):
    rows = suite.QUERIES["ml_knn_accuracy"](spark, SF_SMOKE).collect()
    emb = suite._t(spark, SF_SMOKE, "embeddings")
    # r5: the harness evaluates a fixed-size md5-ranked probe sample
    # (256 rows) so cost is O(probe·corpus), not all-pairs.
    assert sum(r.n_vectors for r in rows) == min(256, emb.count())
    for r in rows:
        assert 0 <= r.n_correct <= r.n_vectors
        assert abs(r.accuracy - r.n_correct / r.n_vectors) < 1e-6


def test_decision_stump_is_global_minimum(spark):
    best = suite.QUERIES["ml_decision_stump"](spark, SF_SMOKE).collect()[0]
    ev = suite._t(spark, SF_SMOKE, "events").selectExpr(
        "CAST(FLOOR(value) AS BIGINT) AS bin",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos",
    ).collect()
    n = len(ev)
    assert best.left_n + best.right_n == n
    # brute-force weighted gini over all candidate thresholds
    bins = sorted({r.bin for r in ev})
    def gini_at(t):
        lp = sum(r.pos for r in ev if r.bin < t)
        ln = sum(1 for r in ev if r.bin < t)
        rp = sum(r.pos for r in ev) - lp
        rn = n - ln
        if ln == 0 or rn == 0:
            return None
        gl = 1 - (lp / ln) ** 2 - ((ln - lp) / ln) ** 2
        gr = 1 - (rp / rn) ** 2 - ((rn - rp) / rn) ** 2
        return (ln * gl + rn * gr) / n
    ginis = [(g, t) for t in bins if (g := gini_at(t)) is not None]
    min_g, min_t = min(ginis)
    assert abs(best.weighted_gini - min_g) < 1e-5
    assert best.threshold == min(t for g, t in ginis if abs(g - min_g) < 1e-9)


def test_pca_power_matches_numpy_fixed_point_replica(spark):
    """The distributed operator must reproduce the integer fixed-point
    power recursion bit-for-bit (the determinism contract — same shape
    as the CUSUM closed-form test). Eigen-alignment is NOT asserted:
    this corpus's synthetic embeddings are near-isotropic (λ2/λ1≈0.93),
    so 3 rounds can't converge — raising `rounds` in the unrolled
    oracle is how a real deployment buys convergence."""
    import numpy as np

    rows = sorted(
        suite.QUERIES["ml_pca_power"](spark, SF_SMOKE).collect(),
        key=lambda r: r.dim,
    )
    emb = suite._t(spark, SF_SMOKE, "embeddings").select("embedding").collect()
    M = np.stack([np.array(r.embedding, dtype="float64") for r in emb])
    Qm = np.floor(M * 1024).astype("int64")
    n = len(Qm)
    G = Qm.T @ Qm
    m = Qm.sum(axis=0)
    S = n * G - np.outer(m, m)
    x = np.full(S.shape[0], 1024, dtype="int64")
    for _ in range(3):
        y = S @ x
        d = max(1, int(np.floor(np.abs(y).max() / 1024)))
        x = np.floor(y.astype("float64") / d).astype("int64")
    # sign normalization on the lowest non-zero dim
    nz = np.nonzero(x)[0]
    if len(nz) and x[nz[0]] < 0:
        x = -x
    got_u = np.array([r.weight_u for r in rows])
    assert (got_u == x).all(), (got_u[:8], x[:8])
    for r in rows:
        assert abs(r.weight - r.weight_u / 1024.0) < 1e-12
    nz_rows = [r for r in rows if r.weight_u != 0]
    assert nz_rows[0].weight_u > 0


def test_market_basket_metric_bounds_and_ranking(spark):
    rows = sorted(
        suite.QUERIES["x_market_basket"](spark, SF_SMOKE).collect(),
        key=lambda r: r.rk,
    )
    assert rows and len(rows) <= 20
    for r in rows:
        assert r.pair_n >= 2
        assert 0 < r.support <= r.confidence <= 1
        assert r.lift > 0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_pmi_collocations_support_floor_and_ranking(spark):
    rows = sorted(
        suite.QUERIES["tx_pmi_collocations"](spark, SF_SMOKE).collect(),
        key=lambda r: r.rk,
    )
    assert rows and len(rows) <= 20
    for r in rows:
        assert r.pair_n >= 5
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_holt_smoothing_matches_python_recursion(spark):
    rows = suite.QUERIES["x_holt_smoothing"](spark, SF_SMOKE).collect()
    by_prio: dict[str, list] = {}
    for r in rows:
        by_prio.setdefault(r.o_orderpriority, []).append(r)
    for prio, series in by_prio.items():
        series.sort(key=lambda r: r.o_orderdate)
        daily = [r for r in series]
        # replicate: n comes from the engine's own daily count re-query
        counts = {
            (r.o_orderpriority, r.o_orderdate): float(r["count(1)"])
            for r in suite._t(spark, SF_SMOKE, "orders")
            .groupBy("o_orderpriority", "o_orderdate")
            .count()
            .withColumnRenamed("count", "count(1)")
            .collect()
        }
        lvl = trend = None
        for r in daily:
            x = counts[(prio, r.o_orderdate)]
            if lvl is None:
                lvl, trend = x, 0.0
            else:
                new_lvl = 0.5 * x + 0.5 * (lvl + trend)
                trend = 0.3 * (new_lvl - lvl) + 0.7 * trend
                lvl = new_lvl
            assert abs(r.holt_level - lvl) < 1e-5, (prio, r.o_orderdate)
            assert abs(r.holt_trend - trend) < 1e-5
            assert abs(r.forecast_1 - (lvl + trend)) < 1e-5


def test_weighted_median_crossing_property(spark):
    rows = {r.l_returnflag: r.weighted_median_price
            for r in suite.QUERIES["x_weighted_median"](spark, SF_SMOKE).collect()}
    li = suite._t(spark, SF_SMOKE, "lineitem").selectExpr(
        "l_returnflag", "l_extendedprice AS p", "l_quantity AS w"
    ).collect()
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append((r.p, r.w))
    for flag, pts in groups.items():
        med = rows[flag]
        tot = sum(w for _, w in pts)
        below = sum(w for p, w in pts if p < med)
        at_or_below = sum(w for p, w in pts if p <= med)
        # lower weighted median: cum weight reaches half exactly at med
        assert below * 2 < tot + 1e-6, flag
        assert at_or_below * 2 >= tot - 1e-6, flag


def test_gini_bounds_and_count(spark):
    r = suite.QUERIES["x_gini_spend"](spark, SF_SMOKE).collect()[0]
    n_cust = suite._t(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()
    assert r.n_customers == n_cust
    assert 0.0 <= r.gini < 1.0


def test_abc_classes_partition_revenue(spark):
    rows = {r.abc: r for r in suite.QUERIES["x_abc_classification"](spark, SF_SMOKE).collect()}
    li = suite._t(spark, SF_SMOKE, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_parts for r in rows.values()) == n_parts
    tot = sum(r.class_revenue for r in rows.values())
    # A-class holds the largest share, C the smallest per-part share
    if "A" in rows and "C" in rows:
        assert rows["A"].class_revenue / rows["A"].n_parts > rows["C"].class_revenue / rows["C"].n_parts
    assert abs(tot - sum(r.class_revenue for r in rows.values())) < 1e-6


def test_bfs_distances_match_networkx_free_bfs(spark):
    rows = {r.dist: r.n_nodes for r in suite.QUERIES["x_bfs_distances"](spark, SF_SMOKE).collect()}
    li = (
        suite._t(spark, SF_SMOKE, "lineitem")
        .filter("l_orderkey % 5 = 0")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    adj: dict[int, set[int]] = {}
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    # plain BFS from all sources, capped at 3 hops
    dist = {n: 0 for n in adj if n % 97 == 0}
    frontier = set(dist)
    for d in range(1, 4):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.add(v)
        frontier = nxt
    expected: dict[int, int] = {}
    for n in adj:
        expected[dist.get(n, -1)] = expected.get(dist.get(n, -1), 0) + 1
    assert rows == expected
