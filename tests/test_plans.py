"""Physical-plan assertions — the 100 TB design gate.

Correctness says the answer is right; these say the PLAN is right:
filters reach the parquet scan, projections prune columns, dimensions
broadcast, aggregations partial-combine before the exchange, top-k
avoids global sorts. A regression here means a query that still passes
its oracle but would fall over at 1000× the data.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark import suite, tables


@pytest.fixture(autouse=True)
def _full_metadata(spark):
    # FileScan metadata (PushedFilters/ReadSchema) is truncated to 100
    # chars by default — too short to assert against.
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    yield
    spark.conf.unset("spark.sql.maxMetadataStringLength")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    q = suite.QUERIES["q6_forecast_revenue"](spark, sf_dir)
    plan = _plan(q)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed, plan
    # Range + comparison predicates must reach the parquet reader.
    assert "l_shipdate" in pushed.group(1)
    assert "l_quantity" in pushed.group(1)
    assert "l_discount" in pushed.group(1)


def test_q6_column_pruning(spark, sf_dir):
    q = suite.QUERIES["q6_forecast_revenue"](spark, sf_dir)
    plan = _plan(q)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # 11-column table, 4-column query — the scan must not read the rest.
    assert read_cols == {"l_shipdate", "l_quantity", "l_discount", "l_extendedprice"}


def test_q5_broadcasts_dimensions_only(spark, sf_dir):
    plan = _plan(suite.QUERIES["q5_local_supplier_volume"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # nation/region/supplier side


def test_a2_partial_aggregation(spark, sf_dir):
    plan = _plan(suite.QUERIES["a2_daily_counts"](spark, sf_dir))
    # partial (map-side) + final HashAggregate around one exchange:
    # fact rows never cross the shuffle un-combined.
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_a4_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(suite.QUERIES["a4_top5_by_count"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # No global Sort node — per-partition heaps only.
    assert not re.search(r"\bSort\b(?!.*TakeOrdered)", plan.split("TakeOrdered")[0])


def test_q1_whole_stage_codegen(spark, sf_dir):
    q = suite.QUERIES["q1_pricing_summary"](spark, sf_dir)
    q.collect()  # AQE finalizes (and codegens) only on execution
    plan = _plan(q)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark whole-stage-codegen spans: both the scan+
    # partial-agg stage and the final-agg stage must be codegen'd.
    assert "*(1)" in plan and "*(2)" in plan


def test_j4_semi_and_anti_shuffle_keys_only(spark, sf_dir):
    plan = _plan(suite.QUERIES["j4_anti_join"](spark, sf_dir))
    assert "LeftAnti" in plan


def test_scan_filter_pushdown_via_tables_load(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    plan = _plan(orders)
    assert "PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]" in plan


def test_asof_join_no_join_node(spark, sf_dir):
    plan = _plan(suite.QUERIES["x_asof_join"](spark, sf_dir))
    # union + window — a range/theta join here would blow up at scale.
    assert "Window" in plan


def test_growth_sim_no_driver_loop(spark, sf_dir):
    # G1 must be the closed form (explode(sequence) + pow), not an
    # iterative driver loop: the plan contains a generator, and is a
    # single job.
    plan = _plan(suite.QUERIES["g1_growth_sim"](spark, sf_dir))
    assert "Generate" in plan


def test_q4_exists_compiles_to_semi_join(spark, sf_dir):
    plan = _plan(suite.QUERIES["q4_priority_with_exists"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_q22_not_exists_compiles_to_anti_join(spark, sf_dir):
    plan = _plan(suite.QUERIES["q22_dormant_customers"](spark, sf_dir))
    assert "LeftAnti" in plan
    # the scalar threshold rides a broadcast, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_pivot_single_aggregation_pass(spark, sf_dir):
    plan = _plan(suite.QUERIES["x_pivot_daily_types"](spark, sf_dir))
    # declared pivot values → conditional aggs, one partial+final pair,
    # NOT one aggregation per pivot value
    assert plan.count("Exchange") <= 2


def test_q19_disjunction_pushes_per_side_conjuncts(spark, sf_dir):
    plan = _plan(suite.QUERIES["q19_disjunctive_revenue"](spark, sf_dir))
    # the OR of brackets must not block pushdown: each scan gets the
    # side-local disjunction, the cross-side residual rides the join
    assert re.search(r"PushedFilters: \[.*Or\(.*l_quantity", plan)
    assert re.search(r"PushedFilters: \[.*Or\(.*p_brand|PushedFilters: \[.*Or\(.*p_size", plan)


def test_q13_left_outer_survives_join_condition_filter(spark, sf_dir):
    plan = _plan(suite.QUERIES["q13_customer_order_distribution"](spark, sf_dir))
    # the '5-LOW' exclusion lives in the join condition; it must push to
    # the orders scan WITHOUT turning the outer join inner
    assert "LeftOuter" in plan
    assert "5-LOW" in plan and re.search(r"PushedFilters: \[.*5-LOW", plan)


def test_q16_distinct_count_is_two_phase(spark, sf_dir):
    plan = _plan(suite.QUERIES["q16_supplier_count_by_part"](spark, sf_dir))
    # dedup on (group keys, suppkey) before the distinct count — no
    # single reducer materializes all suppliers of a hot part
    assert "LeftAnti" in plan
    assert plan.count("HashAggregate") >= 4


def test_q21_self_joins_and_topk(spark, sf_dir):
    plan = _plan(suite.QUERIES["q21_sole_blame_suppliers"](spark, sf_dir))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan
    # the l1 scan must push the returnflag filter
    assert re.search(r"PushedFilters: \[.*EqualTo\(l_returnflag,R\)", plan)


def test_scd2_reuses_one_shuffle(spark, sf_dir):
    """x_scd2_build: lag-dedup and lead-interval windows share the
    (user_id) partitioning and (ts, event_id) ordering, so the whole
    dimension build costs exactly ONE Exchange — the property that
    makes it viable when the change stream is 100 TB."""
    q = suite.QUERIES["x_scd2_build"](spark, sf_dir)
    plan = _plan(q)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    # and both window operators are present over that one shuffle
    assert len(re.findall(r"\bWindow\b|RunningWindowFunction", plan)) >= 1, plan


def test_gap_fill_spine_broadcasts(spark, sf_dir):
    """x_gap_fill_ffill: the (type × day) date spine joins the sparse
    daily aggregate without shuffling the spine-side rows as a
    sort-merge — the small side broadcasts."""
    plan = _plan(suite.QUERIES["x_gap_fill_ffill"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_range_join_broadcasts_buckets(spark, sf_dir):
    """x_range_join: the inequality join must be a broadcast nested
    loop against the 10-row bucket table, never a cartesian shuffle."""
    plan = _plan(suite.QUERIES["x_range_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pii_redaction_is_scan_stage_only(spark, sf_dir):
    """tx_pii_redaction: pure per-row string expressions — zero
    exchanges, zero Python (BatchEvalPython/ArrowEvalPython) nodes."""
    plan = _plan(suite.QUERIES["tx_pii_redaction"](spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_scalar_quantize_no_shuffle_no_python(spark, sf_dir):
    """ss_scalar_quantize: per-vector array HOFs stay in the scan
    stage — no exchange, no Python eval."""
    plan = _plan(suite.QUERIES["ss_scalar_quantize"](spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
