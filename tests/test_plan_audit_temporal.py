"""Physical-plan audits for the temporal/graph/KG-train operators: the
scale properties claimed in their docstrings must be visible in the
executed plan — no nested-loop range joins, broadcast candidate pools,
and single-exchange as-of matching."""

import __spark_entry__ as e

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_interval_join_is_equality_not_nested_loop(spark):
    """The bucketed range join must plan as a hash equality join — a raw
    range predicate would plan as BroadcastNestedLoopJoin/Cartesian,
    which is the quadratic blowup the operator exists to avoid."""
    plan = plan_of(e.q_interval_join(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_join_has_no_join_operator(spark):
    """The as-of match is union + window — there must be NO join in the
    plan at all (the match happens in the running-last window)."""
    plan = plan_of(e.q_asof_join(spark, SF_DIR))
    assert "Window" in plan
    for join_op in ("SortMergeJoin", "HashJoin", "NestedLoopJoin"):
        assert join_op not in plan


def test_negative_triples_pool_broadcasts(spark):
    """The per-predicate candidate pool is vocabulary-sized and must
    broadcast; the corpus-side aggregation must partially combine."""
    plan = plan_of(e.q_negative_triples(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    # min_by compiles to a partial/final HashAggregate pair
    assert plan.count("HashAggregate") >= 2


def test_funnel_counts_reuses_user_partitioning(spark):
    """Every funnel stage shuffles on the user key only — no window over
    the event table, no nested-loop joins."""
    plan = plan_of(e.q_funnel_counts(spark, SF_DIR))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cohort_retention_no_window_partial_agg(spark):
    """Retention is aggregations + one user-keyed join — no window over
    the event table, no nested-loop join, and the final (cohort, offset)
    count partially combines map-side."""
    plan = plan_of(e.q_cohort_retention(spark, SF_DIR))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
