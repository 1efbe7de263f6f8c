"""Physical-plan assertions: the optimizations we rely on at 100 TB must be
visible in the plan at any scale (SURVEY.md §4). These tests read
``explain(mode='formatted')`` output rather than timing anything."""

from __future__ import annotations

from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].spark_fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ref_filter_pushdown")
    assert "PushedFilters" in plan
    # both predicates reach the parquet reader
    assert "event_type" in plan.split("PushedFilters")[1].splitlines()[0]
    assert "value" in plan.split("PushedFilters")[1].splitlines()[0]


def test_time_range_predicate_pushed_as_int64(spark, sf_dir):
    """The ns->us conversion must NOT defeat row-group pruning: the time
    bounds are pushed as raw INT64 comparisons (io.scan_time_range)."""
    plan = _plan(spark, sf_dir, "ref_time_range_pruned")
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "ts" in pushed, pushed
    assert "GreaterThanOrEqual" in pushed or "IsNotNull" in pushed, pushed
    # the long-literal bounds (ns since epoch) appear pushed, not a cast expr
    assert "1704844800000000000" in pushed or "GreaterThanOrEqual(ts" in pushed, pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ref_limit_scan")
    # ReadSchema should only list the two projected columns
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "event_id" in read_schema and "event_type" in read_schema
    assert "props" not in read_schema and "value" not in read_schema


def test_union_sources_single_scan(spark, sf_dir):
    """ref_union_sources multiplexes ONE scan (not 3x scan-union)."""
    import re

    plan = _plan(spark, sf_dir, "ref_union_sources")
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ref_topk_latest")
    assert "TakeOrderedAndProject" in plan


def test_dim_join_broadcasts(spark, sf_dir):
    """The explicit F.broadcast(part) must produce a BroadcastHashJoin: the
    lineitem side never shuffles for the join."""
    plan = _plan(spark, sf_dir, "join_broadcast_brand_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    """Non-equi band join: small side broadcast, never a shuffled cartesian."""
    plan = _plan(spark, sf_dir, "join_range_price_bands")
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_global_sort_uses_range_partitioning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_global_orders")
    assert "rangepartitioning" in plan.lower(), plan


def test_sort_within_partitions_has_no_exchange(spark, sf_dir):
    """Partition-local sort must not introduce a shuffle."""
    plan = _plan(spark, sf_dir, "sort_within_partitions")
    assert "Exchange" not in plan, plan
    assert "Sort" in plan, plan


def test_asof_join_is_joinless(spark, sf_dir):
    """The as-of implementation is union-marker + window: no join operator."""
    plan = _plan(spark, sf_dir, "join_asof_last_click")
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_analytics_topk_selective_scan(spark, sf_dir):
    """Q3 shape: top-k short-circuits (no global sort) and both fact
    filters reach their parquet scans."""
    plan = _plan(spark, sf_dir, "analytics_unshipped_revenue")
    assert "TakeOrderedAndProject" in plan, plan
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln and "[]" not in ln
    ]
    joined = "\n".join(pushed)
    assert "o_orderdate" in joined, joined
    assert "l_shipdate" in joined, joined
    assert "c_mktsegment" in joined, joined


def test_analytics_q5_dims_broadcast(spark, sf_dir):
    """Q5 shape: supplier/nation/region ride broadcasts -- the fact side
    never shuffles for a dimension join."""
    plan = _plan(spark, sf_dir, "analytics_local_supplier_volume")
    assert plan.count("BroadcastExchange") >= 3, plan
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln and "[]" not in ln
    ]
    assert any("r_name" in ln for ln in pushed), plan


def test_subquery_exists_decorrelates_to_semi_join(spark, sf_dir):
    """EXISTS must rewrite to a LEFT SEMI hash join, not a per-row
    re-query, and the half-year filter must reach the orders scan."""
    plan = _plan(spark, sf_dir, "subq_exists_priority_counts")
    assert "LeftSemi" in plan, plan
    assert "Subquery" not in plan, plan
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln and "[]" not in ln
    ]
    assert any("o_orderdate" in ln for ln in pushed), plan


def test_subquery_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "subq_not_exists_inactive_customers")
    assert "LeftAnti" in plan, plan


def test_subquery_scalar_agg_decorrelates(spark, sf_dir):
    """The correlated scalar AVG becomes a per-partkey aggregate joined
    back -- an Aggregate node on the subquery side, zero Subquery nodes in
    the executed plan body."""
    plan = _plan(spark, sf_dir, "subq_scalar_below_avg_quantity")
    assert "Subquery" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_pivot_is_single_aggregation_single_scan(spark, sf_dir):
    """Explicit pivot values => no distinct-values pre-job; the reshape is
    one scan + one partial/final hash aggregation."""
    plan = _plan(spark, sf_dir, "reshape_pivot_status_revenue")
    assert plan.count("InMemoryFileIndex") == 1, plan
    assert "pivotfirst" in plan, plan


def test_unpivot_is_expand_not_union_of_scans(spark, sf_dir):
    """Spark unpivot = map-side Expand over ONE scan (the UNION ALL in the
    oracle would re-scan per metric)."""
    plan = _plan(spark, sf_dir, "reshape_unpivot_part_metrics")
    assert plan.count("InMemoryFileIndex") == 1, plan
    assert "Expand" in plan, plan


def test_global_shuffle_avoids_global_window(spark, sf_dir):
    """Positions come from bucket-local windows + a broadcast offset join;
    the only unpartitioned window runs over the 256-row offset table."""
    plan = _plan(spark, sf_dir, "train_global_shuffle")
    assert "BroadcastHashJoin" in plan, plan
    # the big-table row_number window is hash-partitioned by bucket
    assert "windowspecdefinition(bucket" in plan, plan
    # exactly one SinglePartition exchange -- the 256-row offset cumsum,
    # never the documents table itself
    assert plan.count("SinglePartition") == 1, plan
