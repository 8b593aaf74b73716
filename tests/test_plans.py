"""Physical-plan assertions — the 100 TB design contract, checked on the
actual Catalyst output (SURVEY.md §4): pushdown reaches the scan, small
dims broadcast, top-k never global-sorts, partitioned reads prune."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_aws_spark.queries.joins import join_broadcast, join_multiway
from serverless_etl_aws_spark.queries.relational import filter_pred, project_rename
from serverless_etl_aws_spark.queries.sorts_sets import sort_limit


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = formatted(filter_pred(spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_column_pruning(spark, sf_dir):
    plan = formatted(project_rename(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_extendedprice" in read_schema
    # untouched wide columns must not be read
    assert "l_shipdate" not in read_schema
    assert "l_returnflag" not in read_schema


def test_broadcast_join_chosen(spark, sf_dir):
    plan = plan_of(join_broadcast(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_multiway_dims_broadcast(spark, sf_dir):
    plan = plan_of(join_multiway(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


def test_sort_limit_is_top_k_not_global_sort(spark, sf_dir):
    plan = plan_of(sort_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_partitioned_readback_prunes(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(
        str(tmp_path / "part_out")
    )
    back = spark.read.parquet(str(tmp_path / "part_out")).filter(
        F.col("l_returnflag") == "R"
    )
    plan = formatted(back.select(F.count(F.lit(1))))
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "l_returnflag" in pf


def test_agg_has_partial_aggregation(spark, sf_dir):
    """Map-side combine: two HashAggregate nodes around the exchange."""
    from serverless_etl_aws_spark.queries.aggregates import agg_group

    plan = plan_of(agg_group(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_covers_scan_filter(spark, sf_dir):
    plan = plan_of(filter_pred(spark, sf_dir))
    # "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert "*(1)" in plan or "WholeStageCodegen" in plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """With broadcast off (the 100 TB fact⋈fact regime), same-bucketed
    tables sort-merge-join with zero Exchange on either side."""
    from serverless_etl_aws_spark.operators.skew import bucketed_join
    from serverless_etl_aws_spark.queries.extras import join_bucketed

    join_bucketed(spark, sf_dir)  # writes + registers the bucketed tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(
            bucketed_join(
                spark, "orders_b", "customer_b", "o_custkey", "c_custkey"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_no_cartesian_product_in_registry(spark, sf_dir):
    """No registry key may plan a CartesianProduct: every cross join in
    the tree must be a broadcast of a tiny side. Guards future rounds
    against silently regressing a join into an all-pairs plan."""
    from serverless_etl_aws_spark.queries import build_registry

    offenders = []
    for key, q in build_registry().items():
        df = q.fn(spark, sf_dir)
        if "CartesianProduct" in plan_of(df):
            offenders.append(key)
    assert offenders == []


def test_knn_join_probes_broadcast_no_corpus_shuffle(spark, sf_dir):
    """llm_knn_join's scale contract: probes broadcast (scoring is
    map-side), and the only exchanges move the partial top-k structs —
    the scored corpus×probes product itself never shuffles (no Exchange
    below the first aggregate)."""
    from serverless_etl_aws_spark.queries.extras3 import llm_knn_join

    plan = plan_of(llm_knn_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # exchanges exist only above partial aggregation: every Exchange line
    # must sit above the first HashAggregate/ObjectHashAggregate
    first_agg = min(
        i for i, line in enumerate(plan.splitlines())
        if "Aggregate" in line
    )
    for i, line in enumerate(plan.splitlines()):
        if "Exchange" in line and "Broadcast" not in line:
            assert i < first_agg or any(
                "Aggregate" in l for l in plan.splitlines()[i:]
            ), plan


def test_compaction_plan_has_no_shuffle(spark, sf_dir):
    """The compaction rewrite must be coalesce (merge in place), never a
    full exchange: read fragmented → coalesce(n) plans zero Exchange."""
    from serverless_etl_aws_spark.queries.extras3 import (
        SCRATCH,
        maintenance_compact,
    )
    import os

    maintenance_compact(spark, sf_dir).collect()  # stages the scratch dirs
    frag = spark.read.parquet(
        os.path.join(SCRATCH, "maintenance_compact", "fragmented")
    )
    plan = plan_of(frag.coalesce(1))
    assert "Exchange" not in plan, plan


def test_dq_expectations_single_pass_per_table(spark, sf_dir):
    """All lineitem rules must evaluate in one scan: the plan reads the
    lineitem parquet exactly once (plus one scan for the distinct-key
    rule's aggregate — same scan node, so ≤ 2 file scans total), and
    events exactly once."""
    from serverless_etl_aws_spark.queries.extras3 import dq_expectations

    plan = plan_of(dq_expectations(spark, sf_dir))
    assert plan.count("lineitem.parquet") <= 2, plan
    assert plan.count("events.parquet") <= 1, plan
