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


def walk_plan(jnode):
    """Depth-first walk of a JVM SparkPlan tree, yielding each node.
    Descends through AQE wrappers: AdaptiveSparkPlanExec holds its live
    plan behind ``executedPlan()``, query-stage nodes behind ``plan()`` —
    ``children()`` is empty on both, so a naive walk sees one node."""
    yield jnode
    name = jnode.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from walk_plan(jnode.executedPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from walk_plan(jnode.plan())
        return
    children = jnode.children()
    for i in range(children.size()):
        yield from walk_plan(children.apply(i))


def node_name(jnode) -> str:
    return jnode.getClass().getSimpleName()


def test_knn_join_probes_broadcast_no_corpus_shuffle(spark, sf_dir):
    """llm_knn_join's scale contract: probes broadcast (scoring is
    map-side), and the only shuffles move partial top-k aggregates —
    structurally, EVERY non-broadcast Exchange in the tree must have a
    partial aggregate somewhere in its subtree (i.e. rows are aggregated
    before they shuffle; the scored corpus×probes product itself never
    moves)."""
    from serverless_etl_aws_spark.queries.extras3 import llm_knn_join

    root = llm_knn_join(spark, sf_dir)._jdf.queryExecution().executedPlan()
    names = [node_name(n) for n in walk_plan(root)]
    assert any("Broadcast" in n and "Join" in n for n in names), names
    agg_names = ("HashAggregateExec", "ObjectHashAggregateExec",
                 "SortAggregateExec")
    assert any(n in agg_names for n in names), (
        f"plan has no aggregate node at all: {names}"
    )
    for node in walk_plan(root):
        name = node_name(node)
        if "Exchange" in name and "Broadcast" not in name:
            subtree = [node_name(c) for c in walk_plan(node)]
            assert any(n in agg_names for n in subtree[1:]), (
                f"{name} shuffles un-aggregated rows; subtree: {subtree}"
            )


def test_aqe_skew_join_splits_partitions(spark, sf_dir):
    """The 100 TB skew story leans on AQE's skew-join (ARCHITECTURE.md):
    prove it actually fires. A join with one hot key, run under AQE with
    broadcast disabled and test-sized skew thresholds, must mark the
    sort-merge join skew-handled (``skew=true``) — i.e. the oversized
    shuffle partition was split at runtime rather than landing on one
    task. Manual salting (join_salted, queries/extras.py) remains the
    belt-and-suspenders path; this pins the automatic one."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8k",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one hot key (~90% of rows) with an incompressible payload so the
        # hot shuffle partition's bytes clear the skew threshold. The
        # aggregate must CONSUME the payload (sum of lengths): skew
        # detection reads compressed map-output sizes, and a count(1)
        # would prune the payload out of the shuffle, leaving a hot
        # partition of identical keys that lz4 flattens below threshold.
        left = (
            spark.range(120_000)
            .withColumn(
                "k", F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(
                    (F.col("id") % 97) + 1
                )
            )
            .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
        )
        right = spark.range(98).withColumnRenamed("id", "k").withColumn(
            "tag", F.sha2(F.col("k").cast("string"), 256)
        )
        joined = left.join(right, "k").select(
            F.sum(F.length("payload")).alias("n")
        )
        joined.collect()  # AQE decides at runtime — must execute
        plan = plan_of(joined)
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # the AQEShuffleRead split marker
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_compaction_plan_has_no_shuffle(spark, sf_dir):
    """The compaction rewrite must be coalesce (merge in place), never a
    full exchange: read fragmented → coalesce(n) plans zero Exchange."""
    from serverless_etl_aws_spark.queries.extras3 import maintenance_compact

    maintenance_compact(spark, sf_dir).collect()  # stages the scratch dirs
    # the staging dir this call actually produced (deterministic hook;
    # globbing fragmented_* could pick a stale copy — ADVICE r14)
    frag_dir = maintenance_compact.last_frag_dir
    frag = spark.read.parquet(frag_dir)
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


def test_merge_schema_scan_keeps_pushdown(spark, sf_dir):
    """Schema evolution must not cost the scan its pushdown: a filter over
    the drifted multi-file read still reaches the parquet scan as a
    PushedFilter (a normalization layer done with UDFs or per-file unions
    would silently lose this)."""
    from serverless_etl_aws_spark.queries.relational import scan_merge_schema

    df = scan_merge_schema(spark, sf_dir).filter(
        F.col("o_totalprice") > 100000.0
    )
    plan = formatted(df)
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "o_totalprice" in pushed, plan


def test_zorder_layout_enables_file_pruning(spark, sf_dir):
    """The Z-order rewrite's whole point is that parquet footer min/max
    stats skip most files for a 2-D box predicate. Verify from the actual
    written footers: the fraction of files whose (l_orderkey, l_partkey)
    zones overlap the verification box must be well under 100% — a
    single-column sort or random layout would overlap on nearly every
    file for the second dimension."""
    import glob
    import os

    import pyarrow.parquet as pq

    from serverless_etl_aws_spark.queries.extras5 import (
        SCRATCH,
        maintenance_zorder,
    )

    maintenance_zorder(spark, sf_dir).collect()
    files = sorted(
        glob.glob(os.path.join(SCRATCH, "maintenance_zorder", "*.parquet"))
    )
    assert len(files) >= 8, files

    ok_lo = ok_hi = pk_lo = pk_hi = None
    zones = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        o0 = p0 = None
        o1 = p1 = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name == "l_orderkey":
                    o0 = c.statistics.min if o0 is None else min(o0, c.statistics.min)
                    o1 = c.statistics.max if o1 is None else max(o1, c.statistics.max)
                elif name == "l_partkey":
                    p0 = c.statistics.min if p0 is None else min(p0, c.statistics.min)
                    p1 = c.statistics.max if p1 is None else max(p1, c.statistics.max)
        zones.append((o0, o1, p0, p1))
        ok_lo = o0 if ok_lo is None else min(ok_lo, o0)
        ok_hi = o1 if ok_hi is None else max(ok_hi, o1)
        pk_lo = p0 if pk_lo is None else min(pk_lo, p0)
        pk_hi = p1 if pk_hi is None else max(pk_hi, p1)

    # The verification box from maintenance_zorder: lower-left quadrant.
    ok_mid = (ok_lo + ok_hi) // 2
    pk_mid = (pk_lo + pk_hi) // 2
    overlapping = sum(
        1
        for (o0, o1, p0, p1) in zones
        if o0 <= ok_mid and p0 <= pk_mid  # zone intersects the box
    )
    # A quarter-space box against a Z-ordered layout should prune at
    # least ~40% of files; random/1-D layouts overlap ~100%.
    assert overlapping <= 0.6 * len(files), (overlapping, len(files), zones)


def test_ts_resample_spine_join_broadcasts(spark, sf_dir):
    """The calendar-spine left join must build on the broadcast daily
    aggregate (O(days x types)), never shuffle the spine against it as
    a sort-merge join."""
    from serverless_etl_aws_spark.queries.extras5 import ts_resample

    plan = plan_of(ts_resample(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """join_dpp's contract IS the plan: the partitioned fact scan must
    carry a dynamicpruningexpression in its PartitionFilters (runtime
    reuse of the broadcast dim as a partition filter). Without it the
    key still returns correct rows - by reading every partition."""
    from serverless_etl_aws_spark.queries.extras6 import join_dpp

    df = join_dpp(spark, sf_dir)
    plan = formatted(df)
    assert "dynamicpruning" in plan.lower(), plan


def test_curation_pipeline_reads_corpus_once(spark, sf_dir):
    """llm_curation_pipeline's selling point is the fused plan: quality
    gate, fingerprint dedup, rebalance and split must ride ONE scan of
    the documents table (a job-per-step pipeline reads it three times)."""
    from serverless_etl_aws_spark.queries.extras6 import llm_curation_pipeline

    plan = plan_of(llm_curation_pipeline(spark, sf_dir))
    assert plan.count("documents.parquet") == 1, plan


def test_triangles_reuse_edge_list_no_repeat_fact_join(spark, sf_dir):
    """graph_triangles' three-way self-join must run on the checkpointed
    edge list (RDD scans), never re-derive the 4-way fact join per side —
    at 100 TB that would triple the most expensive stage."""
    from serverless_etl_aws_spark.queries.extras7 import graph_triangles

    plan = plan_of(graph_triangles(spark, sf_dir))
    assert "FileScan" not in plan, plan
    assert plan.count("Scan ExistingRDD") == 3, plan


def test_linreg_aggregates_partially(spark, sf_dir):
    """ml_linreg's sufficient statistics must ride map-side partial
    aggregation (partial + final HashAggregate pairs) so shuffle volume
    is O(groups), not O(rows)."""
    from serverless_etl_aws_spark.queries.extras7 import ml_linreg

    plan = plan_of(ml_linreg(spark, sf_dir))
    assert plan.count("HashAggregate") >= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_winnow_single_scan_intra_doc_windows(spark, sf_dir):
    """llm_winnow_fingerprint must read documents exactly once and keep
    the window work partitioned by doc_id — no cross-document shuffle
    beyond the doc_id hash partitioning."""
    from serverless_etl_aws_spark.queries.extras7 import llm_winnow_fingerprint

    plan = plan_of(llm_winnow_fingerprint(spark, sf_dir))
    assert plan.count("FileScan") == 1, plan
    assert "hashpartitioning(doc_id" in plan, plan


def test_interpolate_spine_join_broadcasts(spark, sf_dir):
    """ts_interpolate shares ts_resample's contract: the daily aggregate
    broadcasts into the spine join; the neighbor windows then run without
    re-shuffling."""
    from serverless_etl_aws_spark.queries.extras7 import ts_interpolate

    plan = plan_of(ts_interpolate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_interval_overlap_is_equi_join_not_nested_loop(spark, sf_dir):
    """join_interval_overlap exists to replace the theta-join plan: the
    bin-bucketed formulation must join on the bin as an equi-join —
    a BroadcastNestedLoopJoin/CartesianProduct here means the rewrite
    regressed to the O(n*m) comparison it was built to avoid."""
    from serverless_etl_aws_spark.queries.extras8 import join_interval_overlap

    plan = plan_of(join_interval_overlap(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_rolling_zscore_two_exchanges_max(spark, sf_dir):
    """ts_rolling_zscore is one aggregation shuffle plus one window
    re-partition at most; the windowed sufficient statistics must not
    introduce further exchanges."""
    from serverless_etl_aws_spark.queries.extras8 import ts_rolling_zscore

    plan = plan_of(ts_rolling_zscore(spark, sf_dir))
    assert plan.count("Exchange") <= 2, plan


def test_paragraph_dedup_boilerplate_moves_hashes_not_text(spark, sf_dir):
    """The boilerplate decision must shuffle only the 128-bit segment
    hash: the groupBy that counts distinct docs per segment reads (h,
    doc_id), and the segment text re-joins via anti-join afterwards. A
    plan that grouped by the raw segment string would shuffle the corpus
    text twice."""
    from serverless_etl_aws_spark.queries.extras11 import llm_paragraph_dedup

    plan = plan_of(llm_paragraph_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the distinct-docs count partial-aggregates before its exchange
    assert "partial_count(distinct" in plan or "partial_merge" in plan


def test_heavy_hitters_candidates_and_total_broadcast(spark, sf_dir):
    """Phase-2 exact verify joins the token stream against the sketch's
    candidate list and the 1-row total — BOTH must broadcast; shuffling
    the token stream to meet a ≤K×partitions candidate list would defeat
    the sketch."""
    from serverless_etl_aws_spark.queries.extras11 import agg_heavy_hitters

    plan = plan_of(agg_heavy_hitters(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total crossJoin
    assert "CartesianProduct" not in plan


def test_analyze_split_keeps_minmax_in_codegen(spark, sf_dir):
    """maintenance_analyze's design point: string min/max must NOT ride
    the Expand-based multi-distinct aggregate (interpreted fallback,
    measured 5x slower) — the plan carries a separate codegen'd scan
    pass joined 1x1."""
    from serverless_etl_aws_spark.queries.extras11 import maintenance_analyze

    plan = plan_of(maintenance_analyze(spark, sf_dir))
    assert "Expand" in plan                      # the NDV pass
    assert "BroadcastNestedLoopJoin" in plan     # the 1x1 join
    # min/max partials live in the non-Expand aggregate
    head = plan.split("Expand")[0]
    assert "partial_min" in head or "min(" in head


def test_ewma_single_window_exchange(spark, sf_dir):
    """One shuffle (the user_id window partition), no Python: the fold
    over the frame list is a JVM higher-order aggregate."""
    from serverless_etl_aws_spark.queries.extras11 import ts_ewma

    plan = plan_of(ts_ewma(spark, sf_dir))
    assert plan.count("Exchange") <= 2  # window hash partitioning (+AQE read)
    assert "Python" not in plan
    assert "Window" in plan


def test_random_projection_has_no_exchange(spark, sf_dir):
    """JL projection is a pure map pass: no shuffle, no Python — four
    sequential JVM folds over the vector column."""
    from serverless_etl_aws_spark.queries.extras12 import ml_random_projection

    plan = plan_of(ml_random_projection(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_atomic_table_read_is_partitioned_parquet_scan(spark, sf_dir):
    """Reading a snapshot table is one multi-path parquet scan with
    partition discovery — the same plan family as any partitioned table,
    not a union of per-partition scans."""
    from serverless_etl_aws_spark.queries.extras12 import scan_atomic_table

    plan = plan_of(scan_atomic_table(spark, sf_dir))
    assert "Union" not in plan
    assert plan.count("FileScan parquet") == 1


def test_lateral_join_decorrelates_to_group_limit(spark, sf_dir):
    """The correlated LATERAL ORDER BY ... LIMIT must decorrelate into a
    per-group top-k (WindowGroupLimit) + hash join — executing the
    subquery once per outer row (nested loop / cartesian) would be
    O(outer × inner) and is the plan the key exists to rule out."""
    from serverless_etl_aws_spark.queries.extras13 import join_lateral

    plan = plan_of(join_lateral(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the inner side is globally-unsorted: top-k per group, never a full sort
    assert "Sort [c_acctbal" not in plan.split("Exchange")[0]


def test_gap_detect_single_exchange(spark, sf_dir):
    """Gap detection is ONE window pass: exactly one shuffle (the
    user_id window partition), gap arithmetic stays in the projection."""
    from serverless_etl_aws_spark.queries.extras13 import ts_gap_detect

    plan = plan_of(ts_gap_detect(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_ngram_novelty_shares_one_shingle_explode(spark, sf_dir):
    """The shingle relation feeds both the df-count build side and the
    score join probe side from ONE materialization (localCheckpoint) —
    without it the corpus-wide split+explode executes twice."""
    from serverless_etl_aws_spark.queries.extras13 import llm_ngram_novelty

    plan = plan_of(llm_ngram_novelty(spark, sf_dir))
    # after the checkpoint, the executed plan scans the checkpointed RDD,
    # not the parquet, and contains no explode at all
    assert plan.count("Generate explode") == 0
    assert "Scan ExistingRDD" in plan


def test_prefix_dedup_hot_blocks_broadcast(spark, sf_dir):
    """The cold-block frequency stop joins as a BROADCAST (the block
    list is cap-bounded small), and the pair join is an equi-join on the
    block key — no nested loop anywhere in the plan."""
    from serverless_etl_aws_spark.queries.extras13 import llm_prefix_dedup

    plan = plan_of(llm_prefix_dedup(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_agg_corr_single_aggregate_pass(spark, sf_dir):
    """All five decimal moments come out of ONE partial+final aggregate
    over one scan — a formulation that re-scanned per moment would show
    multiple FileScans."""
    from serverless_etl_aws_spark.queries.extras13 import agg_corr

    plan = plan_of(agg_corr(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_scene_cut_is_single_map_pass(spark, sf_dir):
    """Scene detection is payload-local: one scan, one mapInPandas, zero
    shuffles (frame pairs never leave their payload's partition)."""
    from serverless_etl_aws_spark.queries.extras13 import mm_scene_cut

    plan = plan_of(mm_scene_cut(spark, sf_dir))
    assert "Exchange" not in plan


def test_runtime_bloom_filter_injected_on_selective_shuffle_join(spark, sf_dir):
    """The 100 TB shuffle-join accelerator, PROVEN not assumed: when the
    build side of a fact⋈fact join is selective and broadcast is off,
    Catalyst builds a bloom filter over the build-side keys
    (`bloom_filter_agg`) and injects `might_contain` into the fact
    side's scan filter — most fact rows are dropped before the shuffle.
    Config thresholds are scoped and restored."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = plan_of(j)
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_sample_weighted_is_shuffle_free_filter(spark, sf_dir):
    """Weighted sampling is a pure row-local predicate: the integer coin
    and threshold evaluate inside the scan stage — the plan must contain
    NO Exchange at all (the property that lets it compose with any
    downstream pipeline for free at 100 TB)."""
    from serverless_etl_aws_spark.queries.extras14 import sample_weighted

    plan = plan_of(sample_weighted(spark, sf_dir))
    assert "Exchange" not in plan
    assert plan.count("FileScan parquet") == 1


def test_agg_mode_windows_over_counts_not_events(spark, sf_dir):
    """The mode pick runs over the (day, type) COUNT relation, never the
    raw events: one count shuffle + one day-window shuffle, one scan —
    a formulation that windowed the fact table itself would sort events
    per day for no reason."""
    from serverless_etl_aws_spark.queries.extras14 import agg_mode

    plan = plan_of(agg_mode(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("FileScan parquet") == 1


def test_rolling_median_single_window_pass(spark, sf_dir):
    """The rolling median is ONE window pass (one shuffle on the
    partition key); the frame sort/pick is per-row projection work, not
    an extra exchange or join."""
    from serverless_etl_aws_spark.queries.extras14 import win_rolling_median

    plan = plan_of(win_rolling_median(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_ts_seasonal_single_fact_pass_broadcast_rejoin(spark, sf_dir):
    """The seasonal profile reads and shuffles the fact table ONCE: the
    overall means re-aggregate the checkpointed slot moments (decimal,
    so reduction order is immaterial), and the rejoin broadcasts the
    #types-sized frame — the executed plan scans the checkpoint RDD, no
    second parquet scan, no sort-merge join."""
    from serverless_etl_aws_spark.queries.extras14 import ts_seasonal

    plan = plan_of(ts_seasonal(spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert plan.count("FileScan parquet") == 0
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ts_cusum_one_shuffle_two_stacked_windows(spark, sf_dir):
    """The CUSUM recursion is eliminated into a running sum + a running
    min of that sum: two Window nodes over the SAME partitioning and
    ordering — the executed plan must contain exactly one Exchange and
    no join (the drawdown identity keeps the detector embarrassingly
    partition-parallel)."""
    from serverless_etl_aws_spark.queries.extras15 import ts_cusum

    plan = plan_of(ts_cusum(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_ts_autocorr_agg_reuses_window_partitioning(spark, sf_dir):
    """The moment aggregate groups by the lag window's own partition key
    (event_type), so Catalyst plans NO second exchange: one shuffle
    total for lag + exact-moment corr."""
    from serverless_etl_aws_spark.queries.extras15 import ts_autocorr

    plan = plan_of(ts_autocorr(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan parquet") == 1


def test_naive_bayes_single_corpus_pass_no_smj(spark, sf_dir):
    """The NB trainer tokenizes the corpus ONCE (checkpointed doc-level
    relation feeds token counts AND class priors — the executed plan
    reads ExistingRDD only, zero parquet re-scans), and every model
    aggregate runs over the (lang, term) count relation; the 1-row
    totals ride in as broadcasts — no sort-merge join, no cartesian."""
    from serverless_etl_aws_spark.queries.extras15 import ml_naive_bayes

    plan = plan_of(ml_naive_bayes(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_collocations_single_tokenize_no_smj(spark, sf_dir):
    """Collocation mining materializes per-doc token arrays once; the
    unigram and bigram counts both explode that checkpointed relation
    (zero parquet scans in the executed plan), and the bigram groupBy
    keys on the flat 'a b' gram string split only AFTER the support
    filter."""
    from serverless_etl_aws_spark.queries.extras15 import llm_collocations

    plan = plan_of(llm_collocations(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_drawdown_one_shuffle_three_windows(spark, sf_dir):
    """Running max, drawdown projection, and the argmax row_number are
    window passes over the SAME user_id partitioning: one Exchange, no
    join — the second ordering adds an in-partition sort only."""
    from serverless_etl_aws_spark.queries.extras16 import win_drawdown

    plan = plan_of(win_drawdown(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_skew_kurt_single_partial_agg_shuffle(spark, sf_dir):
    """The four decimal power sums are one map-side-combinable groupBy:
    exactly one Exchange, one scan, no join — the moment combination is
    projection work on the 5-row aggregate."""
    from serverless_etl_aws_spark.queries.extras16 import agg_skew_kurt

    plan = plan_of(agg_skew_kurt(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_pareto_one_shuffle_exact_decimal_crossing(spark, sf_dir):
    """Rank, running sum, and the partition totals share one event_type
    shuffle, and the 80% crossing predicate is a decimal-times-integer
    comparison evaluated in-partition — one Exchange, no join."""
    from serverless_etl_aws_spark.queries.extras16 import win_pareto

    plan = plan_of(win_pareto(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_degree_dist_equi_join_no_cartesian(spark, sf_dir):
    """The adjacency comes from the session-memoized shared relation
    (_util.co_order_part_adj): the consumer plan reads the materialized
    checkpoint (zero fact scans here — the one-time build is an
    equi-join on orderkey, asserted below), and the histogram aggregates
    run over node-sized relations."""
    from serverless_etl_aws_spark.queries.extras16 import graph_degree_dist

    plan = plan_of(graph_degree_dist(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # consumer reads the shared checkpoint, not the fact table
    assert plan.count("FileScan parquet") == 0
    assert plan.count("Scan ExistingRDD") == 1
    assert plan.count("Exchange hashpartitioning") <= 3

    # the one-time build behind the memo is an equi-join on orderkey
    from serverless_etl_aws_spark.queries._util import co_order_part_adj_plan

    build = plan_of(co_order_part_adj_plan(spark, sf_dir))
    assert "CartesianProduct" not in build
    assert "BroadcastNestedLoopJoin" not in build
    assert build.count("FileScan parquet") == 2  # the self-join's two scans


def test_benford_no_join_single_count_shuffle(spark, sf_dir):
    """The Benford audit scans the corpus ONCE: one 9-group count, a
    grand total as a window over that 9-row relation (a second
    aggregation branch would duplicate the scan subtree), and the
    expectation as a CASE projection of compile-time literals — no join
    of any kind."""
    from serverless_etl_aws_spark.queries.extras17 import dq_benford

    plan = plan_of(dq_benford(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_hhi_two_tier_aggregate(spark, sf_dir):
    """HHI re-aggregates the (day, type) count relation — two
    map-side-combinable shuffles, one scan, no join (the same two-tier
    shape as agg_gini/agg_mode)."""
    from serverless_etl_aws_spark.queries.extras17 import agg_hhi

    plan = plan_of(agg_hhi(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_retention_windows_ride_collapsing_relations(spark, sf_dir):
    """Cohort retention scans the corpus ONCE; every later exchange
    moves a collapsing relation (user-days, then cohort cells). The
    cohort-size share is a window over the cells — a join back to an
    offset-0 aggregate would add a duplicate aggregation branch."""
    from serverless_etl_aws_spark.queries.extras18 import win_retention

    plan = plan_of(win_retention(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert plan.count("Window") == 2


def test_auc_prefix_sum_over_buckets_not_corpus(spark, sf_dir):
    """The exact AUC's only corpus-sized movement is the map-side
    combinable bucket count (ONE hash exchange); the ordered prefix-sum
    window and the final 1-row aggregate run on the bucket relation
    (single-partition exchange moves buckets, not rows). No join, no
    global sort of the corpus."""
    from serverless_etl_aws_spark.queries.extras18 import ml_auc

    plan = plan_of(ml_auc(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_profile_split_passes_keep_codegen(spark, sf_dir):
    """The column profiler takes the maintenance_analyze shape: the
    Expand-based exact multi-distinct runs ALONE, counts/min/max take a
    separate single-scan pass, and the two single-row results meet in a
    1×1 join. The codegen-critical path is the EXPAND chain — it
    processes 6×N expanded rows, and folding string min/max into it is
    the measured 4.5×-at-10× cliff (interpreted fallback over expanded
    rows). Executed so AQE finalizes and the ``*(n)`` codegen markers
    appear; then assert (a) no min/max partial rides the Expand side and
    (b) the Expand and its dedup HashAggregate sit inside a
    WholeStageCodegen span — the regression the split exists to
    prevent cannot silently return."""
    from serverless_etl_aws_spark.queries.extras18 import dq_profile

    df = dq_profile(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("FileScan parquet") == 2
    assert plan.count("Expand") == 1
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    # the Expand (NDV) branch hangs under the BroadcastExchange; string
    # extrema must stay on the stats branch
    ndv_side = plan.split("BroadcastExchange", 1)[1]
    assert "partial_min" not in ndv_side and "partial_max" not in ndv_side

    df.collect()  # AQE must finalize for codegen stars to print
    # keep only the "== Final Plan ==" section — the Initial Plan echo
    # below it prints the same operators without codegen stars
    final = plan_of(df).split("== Initial Plan ==")[0]
    assert "== Final Plan ==" in final
    import re

    expand_line = next(
        ln for ln in final.splitlines() if "Expand [" in ln
    )
    assert re.search(r"\*\(\d+\) Expand", expand_line), expand_line
    # the expanded-rows dedup aggregate (keys include gid) is the hot
    # operator — it must carry a codegen star too
    hot_aggs = [
        ln for ln in final.splitlines()
        if "HashAggregate(keys=[" in ln and "gid" in ln
    ]
    assert hot_aggs and all(
        re.search(r"\*\(\d+\) HashAggregate", ln) for ln in hot_aggs
    ), "\n".join(hot_aggs)


def test_jaccard_checkpointed_edges_broadcast_degrees(spark, sf_dir):
    """The Jaccard similarity materializes the distinct edge relation
    once (localCheckpoint) for its four consumers — without it Catalyst
    duplicates the subtree into four full fact scans. Degrees are
    node-sized and broadcast; the pair join is the per-part
    posting-list equi-join, never a cartesian."""
    from serverless_etl_aws_spark.queries.extras18 import graph_jaccard

    plan = plan_of(graph_jaccard(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0  # all reads hit the checkpoint
    assert plan.count("Scan ExistingRDD") == 4
    assert plan.count("BroadcastHashJoin") == 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_eval_keys_single_scan_single_shuffle(spark, sf_dir):
    """ml_confusion / ml_calibration / ml_chi2 each scan the corpus ONCE
    and shuffle ONCE (the score-bucket / bin / contingency groupBy —
    map-side combinable); thresholds, base rates and row/col totals are
    windows over the bucket-sized relation, never a join or a second
    aggregation branch."""
    from serverless_etl_aws_spark.queries.extras19 import (
        ml_calibration,
        ml_chi2,
        ml_confusion,
    )

    for fn in (ml_confusion, ml_calibration, ml_chi2):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("FileScan parquet") == 1, fn.__name__
        assert plan.count("Exchange hashpartitioning") == 1, fn.__name__
        assert "Join" not in plan, fn.__name__


def test_trend_mk_pair_join_on_materialized_daily_relation(spark, sf_dir):
    """ts_trend_mk collapses the corpus to the (type, day, count)
    relation once and materializes it — its three consumers (both pair
    join sides, tie histogram) must NOT each re-scan the corpus (the
    duplicate-subtree class the ml_naive_bayes checkpoint fixed). The
    pair join is an equi-join on event_type over the day-sized
    relation."""
    from serverless_etl_aws_spark.queries.extras19 import ts_trend_mk

    plan = plan_of(ts_trend_mk(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0  # daily is checkpointed
    assert plan.count("Scan ExistingRDD") == 3  # its three consumers
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_referential_audit_broadcasts_parent_keys(spark, sf_dir):
    """dq_referential: per FK edge the child collapses to a (key, count)
    relation (map-side combinable) and LEFT-joins the parent's distinct
    keys as a BROADCAST — the parent side is dimension-sized; nothing
    row-sized crosses a second shuffle and no edge degenerates into a
    nested-loop."""
    from serverless_etl_aws_spark.queries.extras19 import dq_referential

    plan = plan_of(dq_referential(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 4  # one per FK edge
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stump_and_ks_single_scan_topk(spark, sf_dir):
    """ml_stump / agg_ks_test: one corpus scan, one map-side-combinable
    bucket shuffle, windows + impurity/gap arithmetic on the bucket
    relation, and the argmin/argmax is TakeOrderedAndProject (top-1),
    never a global sort of data. No join anywhere."""
    from serverless_etl_aws_spark.queries.extras20 import (
        agg_ks_test,
        ml_stump,
    )

    for fn in (ml_stump, agg_ks_test):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("FileScan parquet") == 1, fn.__name__
        assert plan.count("Exchange hashpartitioning") == 1, fn.__name__
        assert "TakeOrderedAndProject" in plan, fn.__name__
        assert "Join" not in plan, fn.__name__


def test_vocab_growth_two_shuffles_no_join(spark, sf_dir):
    """llm_vocab_growth: the shingle explode shuffles ONCE (the
    map-side-combinable gram→MIN(doc_id) groupBy); the checkpoint
    histogram is the only other exchange, over the vocabulary-sized
    first-occurrence relation. No join, one corpus scan."""
    from serverless_etl_aws_spark.queries.extras20 import llm_vocab_growth

    plan = plan_of(llm_vocab_growth(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_kcore_rounds_read_checkpoints_only(spark, sf_dir):
    """graph_kcore: at this fixture the peel reaches its fixpoint in
    round 1 (no node is under the degree floor), so the visible plan is
    a bare projection over that round's NODE-sized degree checkpoint —
    zero fact scans at the consumer (the shared adjacency build is the
    family's one-time cost) and zero exchanges (the degree hash
    exchange ran inside the checkpoint job; r15 fixpoint early-exit)."""
    from serverless_etl_aws_spark.queries.extras20 import graph_kcore

    plan = plan_of(graph_kcore(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("Scan ExistingRDD") == 1
    assert plan.count("Exchange") == 0
    assert "CartesianProduct" not in plan


def test_km_and_lag_collapse_before_windows(spark, sf_dir):
    """ml_survival_km / agg_conversion_lag: ONE corpus scan and one
    map-side-combinable per-user shuffle each; every window, fold and
    final aggregate runs on the collapsed user/duration relation —
    nothing row-sized crosses a second exchange, no join."""
    from serverless_etl_aws_spark.queries.extras21 import (
        agg_conversion_lag,
        ml_survival_km,
    )

    for fn in (ml_survival_km, agg_conversion_lag):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("FileScan parquet") == 1, fn.__name__
        assert "Join" not in plan, fn.__name__
        # user-collapse groupBy (+ KM's duration regroup); window
        # exchanges are single-partition, not hash
        assert plan.count("Exchange hashpartitioning") <= 2, fn.__name__


def test_winsorized_mean_one_rank_sort(spark, sf_dir):
    """agg_winsorized_mean: the rank window is the key's single per-type
    sort (exact order-statistic bounds — the documented audit path);
    one corpus scan, one hash exchange (the event_type partition both
    the window and the final groupBy reuse), no join."""
    from serverless_etl_aws_spark.queries.extras21 import (
        agg_winsorized_mean,
    )

    plan = plan_of(agg_winsorized_mean(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_assortativity_checkpointed_adjacency_broadcast_degrees(spark, sf_dir):
    """graph_assortativity is the fourth consumer of the session-shared
    co-order adjacency: every read must hit the checkpoint (zero fact
    re-scans), degrees are node-sized and broadcast into the edge
    relation, and the moment reduction is a single aggregate — no
    sort-merge shuffle of the edge list, no cartesian."""
    from serverless_etl_aws_spark.queries.extras22 import graph_assortativity

    plan = plan_of(graph_assortativity(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("Scan ExistingRDD") == 3  # edges + two degree builds
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_spc_windows_over_daily_counts_not_events(spark, sf_dir):
    """dq_spc collapses the corpus to the (type, day) count relation in
    one map-side-combinable shuffle; the moment windows and 3-sigma
    limits run on that days-sized relation (second, bounded exchange).
    No join — limits are windows, not a stats-relation rejoin."""
    from serverless_etl_aws_spark.queries.extras22 import dq_spc

    plan = plan_of(dq_spc(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_ndcg_single_user_shuffle(spark, sf_dir):
    """ml_ndcg ranks and aggregates inside ONE user_id exchange (the
    groupBy reuses the window's partitioning) and the discount weights
    are compile-time literals — no join, no second shuffle, nothing
    broadcast."""
    from serverless_etl_aws_spark.queries.extras22 import ml_ndcg

    plan = plan_of(ml_ndcg(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_phash_one_arrow_pass_one_signature_shuffle(spark, sf_dir):
    """mm_phash computes signatures in a single Arrow mapInPandas pass
    over one corpus scan; the collision count is one window exchange on
    the 64-bit hash. No join, no second Python stage."""
    from serverless_etl_aws_spark.queries.extras22 import mm_phash

    plan = plan_of(mm_phash(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("MapInPandas") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_clustering_coeff_array_intersect_no_wedge_shuffle(spark, sf_dir):
    """graph_clustering_coeff must count triangles via broadcast
    out-neighbor arrays (array_intersect per edge) — never by
    materializing the wedge stream through an exchange. All reads hit
    checkpoints (shared adjacency + the materialized oriented edges);
    the node-sized out-lists and final triangle counts broadcast; no
    sort-merge join, no cartesian."""
    from serverless_etl_aws_spark.queries.extras23 import (
        graph_clustering_coeff,
    )

    plan = plan_of(graph_clustering_coeff(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lift_windows_over_buckets_not_events(spark, sf_dir):
    """ml_lift collapses the corpus to integer score buckets in ONE
    map-side-combinable shuffle; the cumulative/total windows run on
    the bucket relation. No join."""
    from serverless_etl_aws_spark.queries.extras23 import ml_lift

    plan = plan_of(ml_lift(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_holt_single_user_shuffle_no_python(spark, sf_dir):
    """ts_holt folds level+trend inside ONE user_id exchange (the
    collect_list window and the rn filter share the partitioning);
    the recursion is a JVM-side array fold — no Python stage, no
    join."""
    from serverless_etl_aws_spark.queries.extras23 import ts_holt

    plan = plan_of(ts_holt(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Python" not in plan  # no ArrowEval/MapInPandas fallback


def test_freshness_scalar_attach_broadcast(spark, sf_dir):
    """dq_freshness attaches the 1-row watermark via broadcast (the
    scalar-attach 1xN pattern) and aggregates per type in one
    map-side-combinable shuffle — the nested-loop join must be the
    1-row broadcast, never a shuffled join."""
    from serverless_etl_aws_spark.queries.extras23 import dq_freshness

    plan = plan_of(dq_freshness(spark, sf_dir))
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan


def test_pr_at_k_single_user_shuffle(spark, sf_dir):
    """ml_pr_at_k ranks and aggregates inside ONE user_id exchange —
    the groupBy reuses the row_number window's partitioning exactly
    like ml_ndcg (the pair must stay plan-identical in shape): no
    join, no second shuffle."""
    from serverless_etl_aws_spark.queries.extras24 import ml_pr_at_k

    plan = plan_of(ml_pr_at_k(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_modularity_checkpointed_adjacency_broadcast_brands(spark, sf_dir):
    """graph_modularity (sixth shared-adjacency consumer) must read
    the co-order adjacency from the session checkpoint (zero lineitem
    scans) and attach the brand map by BROADCAST on both endpoints —
    never shuffling the edge relation through a sort-merge join. The
    2m total is a window over the 25-community aggregate (the one
    SinglePartition exchange), not a second corpus pass."""
    from serverless_etl_aws_spark.queries.extras24 import graph_modularity

    plan = plan_of(graph_modularity(spark, sf_dir))
    scans = plan.count("FileScan parquet")
    assert scans == 2 and "lineitem" not in plan.lower().split(
        "filescan parquet"
    )[0], "adjacency must come from the checkpoint, brands from part"
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange SinglePartition") == 1


def test_ab_test_two_bounded_shuffles_no_join(spark, sf_dir):
    """ml_ab_test collapses events to per-user conversion flags in one
    map-side-combinable shuffle, then to 2 arm rows in a second; the
    z statistic is computed on a single 1-row aggregate — no join
    anywhere, nothing corpus-sized past the first exchange."""
    from serverless_etl_aws_spark.queries.extras24 import ml_ab_test

    plan = plan_of(ml_ab_test(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_simpson_broadcast_dims_two_bounded_shuffles(spark, sf_dir):
    """agg_simpson joins all three dimensions by BROADCAST onto the
    single fact scan and aggregates to (nation, type) counts in one
    map-side-combinable shuffle; the diversity index is a second
    aggregate over that <= nations*types relation. No sort-merge
    join, no third exchange."""
    from serverless_etl_aws_spark.queries.extras24 import agg_simpson

    plan = plan_of(agg_simpson(spark, sf_dir))
    assert plan.count("FileScan parquet") == 4
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_changepoint_single_user_shuffle_no_join(spark, sf_dir):
    """ts_changepoint's prefix/total/argmax windows all share the ONE
    user_id exchange (stacked sorts, no re-shuffle between the CUSUM
    computation and the argmax), and no join or Python stage appears —
    the argmax is exact-integer window arithmetic."""
    from serverless_etl_aws_spark.queries.extras25 import ts_changepoint

    plan = plan_of(ts_changepoint(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Python" not in plan


def test_spearman_collapse_then_one_nation_exchange(spark, sf_dir):
    """ml_spearman collapses orders to per-customer spend in one
    map-side-combinable shuffle; both rank windows share ONE nation
    exchange (2 exchanges total), and no cartesian appears. The
    spend/nation attach joins stay broadcast at test scale (AQE may
    legitimately pick a shuffled join at cluster scale — only the
    exchange and scan budget is pinned)."""
    from serverless_etl_aws_spark.queries.extras25 import ml_spearman

    plan = plan_of(ml_spearman(spark, sf_dir))
    assert plan.count("FileScan parquet") == 3
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan


def test_resource_alloc_checkpointed_edges_no_rescan(spark, sf_dir):
    """graph_resource_alloc (seventh shared-edge consumer) must build
    entirely from the session-materialized supplier-part edges — ZERO
    parquet scans — with the part-degree weights attached by broadcast
    before the pair join and the top-K window bounding the sink. No
    cartesian, no sort-merge join at test scale."""
    from serverless_etl_aws_spark.queries.extras25 import (
        graph_resource_alloc,
    )

    plan = plan_of(graph_resource_alloc(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("Exchange hashpartitioning") == 3
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_best_threshold_bucket_windows_no_join(spark, sf_dir):
    """ml_best_threshold shares ml_confusion's shape: one bucket
    collapse off the corpus, then the sweep + exact-integer argmax run
    on the bucket relation inside one SinglePartition window — no
    join, nothing corpus-sized past the first exchange."""
    from serverless_etl_aws_spark.queries.extras25 import (
        ml_best_threshold,
    )

    plan = plan_of(ml_best_threshold(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1
    assert "Join" not in plan


def test_theil_sen_days_relation_checkpointed_once(spark, sf_dir):
    """ts_theil_sen's O(D^2) pair join must run on the lazily
    checkpointed (type, day) relation — ONE corpus pass total, never a
    duplicated scan+agg subtree per self-join side (the ml_naive_bayes
    lineage-truncation pattern; without it the plan carried 2x
    FileScan). The rank window shares the type partitioning."""
    from serverless_etl_aws_spark.queries.extras26 import ts_theil_sen

    plan = plan_of(ts_theil_sen(spark, sf_dir))
    assert plan.count("FileScan parquet") <= 1
    assert "CartesianProduct" not in plan


def test_assoc_rules_shared_edges_distributed_topk(spark, sf_dir):
    """ml_assoc_rules builds entirely from the session-materialized
    order-part membership relation (zero parquet scans), attaches item
    supports by broadcast and the basket count as a 1-row
    scalar-attach, and bounds the sink with a DISTRIBUTED
    TakeOrderedAndProject — never a single-partition sort of the rule
    space."""
    from serverless_etl_aws_spark.queries.extras26 import ml_assoc_rules

    plan = plan_of(ml_assoc_rules(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("TakeOrderedAndProject") == 1
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row N attach
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_wilson_ci_one_shuffle_no_join(spark, sf_dir):
    """ml_wilson_ci is one map-side-combinable collapse to
    (type, n, s); the interval algebra runs on the types-sized
    relation — no join, no second exchange."""
    from serverless_etl_aws_spark.queries.extras26 import ml_wilson_ci

    plan = plan_of(ml_wilson_ci(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_uniqueness_one_key_shuffle_per_table_no_join(spark, sf_dir):
    """dq_uniqueness audits each declared key with exactly one
    count-shuffle on that table's own key (7 specs -> 7 scans, 7 hash
    exchanges), unioned — no join anywhere, so a 100 TB fact costs one
    shuffle, not a comparison against anything."""
    from serverless_etl_aws_spark.queries.extras26 import dq_uniqueness

    plan = plan_of(dq_uniqueness(spark, sf_dir))
    assert plan.count("FileScan parquet") == 7
    assert plan.count("Exchange hashpartitioning") == 7
    assert "Join" not in plan
    assert "Union" in plan


def test_iqr_outliers_quartiles_ride_rank_window(spark, sf_dir):
    """dq_iqr_outliers extracts both quartiles AND counts outliers
    inside the ONE event_type exchange (rank window + max-of-case +
    aggregate share the partitioning) — no self-join, no second scan,
    no float in the fences (doubled-integer comparisons)."""
    from serverless_etl_aws_spark.queries.extras27 import dq_iqr_outliers

    plan = plan_of(dq_iqr_outliers(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_calendar_generated_zero_io(spark, sf_dir):
    """dim_calendar is generated (sequence + explode): ZERO parquet
    scans, zero exchanges, no join — the dimension is minted, not
    derived."""
    from serverless_etl_aws_spark.queries.extras27 import dim_calendar

    plan = plan_of(dim_calendar(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("Exchange") == 0
    assert "Join" not in plan
    assert plan.count("Generate") == 1  # the explode


def test_feature_hash_pure_jvm_one_shuffle(spark, sf_dir):
    """ml_feature_hash must stay entirely JVM-side (md5/substring/conv
    inside codegen — NO Python stage) with one explode and one
    map-side-combinable (doc, dim) shuffle."""
    from serverless_etl_aws_spark.queries.extras27 import ml_feature_hash

    plan = plan_of(ml_feature_hash(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Generate") == 1
    assert "Python" not in plan
    assert "Join" not in plan


def test_ltv_cohort_single_scan_no_size_rejoin(spark, sf_dir):
    """ml_ltv_cohort reads the corpus ONCE: cohort sizes ride the same
    (cohort, age) aggregate as revenue (age-0 distinct count spread by
    a window) instead of a separate sizes relation rejoined — the
    duplicate-subtree trap the single-scan restructure removed."""
    from serverless_etl_aws_spark.queries.extras27 import ml_ltv_cohort

    plan = plan_of(ml_ltv_cohort(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_mrr_single_user_shuffle_one_row_out(spark, sf_dir):
    """ml_mrr ranks inside ONE user_id exchange (shared with the
    per-user collapse) and reduces to a single row via one
    SinglePartition aggregate — no join, nothing corpus-sized past the
    first exchange."""
    from serverless_etl_aws_spark.queries.extras28 import ml_mrr

    plan = plan_of(ml_mrr(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_tvd_one_collapse_windows_on_tiny_relation(spark, sf_dir):
    """dq_tvd_drift collapses the corpus to (type, day) counts in ONE
    map-side-combinable shuffle; the split-point min/max, half totals
    and TVD total are all windows over that tiny relation — no join,
    no second corpus pass for the midpoint."""
    from serverless_etl_aws_spark.queries.extras28 import dq_tvd_drift

    plan = plan_of(dq_tvd_drift(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_forecast_eval_lags_on_days_relation(spark, sf_dir):
    """ml_forecast_eval's lag windows and the per-type score aggregate
    run on the (type, day) relation, never the corpus: one corpus
    collapse, one type re-exchange, no join."""
    from serverless_etl_aws_spark.queries.extras28 import ml_forecast_eval

    plan = plan_of(ml_forecast_eval(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_reciprocity_broadcast_dims_two_bounded_shuffles(spark, sf_dir):
    """graph_reciprocity attaches every dimension by broadcast onto
    the fact join and collapses to directed nation pairs (<= 25*25
    rows) in one map-side-combinable shuffle; the unordered-pair
    regroup is the second, pair-sized exchange. No cartesian, no
    sort-merge join at test scale."""
    from serverless_etl_aws_spark.queries.extras28 import (
        graph_reciprocity,
    )

    plan = plan_of(graph_reciprocity(spark, sf_dir))
    assert plan.count("FileScan parquet") == 6
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_cramers_v_grid_windows_one_fact_shuffle(spark, sf_dir):
    """agg_cramers_v broadcasts the customer dim onto the orders scan
    and collapses to the <=5x5 contingency grid in ONE
    map-side-combinable shuffle; totals, category counts and the
    effect size all run on grid-sized relations."""
    from serverless_etl_aws_spark.queries.extras29 import agg_cramers_v

    plan = plan_of(agg_cramers_v(spark, sf_dir))
    assert plan.count("FileScan parquet") == 2
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan


def test_kendall_tau_pairs_on_checkpointed_days(spark, sf_dir):
    """ml_kendall_tau's O(D^2) pair join runs on the lazily
    checkpointed days relation (one corpus pass, zero duplicate scan
    subtrees); the non-equi day join is a broadcast nested loop over
    the calendar-bounded relation, never a cartesian of the corpus."""
    from serverless_etl_aws_spark.queries.extras29 import ml_kendall_tau

    plan = plan_of(ml_kendall_tau(spark, sf_dir))
    assert plan.count("FileScan parquet") <= 1
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan


def test_uplift_segments_collapse_then_pivot(spark, sf_dir):
    """ml_uplift_segments collapses to per-user flags in one
    map-side-combinable shuffle, then to 2x5 (arm, segment) cells,
    then the per-segment pivot — three bounded exchanges, no join."""
    from serverless_etl_aws_spark.queries.extras29 import (
        ml_uplift_segments,
    )

    plan = plan_of(ml_uplift_segments(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 3
    assert "Join" not in plan


def test_out_of_order_running_max_one_user_shuffle(spark, sf_dir):
    """dq_out_of_order is one user_id window shuffle (running integer
    max, O(1) state per row) plus one per-type collapse — no join, no
    self-comparison of the corpus."""
    from serverless_etl_aws_spark.queries.extras29 import dq_out_of_order

    plan = plan_of(dq_out_of_order(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_lorenz_global_rank_then_ten_rows(spark, sf_dir):
    """agg_lorenz collapses orders to per-customer spend in one
    map-side-combinable shuffle; the global rank runs in one ordered
    exchange (range-partitioned sort at cluster scale) and everything
    after is a 10-row relation. No join."""
    from serverless_etl_aws_spark.queries.extras30 import agg_lorenz

    plan = plan_of(agg_lorenz(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_embedding_audit_jvm_array_fold_one_shuffle(spark, sf_dir):
    """dq_embedding_audit folds norms inside JVM higher-order array
    functions (NO Python stage) with one per-label shuffle — the whole
    audit is a single pass over the vectors."""
    from serverless_etl_aws_spark.queries.extras30 import (
        dq_embedding_audit,
    )

    plan = plan_of(dq_embedding_audit(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan
    assert "Join" not in plan


def test_active_users_checkpointed_userday_no_rescan(spark, sf_dir):
    """ts_active_users derives DAU, WAU, new and cumulative actives
    from ONE lazily checkpointed user-day relation — zero parquet
    re-scans for the three consumers — and the WAU sliding distinct is
    the explode-by-offset linear pass, never a range self-join of the
    corpus (no cartesian; the only nested-loop is the 1-row span
    attach)."""
    from serverless_etl_aws_spark.queries.extras30 import ts_active_users

    plan = plan_of(ts_active_users(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_burstiness_two_bounded_shuffles(spark, sf_dir):
    """ts_burstiness is one corpus collapse to (type, day) counts and
    one per-type aggregate — two bounded exchanges, no join, no
    float until the two final divisions."""
    from serverless_etl_aws_spark.queries.extras30 import ts_burstiness

    plan = plan_of(ts_burstiness(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_temporal_integrity_one_fact_join_one_collapse(spark, sf_dir):
    """dq_temporal_integrity is one orderkey-grain join (broadcast at
    test scale; AQE-skew-split shuffle at cluster scale) and one
    map-side-combinable per-priority collapse — no cartesian, no
    second pass."""
    from serverless_etl_aws_spark.queries.extras31 import (
        dq_temporal_integrity,
    )

    plan = plan_of(dq_temporal_integrity(spark, sf_dir))
    assert plan.count("FileScan parquet") == 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_weighted_median_one_brand_window_shuffle(spark, sf_dir):
    """agg_weighted_median broadcasts the part dim onto the fact scan
    and runs BOTH the cumulative-weight window and the selection
    window inside ONE brand exchange — no re-shuffle between the
    cumsum and the pick."""
    from serverless_etl_aws_spark.queries.extras31 import (
        agg_weighted_median,
    )

    plan = plan_of(agg_weighted_median(spark, sf_dir))
    assert plan.count("FileScan parquet") == 2
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan


def test_diff_in_diff_one_user_shuffle_one_row(spark, sf_dir):
    """ml_diff_in_diff collapses to per-user (conv, first_day) in one
    shuffle; the midpoint, cells and the 1-row pivot all run on
    user-or-smaller relations. No join."""
    from serverless_etl_aws_spark.queries.extras31 import ml_diff_in_diff

    plan = plan_of(ml_diff_in_diff(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_share_shift_broadcast_dims_grid_windows(spark, sf_dir):
    """agg_share_shift attaches customer and nation by broadcast and
    collapses to the <=25x2 (nation, half) grid in its first
    aggregate; the share windows run on the grid. No sort-merge join,
    no cartesian."""
    from serverless_etl_aws_spark.queries.extras31 import agg_share_shift

    plan = plan_of(agg_share_shift(spark, sf_dir))
    assert plan.count("FileScan parquet") == 3
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_markov_chain_window_then_grid(spark, sf_dir):
    """ml_markov_chain is one user_id window shuffle (lead is O(1)
    state), one collapse onto the <=5x5 transition grid, and a
    grid-sized normalizer window — no join."""
    from serverless_etl_aws_spark.queries.extras32 import ml_markov_chain

    plan = plan_of(ml_markov_chain(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 3


def test_cross_corr_offset_equijoin_on_checkpointed_days(spark, sf_dir):
    """ts_cross_corr turns the lag scan into ONE equi-join on the
    shifted day key (explode by 15 offsets) over the lazily
    checkpointed days relation — never a theta/cartesian join, one
    corpus pass."""
    from serverless_etl_aws_spark.queries.extras32 import ts_cross_corr

    plan = plan_of(ts_cross_corr(spark, sf_dir))
    assert plan.count("FileScan parquet") <= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # equi-join, not theta


def test_ece_bins_then_one_row(spark, sf_dir):
    """ml_ece is one map-side-combinable collapse onto <=13 score bins
    and a 1-row reduce — no join, nothing corpus-sized downstream."""
    from serverless_etl_aws_spark.queries.extras32 import ml_ece

    plan = plan_of(ml_ece(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_completeness_trend_pair_scan_on_days_only(spark, sf_dir):
    """dq_completeness_trend runs its O(D^2) Mann-Kendall pair scan
    and the 1-row S attach on the checkpointed days relation — zero
    corpus re-scans, and the only nested-loop joins are the
    days-bounded pair scan and the 1-row scalar attach."""
    from serverless_etl_aws_spark.queries.extras32 import (
        dq_completeness_trend,
    )

    plan = plan_of(dq_completeness_trend(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 2
    assert "CartesianProduct" not in plan


def test_anova_weekday_seven_groups_one_shuffle(spark, sf_dir):
    """ts_anova_weekday collapses the corpus onto 7 weekday groups in
    one map-side-combinable shuffle; the F assembly is 7-row
    arithmetic. No join."""
    from serverless_etl_aws_spark.queries.extras33 import ts_anova_weekday

    plan = plan_of(ts_anova_weekday(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_table_checksum_zero_shuffles(spark, sf_dir):
    """dq_table_checksum is one full scan per table with the checksum
    folded map-side into a global aggregate — ZERO hash exchanges in
    the whole plan (the canonical embarrassingly-parallel audit), no
    join, pure JVM hashing."""
    from serverless_etl_aws_spark.queries.extras33 import dq_table_checksum

    plan = plan_of(dq_table_checksum(spark, sf_dir))
    assert plan.count("FileScan parquet") == 7
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Join" not in plan
    assert "Python" not in plan


def test_feature_screen_stack_one_scan(spark, sf_dir):
    """ml_feature_screen unpivots the four measures via a compile-time
    stack (ONE scan, one Generate) and collapses to 4 feature groups
    in one map-side-combinable shuffle — never four scans, never a
    Python stage."""
    from serverless_etl_aws_spark.queries.extras33 import ml_feature_screen

    plan = plan_of(ml_feature_screen(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Generate") == 1
    assert "Join" not in plan


def test_target_encode_broadcast_dim_grid_windows(spark, sf_dir):
    """ml_target_encode broadcasts the part dim onto the fact scan,
    collapses to the brands-sized relation in one shuffle, and
    computes prior + encoding as windows over that grid — one
    corpus pass, no sort-merge join."""
    from serverless_etl_aws_spark.queries.extras33 import ml_target_encode

    plan = plan_of(ml_target_encode(spark, sf_dir))
    assert plan.count("FileScan parquet") == 2
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan


def test_json_schema_bounded_explode_one_collapse(spark, sf_dir):
    """dq_json_schema explodes the per-row key map (bounded by JSON
    width) and collapses per key in one shuffle; the row total is a
    1-row scalar attach. The second scan reads ONLY the projected
    props column (columnar pushdown) — cheaper than materializing the
    strings for a single-pass checkpoint."""
    from serverless_etl_aws_spark.queries.extras34 import dq_json_schema

    plan = plan_of(dq_json_schema(spark, sf_dir))
    assert plan.count("FileScan parquet") == 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row attach
    assert "Python" not in plan


def test_mix_rate_decomp_zero_exchanges_after_broadcasts(spark, sf_dir):
    """agg_mix_rate_decomp broadcasts both dims and collapses to the
    nation grid with ZERO hash exchanges at test scale (partial
    aggregation suffices on the broadcast-joined stream) — no
    sort-merge join, no cartesian."""
    from serverless_etl_aws_spark.queries.extras34 import (
        agg_mix_rate_decomp,
    )

    plan = plan_of(agg_mix_rate_decomp(spark, sf_dir))
    assert plan.count("FileScan parquet") == 3
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_median_ci_shares_iqr_shape(spark, sf_dir):
    """agg_median_ci selects median and both CI endpoints inside ONE
    event_type exchange (the dq_iqr_outliers shape) — no join, no
    second scan."""
    from serverless_etl_aws_spark.queries.extras34 import agg_median_ci

    plan = plan_of(agg_median_ci(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_label_centroids_checkpointed_pair_join(spark, sf_dir):
    """ml_label_centroids builds the labels-sized centroid relation
    ONCE (lazy checkpoint — the self-join would otherwise duplicate
    the explode+collapse subtree) and pair-joins it label<label; the
    nested loop runs over labels^2, never the vectors."""
    from serverless_etl_aws_spark.queries.extras34 import (
        ml_label_centroids,
    )

    plan = plan_of(ml_label_centroids(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan


def test_churn_labels_scalar_cutoff_one_user_collapse(spark, sf_dir):
    """ml_churn_labels attaches the cutoff as a 1-row broadcast
    scalar (NEVER a global window over raw corpus rows — that would
    funnel everything through one partition) and computes features AND
    label in ONE per-user collapse over the same scan."""
    from serverless_etl_aws_spark.queries.extras35 import ml_churn_labels

    plan = plan_of(ml_churn_labels(spark, sf_dir))
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row cut
    assert "Window" not in plan  # no global window on corpus rows
    assert "CartesianProduct" not in plan


def test_gap_fill_spine_generates_from_span(spark, sf_dir):
    """ts_gap_fill generates the calendar spine from the 1-row span of
    the checkpointed observed relation (zero corpus re-scans) and
    left-joins observed counts onto it — all post-collapse relations
    are calendar-bounded."""
    from serverless_etl_aws_spark.queries.extras35 import ts_gap_fill

    plan = plan_of(ts_gap_fill(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0
    assert plan.count("Generate") == 1  # the spine explode
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_abc_class_rank_then_three_rows(spark, sf_dir):
    """agg_abc_class collapses to per-part revenue in one shuffle,
    classifies inside one global ordered window (range-partitioned
    sort at cluster scale), then reduces to 3 class rows. No join."""
    from serverless_etl_aws_spark.queries.extras35 import agg_abc_class

    plan = plan_of(agg_abc_class(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_saturation_shares_iqr_shape(spark, sf_dir):
    """dq_saturation extracts min/max and counts the pile-up inside
    ONE event_type exchange (the dq_iqr_outliers window-reuse shape) —
    no join, no second scan."""
    from serverless_etl_aws_spark.queries.extras35 import dq_saturation

    plan = plan_of(dq_saturation(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_gini_two_tier_aggregate(spark, sf_dir):
    """agg_gini re-aggregates the (day, type) count relation — two
    map-side-combinable shuffles, one scan, no join (the two-tier
    shape agg_hhi's test pins; this pins it for "agg_gini" itself)."""
    from serverless_etl_aws_spark.queries.extras13 import agg_gini

    plan = plan_of(agg_gini(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_salted_join_partitions_on_salt(spark, sf_dir):
    """join_salted must actually spread the hot key: the join-side
    exchanges hash-partition on (key, __salt) — not on the bare key —
    and the small side is replicated via explode (Generate), never a
    broadcast of the salted big side. This is the manual skew path
    ARCHITECTURE.md pairs with the AQE skew-join test above. Broadcast
    is disabled for the probe: at fixture scale the replicated small
    side broadcasts (correct, but then no exchange exists to inspect) —
    salting only matters on the shuffle path, so pin that path."""
    from serverless_etl_aws_spark.queries.extras import join_salted

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(join_salted(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    joins = [
        ln for ln in plan.splitlines()
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
    ]
    assert joins, f"no shuffle join in plan:\n{plan}"
    assert "__salt" in joins[0], (
        f"join keys lost the salt column: {joins[0]}"
    )
    assert "Generate explode" in plan  # small side replicated per salt
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert any("__salt" in ln for ln in exchanges), (
        "no exchange partitions on the salt — the hot key is not spread"
    )


# --------------------------------------------------------------------------
# Round-12 additions (VERDICT r11 directive #7): the 10 most expensive
# keys that had no plan-shape assertion. The hash gate catches wrong
# ANSWERS; only these catch a silently de-optimized PLAN (the r11
# topk_per_group bench wobble was unadjudicable precisely because no
# plan pin existed). Strategy-level pins only — node presence/absence
# and key columns, never exact node counts AQE may legitimately change.


def test_topk_partial_window_group_limit(spark, sf_dir):
    """topk_per_group must keep the scale-correct shape: part dim
    broadcast, partial aggregation before the shuffle, and Spark's
    rank-limit pushdown (WindowGroupLimit Partial) BEFORE the window
    exchange so each map task ships at most k rows per group. Also pins
    the r12 adjudication of the r11 bench wobble: this plan is the one
    the byte-identical-since-r10 code produces."""
    from serverless_etl_aws_spark.queries.windows import topk_per_group

    plan = plan_of(topk_per_group(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2  # map-side combine
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan.split("WindowGroupLimit")[-1].split("\n")[0], (
        "rank-limit pushdown lost its partial (pre-shuffle) stage"
    )
    fmt = formatted(topk_per_group(spark, sf_dir))
    li_schema = [
        ln for ln in fmt.splitlines() if "ReadSchema" in ln and "l_partkey" in ln
    ]
    assert li_schema and "l_shipdate" not in li_schema[0]  # pruned scan


def test_join_range_is_bucketed_band_not_nested_loop(spark, sf_dir):
    """join_range's contract: the theta join is rewritten to explode-to-
    covering-buckets + EQUI join + residual BETWEEN. A regression to the
    naive plan shows up as a nested-loop/cartesian node — the O(n*m)
    shape that cannot run at 100 TB."""
    from serverless_etl_aws_spark.queries.joins import join_range

    plan = plan_of(join_range(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan  # left side duplicated to buckets
    join_lines = [ln for ln in plan.splitlines() if "Join [" in ln or "Join bucket" in ln]
    assert any("bucket" in ln for ln in join_lines), (
        f"equi-join is not on the band bucket:\n{join_lines}"
    )


def test_percentile_shares_scan_per_measure(spark, sf_dir):
    """agg_percentile computes BOTH quantity percentiles from one
    lineitem scan (one sort-window pass per measure, not per
    percentile): exactly 2 file scans (qty + discount), window-ranked,
    never a cartesian."""
    from serverless_etl_aws_spark.queries.extras import agg_percentile

    plan = plan_of(agg_percentile(spark, sf_dir))
    assert plan.count("FileScan parquet") == 2
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multi_distinct_compiles_to_expand_single_scan(spark, sf_dir):
    """agg_multi_distinct's three DISTINCT aggregates must resolve via
    Catalyst's Expand in ONE aggregation pipeline over ONE scan — the
    regression is N self-joined scans."""
    from serverless_etl_aws_spark.queries.extras10 import agg_multi_distinct

    plan = plan_of(agg_multi_distinct(spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_minhash_is_banded_bucket_join_not_all_pairs(spark, sf_dir):
    """llm_dedup_minhash (rows-only by contract — this is its plan-side
    evidence): signatures band via posexplode, candidates come from an
    EQUI self-join on (table, bucket), and the verify join is candidate-
    only. All-pairs regressions surface as cartesian/nested-loop nodes."""
    from serverless_etl_aws_spark.queries.llm import llm_dedup_minhash

    plan = plan_of(llm_dedup_minhash(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate posexplode" in plan  # band explode
    join_lines = [ln for ln in plan.splitlines() if "Join [" in ln]
    assert any("bucket" in ln for ln in join_lines), (
        "candidate generation lost the LSH bucket equi-join"
    )


def test_ngram_dedup_joins_on_shingle_never_cartesian(spark, sf_dir):
    """llm_dedup_ngram: candidate pairs come from the shingle-postings
    equi-join with map-side-combinable aggregation, never an all-pairs
    product."""
    from serverless_etl_aws_spark.queries.llm import llm_dedup_ngram

    plan = plan_of(llm_dedup_ngram(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_editdist_levenshtein_runs_on_candidates_only(spark, sf_dir):
    """llm_dedup_editdist: the O(L^2) levenshtein must sit ABOVE the
    blocking join (candidate pairs only), and the expensive verify is an
    equi-join of the candidate list back to the text — no cartesian."""
    from serverless_etl_aws_spark.queries.llm import llm_dedup_editdist

    plan = plan_of(llm_dedup_editdist(spark, sf_dir))
    assert "levenshtein" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # levenshtein evaluates after the last join (on joined candidates):
    # it must appear only in Filter/Project nodes, never inside a join
    # condition-free product over raw documents
    lev_lines = [ln for ln in plan.splitlines() if "levenshtein" in ln]
    assert lev_lines and all(
        "CartesianProduct" not in ln for ln in lev_lines
    )


def test_embedding_dedup_blocks_on_label(spark, sf_dir):
    """llm_dedup_embedding: the cosine self-join is EQUI on the block
    label (SemDeDup blocking) — the all-pairs cosine regression would
    plan as a nested-loop over the full corpus."""
    from serverless_etl_aws_spark.queries.llm import llm_dedup_embedding

    plan = plan_of(llm_dedup_embedding(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    join_lines = [ln for ln in plan.splitlines() if "Join [" in ln]
    assert join_lines and any(
        "label" in ln or "__blk" in ln for ln in join_lines
    ), f"cosine join is not label-blocked:\n{join_lines}"


def test_cluster_assignment_single_window_shuffle(spark, sf_dir):
    """llm_dedup_cluster: after the iterative small-star contraction
    (checkpointed — its own loop is bounded by the components operator's
    tests), the final cluster_size assignment is ONE window over ONE
    hash exchange; no join or product re-enters the plan."""
    from serverless_etl_aws_spark.queries.llm import llm_dedup_cluster

    plan = plan_of(llm_dedup_cluster(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_dedup_apply_survivor_pick_uses_rank_limit(spark, sf_dir):
    """llm_dedup_apply (canonical-survivor selection): the per-cluster
    argmax must ride the same WindowGroupLimit rank-limit pushdown as
    topk_per_group — each map task ships one candidate survivor per
    cluster, not the whole cluster."""
    from serverless_etl_aws_spark.queries.extras13 import llm_dedup_apply

    plan = plan_of(llm_dedup_apply(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    assert "row_number" in plan


# --------------------------------------------------------------------------
# Round-12 second wave: the next 10 most expensive non-eager keys
# without a plan pin (after the directive-#7 ten above). Same rule:
# strategy-level structure only, no AQE-variable node counts.


def test_agg_stats_partial_agg_single_scan(spark, sf_dir):
    """agg_stats: one scan, map-side combine (two HashAggregate tiers
    around one exchange), no join."""
    from serverless_etl_aws_spark.queries.extras5 import agg_stats

    plan = plan_of(agg_stats(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert plan.count("FileScan parquet") == 1


def test_simhash_band_blocked_not_all_pairs(spark, sf_dir):
    """llm_dedup_simhash: candidates come from the 4x16-bit band
    equi-join (Generate explodes the bands), never an all-pairs
    product; the popcount verify runs on candidates only."""
    from serverless_etl_aws_spark.queries.llm import llm_dedup_simhash

    plan = plan_of(llm_dedup_simhash(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan  # band explode
    assert plan.count("HashAggregate") >= 2


def test_kmeans_assign_broadcasts_centroids(spark, sf_dir):
    """ml_kmeans: the n x k distance scoring is a BROADCAST nested-loop
    against the k=8 centroid relation — the corpus side streams
    map-side, never shuffles whole, and never meets itself in a true
    cartesian. (BroadcastNestedLoopJoin is the INTENDED node here: the
    build side is k rows; the regression is a shuffle-based cartesian
    or a corpus-side exchange before the scoring join.)"""
    from serverless_etl_aws_spark.queries.extras6 import ml_kmeans

    plan = plan_of(ml_kmeans(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan  # corpus never shuffles to score


def test_decontaminate_is_broadcast_shingle_semijoin(spark, sf_dir):
    """llm_decontaminate: eval 8-grams explode (Generate), dedup, and
    BROADCAST into one map-side pass over the corpus — the 100 TB shape
    (the corpus never shuffles; only the tiny benchmark side does)."""
    from serverless_etl_aws_spark.queries.llm import llm_decontaminate

    plan = plan_of(llm_decontaminate(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Generate" in plan
    assert "BroadcastHashJoin" in plan


def test_pagerank_iterations_stay_equi_join(spark, sf_dir):
    """graph_pagerank: every unrolled iteration joins rank to the edge
    list by node key (SMJ/BHJ) — a regression to a nested-loop spread
    is the plan that cannot run on a real graph."""
    from serverless_etl_aws_spark.queries.extras6 import graph_pagerank

    plan = plan_of(graph_pagerank(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_cube_compiles_to_expand_single_scan(spark, sf_dir):
    """agg_cube: the 2^n grouping sets resolve via ONE Expand over ONE
    scan in one aggregation pipeline — not 2^n unioned scans."""
    from serverless_etl_aws_spark.queries.aggregates import agg_cube

    plan = plan_of(agg_cube(spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1
    assert "Union" not in plan


def test_label_propagation_iterations_stay_equi_join(spark, sf_dir):
    """graph_label_propagation: the per-iteration label spread is an
    equi-join on node ids with aggregation — never a product."""
    from serverless_etl_aws_spark.queries.extras10 import (
        graph_label_propagation,
    )

    plan = plan_of(graph_label_propagation(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_pairs_topk_not_global_sort(spark, sf_dir):
    """llm_bpe_pairs: the most-frequent-pair pick is
    TakeOrderedAndProject (partial top-k per partition, k rows per map
    task), never a global Sort of the full pair histogram."""
    from serverless_etl_aws_spark.queries.extras6 import llm_bpe_pairs

    plan = plan_of(llm_bpe_pairs(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # map-side pair counting


def test_bigram_lm_no_true_cartesian(spark, sf_dir):
    """llm_bigram_lm: the only product-shaped node is the 1x1 broadcast
    of the scalar totals relation; the n-gram relations join equi."""
    from serverless_etl_aws_spark.queries.extras3 import llm_bigram_lm

    plan = plan_of(llm_bigram_lm(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_bfs_final_plan_reads_checkpoint_only(spark, sf_dir):
    """graph_bfs (compute-eager): after the bounded iterative expansion
    (its loop is pinned by the graph operator tests), the RETURNED
    relation is a read of checkpointed state — no join or product
    re-enters the final plan."""
    from serverless_etl_aws_spark.queries.extras13 import graph_bfs

    plan = plan_of(graph_bfs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan  # checkpointed frontier state


# ---------------------------------------------------------------------------
# Round-13 wave (VERDICT r12 directive #5): 20 more pins down the
# BENCH_DETAIL warm-time ranking — headed by the three r12 beyond-spread
# bench movers (join_semi / agg_distinct / stream_session), whose missing
# plan pins are exactly what made their adjudication a manual audit
# instead of a mechanical artifact diff.


def test_join_semi_is_broadcast_left_semi(spark, sf_dir):
    """join_semi (r12 bench mover): the urgent-orders side reduces to a
    BROADCAST build and the join stays LeftSemi — no row multiplication,
    no shuffle of the customer side, no distinct-after-inner rewrite."""
    from serverless_etl_aws_spark.queries.joins import join_semi

    plan = plan_of(join_semi(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_agg_distinct_two_phase_rewrite(spark, sf_dir):
    """agg_distinct (r12 bench mover): COUNT(DISTINCT) + COUNT(*) in one
    pass compiles to the two-phase distinct-aggregate rewrite — four
    HashAggregate stages around two exchanges, one scan; never a
    self-join of the orders table."""
    from serverless_etl_aws_spark.queries.aggregates import agg_distinct

    plan = plan_of(agg_distinct(spark, sf_dir))
    assert plan.count("HashAggregate") == 4
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_stream_session_result_is_materialized_read(spark, sf_dir):
    """stream_session (r12 bench mover; EAGER streaming key): the
    session-window job runs at build time and the RETURNED relation is a
    plain read of the committed result — the plan a repeated consumer
    re-executes must contain no join, no window, no product."""
    from serverless_etl_aws_spark.queries.streaming_ops import stream_session

    plan = plan_of(stream_session(spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    for node in ("Join", "Window", "CartesianProduct", "FileScan parquet"):
        assert node not in plan, node


def test_graph_components_final_plan_reads_checkpoint(spark, sf_dir):
    """graph_components (compute-eager): after the iterative min-label
    loop (pinned by the operator tests), the returned relation is the
    checkpointed component state + ONE broadcast equi-join to attach
    names — never a product, never a sort-merge of the iteration body."""
    from serverless_etl_aws_spark.queries.extras19 import graph_components

    plan = plan_of(graph_components(spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_agg_funnel_dims_broadcast_no_product(spark, sf_dir):
    """agg_funnel: every stage-to-stage attach is a broadcast equi-join
    (the funnel stages are tiny aggregates); the event scan never
    shuffles into a sort-merge join and never meets a product."""
    from serverless_etl_aws_spark.queries.extras3 import agg_funnel

    plan = plan_of(agg_funnel(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_probe_side_broadcast(spark, sf_dir):
    """llm_hard_negatives: the probe set is the BROADCAST build of the
    scoring join (BroadcastNestedLoopJoin with a k-row build side is the
    intended node — the corpus side must never shuffle or sort-merge),
    and candidate explosion happens via Generate, not a self-join."""
    from serverless_etl_aws_spark.queries.extras8 import llm_hard_negatives

    plan = plan_of(llm_hard_negatives(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Generate" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_udaf_grouped_single_shuffle_pandas_agg(spark, sf_dir):
    """udaf_grouped: ONE exchange on the grouping key feeding
    FlatMapGroupsInPandas — the Arrow-batched grouped-UDAF shape; a
    second exchange would mean the groups are being re-shuffled."""
    from serverless_etl_aws_spark.queries.udx import udaf_grouped

    plan = plan_of(udaf_grouped(spark, sf_dir))
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert plan.count("Exchange") == 1


def test_udf_cogrouped_two_sides_one_cogroup(spark, sf_dir):
    """udf_cogrouped: each side shuffles ONCE on the cogroup key into a
    single FlatMapCoGroupsInPandas — no join node before the cogroup
    (the cogroup IS the join), no extra exchange after."""
    from serverless_etl_aws_spark.queries.udx import udf_cogrouped

    plan = plan_of(udf_cogrouped(spark, sf_dir))
    assert plan.count("FlatMapCoGroupsInPandas") == 1
    assert plan.count("Exchange") == 2
    assert "Join" not in plan


def test_agg_unpivot_expands_via_generate_single_scan(spark, sf_dir):
    """agg_unpivot: wide→long goes through ONE Generate over ONE scan
    (melt-in-place) — never a per-measure UNION of re-scans."""
    from serverless_etl_aws_spark.queries.extras5 import agg_unpivot

    plan = plan_of(agg_unpivot(spark, sf_dir))
    assert "Generate" in plan
    assert plan.count("FileScan parquet") == 1
    assert "Union" not in plan


def test_fn_try_cast_fused_single_scan(spark, sf_dir):
    """fn_try_cast: per-row try_cast projection stays inside one
    whole-stage-codegen span over one scan — no exchange, no Python."""
    from serverless_etl_aws_spark.queries.extras12 import fn_try_cast

    plan = plan_of(fn_try_cast(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "*(1)" in plan
    assert "EvalPython" not in plan


def test_agg_approx_quantile_partial_sketch_merge(spark, sf_dir):
    """agg_approx_quantile: the KLL/GK sketch aggregates partially on
    the map side and merges after ONE exchange (two ObjectHashAggregate
    stages) — the sketch never ships raw rows to one node."""
    from serverless_etl_aws_spark.queries.extras2 import agg_approx_quantile

    plan = plan_of(agg_approx_quantile(spark, sf_dir))
    assert plan.count("ObjectHashAggregate") == 2
    assert plan.count("Exchange") == 1


def test_fn_json_parses_jvm_side_single_scan(spark, sf_dir):
    """fn_json: from_json/get_json_object run as JVM expressions over
    one scan — no Python eval, no exchange, no generate-explode (the
    key projects typed fields, it doesn't flatten)."""
    from serverless_etl_aws_spark.queries.scalar_fns import fn_json

    plan = plan_of(fn_json(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_mm_audio_window_single_arrow_pass(spark, sf_dir):
    """mm_audio_window: ONE Arrow-batched MapInPandas pass over one
    scan, no shuffle — the multimodal batch-transform shape (payload
    bytes cross the JVM↔Python boundary exactly once)."""
    from serverless_etl_aws_spark.queries.llm import mm_audio_window

    plan = plan_of(mm_audio_window(spark, sf_dir))
    assert plan.count("MapInPandas") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan


def test_join_asof_tolerance_no_product(spark, sf_dir):
    """join_asof_tolerance: the as-of match resolves via time-bucket
    equi-join + window rank — never a range cross-product, never a
    nested-loop spread of the probe side."""
    from serverless_etl_aws_spark.queries.joins import join_asof_tolerance

    plan = plan_of(join_asof_tolerance(spark, sf_dir))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_win_sessionize_single_user_shuffle(spark, sf_dir):
    """win_sessionize: gap-flag + running session id are windows over
    the SAME user/ts ordering — one scan, windows stacked on one
    partitioning, no join."""
    from serverless_etl_aws_spark.queries.extras3 import win_sessionize

    plan = plan_of(win_sessionize(spark, sf_dir))
    assert plan.count("Window") >= 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_subquery_scalar_broadcast_not_recompute_per_row(spark, sf_dir):
    """subquery_scalar: the scalar aggregate attaches via broadcast
    equi/1×1 join — the per-row plan never re-executes the aggregate
    subtree as a correlated loop (no product nodes)."""
    from serverless_etl_aws_spark.queries.extras import subquery_scalar

    plan = plan_of(subquery_scalar(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_cross_dedup_hash_only_shuffle(spark, sf_dir):
    """llm_cross_dedup: the cross-snapshot match joins on content HASH
    (broadcast of the smaller snapshot's hash set) — document text
    never shuffles, and the plan carries no product."""
    from serverless_etl_aws_spark.queries.extras3 import llm_cross_dedup

    plan = plan_of(llm_cross_dedup(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_zscore_outlier_stats_broadcast_back(spark, sf_dir):
    """agg_zscore_outlier: per-group stats aggregate once and broadcast
    back onto the row stream (BHJ) — never a self-join shuffle of the
    full fact table against itself."""
    from serverless_etl_aws_spark.queries.extras2 import agg_zscore_outlier

    plan = plan_of(agg_zscore_outlier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("FileScan parquet") == 2  # fact + stats branch


def test_win_frame_range_time_single_window(spark, sf_dir):
    """win_frame_range_time: the time-range frame is ONE Window over one
    sort/exchange on (user, ts) — no join, no second shuffle."""
    from serverless_etl_aws_spark.queries.extras9 import win_frame_range_time

    plan = plan_of(win_frame_range_time(spark, sf_dir))
    assert plan.count("Window") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_sim_search_jvm_topk_no_python(spark, sf_dir):
    """llm_sim_search: brute-force cosine is a pure-JVM
    aggregate(zip_with) expression (no Python eval nodes), the probe
    attaches via a 1-row broadcast, and top-k is TakeOrderedAndProject
    — never a global sort of the scored corpus."""
    from serverless_etl_aws_spark.queries.llm import llm_sim_search

    plan = plan_of(llm_sim_search(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan


def test_sample_hash_fused_single_scan(spark, sf_dir):
    """sample_hash: deterministic hash-mod sampling is a fused
    filter+project over one scan — no exchange, no Python, no sort
    (sampling must not cost a shuffle at any scale)."""
    from serverless_etl_aws_spark.queries.extras import sample_hash

    plan = plan_of(sample_hash(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan and "Sort" not in plan
    assert "*(1)" in plan


def test_bpe_encode_final_plan_reads_checkpoint(spark, sf_dir):
    """llm_bpe_encode (compute-eager): the iterative merge loop runs at
    build (pinned by the BPE operator tests); the returned relation
    reads checkpointed state — no join or product re-enters it."""
    from serverless_etl_aws_spark.queries.extras9 import llm_bpe_encode

    plan = plan_of(llm_bpe_encode(spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


# Second round-13 wave: the three NEWLY-ROTATED driver-audit keys (their
# plans deserve pins the round their correctness gets driver exposure)
# plus the next block down the warm-time ranking.


def test_win_streak_uses_window_group_limit(spark, sf_dir):
    """win_streak (r13 driver-audit slot): the per-user streak pick rides
    Spark 4's WindowGroupLimit pushdown (rank filter prunes partitions
    before the full window evaluates) — one scan, no join."""
    from serverless_etl_aws_spark.queries.extras13 import win_streak

    plan = plan_of(win_streak(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_agg_corr_single_pass_partial(spark, sf_dir):
    """agg_corr (r13 driver-audit slot): the correlation's power sums
    aggregate partially map-side around ONE exchange over ONE scan —
    never a self-join of the measures."""
    from serverless_etl_aws_spark.queries.extras13 import agg_corr

    plan = plan_of(agg_corr(spark, sf_dir))
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_join_lateral_decorrelates_to_window_limit(spark, sf_dir):
    """join_lateral (r13 driver-audit slot): the per-customer lateral
    top-k decorrelates to a window-group-limit + broadcast equi-join —
    never a correlated nested loop, never a product."""
    from serverless_etl_aws_spark.queries.extras13 import join_lateral

    plan = plan_of(join_lateral(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stream_tumbling_result_is_materialized_read(spark, sf_dir):
    """stream_tumbling (EAGER): the drained AvailableNow result is a
    checkpointed in-memory relation — re-consuming it re-reads state,
    never re-runs the stream (no scan/join/window in the final plan)."""
    from serverless_etl_aws_spark.queries.streaming_ops import stream_tumbling

    plan = plan_of(stream_tumbling(spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    for node in ("Join", "Window", "FileScan parquet"):
        assert node not in plan, node


def test_win_percent_rank_single_window(spark, sf_dir):
    """win_percent_rank: one Window over one exchange, one scan."""
    from serverless_etl_aws_spark.queries.extras2 import win_percent_rank

    plan = plan_of(win_percent_rank(spark, sf_dir))
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_win_ignore_nulls_single_window(spark, sf_dir):
    """win_ignore_nulls: the IGNORE NULLS gap-fill is ONE Window pass —
    never a self-join backfill."""
    from serverless_etl_aws_spark.queries.extras12 import win_ignore_nulls

    plan = plan_of(win_ignore_nulls(spark, sf_dir))
    assert plan.count("Window") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_join_full_outer_sort_merge(spark, sf_dir):
    """join_full_outer: FULL OUTER cannot broadcast — the correct shape
    is a sort-merge join on the key, and never a product."""
    from serverless_etl_aws_spark.queries.joins import join_full_outer

    plan = plan_of(join_full_outer(spark, sf_dir))
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fn_url_fused_single_scan(spark, sf_dir):
    """fn_url: parse_url/regexp projections stay fused JVM-side over one
    scan — no exchange, no Python eval."""
    from serverless_etl_aws_spark.queries.extras6 import fn_url

    plan = plan_of(fn_url(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "*(1)" in plan


def test_fn_math_cond_fused_single_scan(spark, sf_dir):
    """fn_math_cond: math + CASE chains compile into one codegen span
    over one scan."""
    from serverless_etl_aws_spark.queries.scalar_fns import fn_math_cond

    plan = plan_of(fn_math_cond(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "*(1)" in plan


def test_agg_conditional_partial_agg_single_scan(spark, sf_dir):
    """agg_conditional: FILTER-clause aggregates fold into ONE two-phase
    aggregation over ONE scan — never one scan per conditional sum."""
    from serverless_etl_aws_spark.queries.extras7 import agg_conditional

    plan = plan_of(agg_conditional(spark, sf_dir))
    assert plan.count("HashAggregate") == 2
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_sample_weighted_fused_no_shuffle(spark, sf_dir):
    """sample_weighted: deterministic weighted sampling is a fused
    filter over one scan — sampling never costs a shuffle."""
    from serverless_etl_aws_spark.queries.extras14 import sample_weighted

    plan = plan_of(sample_weighted(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan


def test_quality_score_jvm_only_single_scan(spark, sf_dir):
    """llm_quality_score: the per-doc quality features are pure JVM
    string expressions over one scan — no Python in the hot path."""
    from serverless_etl_aws_spark.queries.llm import llm_quality_score

    plan = plan_of(llm_quality_score(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan


def test_lang_id_jvm_only_single_scan(spark, sf_dir):
    """llm_lang_id: n-gram language ID scores entirely in JVM
    expressions over one scan — no Python, no shuffle."""
    from serverless_etl_aws_spark.queries.llm import llm_lang_id

    plan = plan_of(llm_lang_id(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan


def test_mm_frame_sample_single_arrow_pass(spark, sf_dir):
    """mm_frame_sample: one Arrow-batched MapInPandas pass, no shuffle
    (same multimodal batch-transform contract as mm_audio_window)."""
    from serverless_etl_aws_spark.queries.llm import mm_frame_sample

    plan = plan_of(mm_frame_sample(spark, sf_dir))
    assert plan.count("MapInPandas") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan


def test_span_corruption_generate_single_scan(spark, sf_dir):
    """llm_span_corruption: span explosion is ONE Generate over ONE
    scan with partial aggregation — no join, no Python."""
    from serverless_etl_aws_spark.queries.extras9 import llm_span_corruption

    plan = plan_of(llm_span_corruption(spark, sf_dir))
    assert "Generate" in plan
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_scan_csv_reads_csv_source(spark, sf_dir):
    """scan_csv (EAGER staging): the returned relation is a real CSV
    FileScan with the declared schema — the format round-trip is the
    contract (write parquet→csv→read)."""
    from serverless_etl_aws_spark.queries.extras import scan_csv

    plan = plan_of(scan_csv(spark, sf_dir))
    assert "FileScan csv" in plan
    assert "FileScan parquet" not in plan


# Third round-13 wave: the window family's canonical single-shuffle
# shapes, the remaining streaming/pipeline materialized-read contracts,
# and the text keys' fused-scan contracts.


def test_repeat_ngram_fused_single_scan(spark, sf_dir):
    """llm_repeat_ngram: the repeated-n-gram ratio computes entirely in
    fused JVM array expressions over one scan — no explode-shuffle, no
    Python."""
    from serverless_etl_aws_spark.queries.llm import llm_repeat_ngram

    plan = plan_of(llm_repeat_ngram(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_token_count_fused_single_scan(spark, sf_dir):
    """llm_token_count: BPE-ish regex token counting stays one fused
    scan — the 100 TB text-statistics shape (no shuffle, no Python)."""
    from serverless_etl_aws_spark.queries.llm import llm_token_count

    plan = plan_of(llm_token_count(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_fn_date_arith_fused_single_scan(spark, sf_dir):
    """fn_date_arith: date arithmetic is one codegen span, one scan."""
    from serverless_etl_aws_spark.queries.extras10 import fn_date_arith

    plan = plan_of(fn_date_arith(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "*(1)" in plan


def test_mm_feature_extract_single_arrow_pass(spark, sf_dir):
    """mm_feature_extract: one Arrow-batched MapInPandas pass, no
    shuffle (multimodal batch-transform contract)."""
    from serverless_etl_aws_spark.queries.llm import mm_feature_extract

    plan = plan_of(mm_feature_extract(spark, sf_dir))
    assert plan.count("MapInPandas") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan


def test_join_asof_window_shape_no_product(spark, sf_dir):
    """join_asof: the as-of pick is bucketed equi-join + window rank —
    never a time-range product or nested-loop spread."""
    from serverless_etl_aws_spark.queries.joins import join_asof

    plan = plan_of(join_asof(spark, sf_dir))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_window_family_single_shuffle_shapes(spark, sf_dir):
    """The canonical window keys are ONE Window over ONE exchange over
    ONE scan with no join — the shape that scales to any partition
    count (win_cume_dist / win_frame_rows / win_lag_lead /
    win_frame_range / llm_fingerprint / dim_scd2)."""
    from serverless_etl_aws_spark.queries.extras import win_frame_range
    from serverless_etl_aws_spark.queries.extras5 import win_cume_dist
    from serverless_etl_aws_spark.queries.extras6 import dim_scd2
    from serverless_etl_aws_spark.queries.llm import llm_fingerprint
    from serverless_etl_aws_spark.queries.windows import (
        win_frame_rows,
        win_lag_lead,
    )

    for fn in (win_cume_dist, win_frame_rows, win_lag_lead,
               win_frame_range, llm_fingerprint, dim_scd2):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("Window") >= 1, fn.__name__
        assert plan.count("Exchange") == 1, fn.__name__
        assert plan.count("FileScan parquet") == 1, fn.__name__
        assert "Join" not in plan, fn.__name__


def test_dedup_exact_uses_window_group_limit(spark, sf_dir):
    """dedup_exact: keep-earliest rides WindowGroupLimit (per-partition
    rank pruning BEFORE the full window sort) over one shuffle — the
    exact-dedup shape that survives 100 TB."""
    from serverless_etl_aws_spark.queries.relational import dedup_exact

    plan = plan_of(dedup_exact(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_snapshot_diff_sort_merge_no_product(spark, sf_dir):
    """dim_snapshot_diff: the two snapshots FULL-OUTER sort-merge on the
    business key — never a product, never a nested loop."""
    from serverless_etl_aws_spark.queries.extras10 import dim_snapshot_diff

    plan = plan_of(dim_snapshot_diff(spark, sf_dir))
    assert "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_set_except_all_counted_not_joined(spark, sf_dir):
    """set_except_all: bag EXCEPT ALL resolves via per-key count
    deltas + Generate replication — no join node at all (the
    shuffle-once shape; a join formulation would shuffle both sides
    then still need the multiplicity arithmetic)."""
    from serverless_etl_aws_spark.queries.extras7 import set_except_all

    plan = plan_of(set_except_all(spark, sf_dir))
    assert "Generate" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_streaming_family_results_are_materialized_reads(spark, sf_dir):
    """Every remaining EAGER streaming/pipeline key returns a read of
    its committed result — re-consuming never re-runs the stream
    (stream_sliding / stream_late_data / ingest_incremental)."""
    from serverless_etl_aws_spark.queries.pipeline_ops import (
        ingest_incremental,
    )
    from serverless_etl_aws_spark.queries.streaming_ops import (
        stream_late_data,
        stream_sliding,
    )

    for fn in (stream_sliding, stream_late_data, ingest_incremental):
        plan = plan_of(fn(spark, sf_dir))
        assert "Scan ExistingRDD" in plan, fn.__name__
        for node in ("Join", "Window", "FileScan parquet"):
            assert node not in plan, (fn.__name__, node)


def test_sink_partitioned_readback_aggregates_partially(spark, sf_dir):
    """sink_partitioned (EAGER): the verification readback of the
    partitioned sink is a partial-aggregated scan — no join."""
    from serverless_etl_aws_spark.queries.pipeline_ops import sink_partitioned

    plan = plan_of(sink_partitioned(spark, sf_dir))
    assert plan.count("HashAggregate") == 2
    assert "Join" not in plan


def test_text_stats_no_product(spark, sf_dir):
    """llm_text_stats: the corpus-percentile attach is broadcast equi —
    the doc relation never meets a product; shingle explosion is
    Generate."""
    from serverless_etl_aws_spark.queries.llm import llm_text_stats

    plan = plan_of(llm_text_stats(spark, sf_dir))
    assert "Generate" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_mix_weights_scalar_attach_only(spark, sf_dir):
    """llm_mix_weights: the only product-shaped node is the 1×1 scalar
    total attach (BroadcastNestedLoopJoin with a 1-row build) — never a
    true cartesian, never a sort-merge of the doc relation."""
    from serverless_etl_aws_spark.queries.extras6 import llm_mix_weights

    plan = plan_of(llm_mix_weights(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# Fourth round-13 wave: the §2B contract staples that until now were
# covered only by sibling-key pins (filter_pred/project_rename stood in
# for the whole scan family) get their OWN pins, plus the remaining
# cheap scalar/set/sample keys.


def test_scan_family_fused_single_scans(spark, sf_dir):
    """scan_parquet / filter_null / fn_string / fn_date /
    fn_higher_order / sample_stratified: one fused codegen span over
    one scan, no exchange, no Python — per-row work must never shuffle."""
    from serverless_etl_aws_spark.queries.extras4 import sample_stratified
    from serverless_etl_aws_spark.queries.extras9 import fn_higher_order
    from serverless_etl_aws_spark.queries.relational import (
        filter_null,
        scan_parquet,
    )
    from serverless_etl_aws_spark.queries.scalar_fns import fn_date, fn_string

    for fn in (scan_parquet, filter_null, fn_string, fn_date,
               fn_higher_order, sample_stratified):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("FileScan parquet") == 1, fn.__name__
        assert "Exchange" not in plan, fn.__name__
        assert "EvalPython" not in plan, fn.__name__
        assert "*(1)" in plan, fn.__name__


def test_join_family_broadcasts_filtered_side(spark, sf_dir):
    """join_inner / join_left / join_anti: the filtered orders side
    reduces to ONE broadcast exchange — the probe side never shuffles,
    and nothing sort-merges at dimension scale."""
    from serverless_etl_aws_spark.queries.joins import (
        join_anti,
        join_inner,
        join_left,
    )

    for fn in (join_inner, join_left, join_anti):
        plan = plan_of(fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert plan.count("Exchange") == 1, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__


def test_win_rank_uses_window_group_limit(spark, sf_dir):
    """win_rank: the rank ≤ k filter pushes into WindowGroupLimit —
    per-partition pruning before the full window sort."""
    from serverless_etl_aws_spark.queries.windows import win_rank

    plan = plan_of(win_rank(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_win_running_and_ntile_single_window(spark, sf_dir):
    """win_running / win_ntile_first_last: one Window, one exchange,
    one scan, no join."""
    from serverless_etl_aws_spark.queries.extras import win_ntile_first_last
    from serverless_etl_aws_spark.queries.windows import win_running

    for fn in (win_running, win_ntile_first_last):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("Window") == 1, fn.__name__
        assert plan.count("Exchange") == 1, fn.__name__
        assert "Join" not in plan, fn.__name__


def test_rollup_grouping_sets_expand_single_scan(spark, sf_dir):
    """agg_rollup / agg_grouping_sets: like agg_cube, the grouping-set
    lattice is ONE Expand in ONE aggregation pipeline over ONE fact
    scan (the second scan is the broadcast dim) — never a per-set
    union of re-scans."""
    from serverless_etl_aws_spark.queries.aggregates import (
        agg_grouping_sets,
        agg_rollup,
    )

    for fn in (agg_rollup, agg_grouping_sets):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("Expand") == 1, fn.__name__
        assert "Union" not in plan, fn.__name__
        assert plan.count("HashAggregate") == 2, fn.__name__


def test_set_family_shapes(spark, sf_dir):
    """set_union_all is pure concatenation (no shuffle, no agg);
    set_union_distinct dedups via ONE two-phase aggregate; intersect /
    except compile to broadcast equi-joins — none of the four may
    product or sort-merge at this dim scale."""
    from serverless_etl_aws_spark.queries.sorts_sets import (
        set_except,
        set_intersect,
        set_union_all,
        set_union_distinct,
    )

    plan = plan_of(set_union_all(spark, sf_dir))
    assert "Exchange" not in plan and "HashAggregate" not in plan
    plan = plan_of(set_union_distinct(spark, sf_dir))
    assert plan.count("HashAggregate") == 2
    assert "Join" not in plan
    for fn in (set_intersect, set_except):
        plan = plan_of(fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_subquery_in_rewrites_to_semi_join(spark, sf_dir):
    """subquery_in: the IN-subquery decorrelates to a broadcast
    left-semi join — never a per-row subquery loop."""
    from serverless_etl_aws_spark.queries.extras import subquery_in

    plan = plan_of(subquery_in(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_udf_scalar_is_arrow_not_row_python(spark, sf_dir):
    """udf_scalar: the scalar UDF runs as ArrowEvalPython (vectorized
    Arrow batches), NEVER row-at-a-time BatchEvalPython — the 10-100×
    UDF cliff the brief warns about."""
    from serverless_etl_aws_spark.queries.udx import udf_scalar

    plan = plan_of(udf_scalar(spark, sf_dir))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_explode_family_generate_no_shuffle(spark, sf_dir):
    """udtf_explode / fn_array / llm_doc_chunk: row explosion is
    Generate fused with the scan — no exchange before or after (the
    downstream consumer decides whether to shuffle)."""
    from serverless_etl_aws_spark.queries.llm import llm_doc_chunk
    from serverless_etl_aws_spark.queries.scalar_fns import fn_array
    from serverless_etl_aws_spark.queries.udx import udtf_explode

    for fn in (udtf_explode, fn_array, llm_doc_chunk):
        plan = plan_of(fn(spark, sf_dir))
        assert "Generate" in plan, fn.__name__
        assert plan.count("FileScan parquet") == 1, fn.__name__
        assert "Exchange" not in plan, fn.__name__


def test_agg_pivot_two_phase_no_rescan(spark, sf_dir):
    """agg_pivot: the pivot compiles to aggregate pipelines over ONE
    scan — never one scan per pivoted column."""
    from serverless_etl_aws_spark.queries.extras import agg_pivot

    plan = plan_of(agg_pivot(spark, sf_dir))
    assert plan.count("FileScan parquet") == 1
    assert "Union" not in plan and "Join" not in plan


def test_agg_collect_object_hash_partial(spark, sf_dir):
    """agg_collect: collect_list/set aggregates partially map-side
    (two ObjectHashAggregate stages around one exchange)."""
    from serverless_etl_aws_spark.queries.extras import agg_collect

    plan = plan_of(agg_collect(spark, sf_dir))
    assert plan.count("ObjectHashAggregate") == 2
    assert plan.count("Exchange") == 1


def test_lang_filter_partial_agg_single_scan(spark, sf_dir):
    """llm_lang_filter: the language histogram is one two-phase
    aggregate over one scan — no join, no Python."""
    from serverless_etl_aws_spark.queries.llm import llm_lang_filter

    plan = plan_of(llm_lang_filter(spark, sf_dir))
    assert plan.count("HashAggregate") == 2
    assert plan.count("FileScan parquet") == 1
    assert "EvalPython" not in plan


# Fifth round-13 wave: the staged-format scan family (each key's
# contract IS that the returned relation reads its own format), the
# remaining fused scalar keys, and the last eager materialized-read
# contracts. Plan-pinned keys reach 245 of 261.


def test_scan_formats_read_their_own_sources(spark, sf_dir):
    """scan_json/orc/text/xml/binaryfile/jdbc/pydatasource: each key
    stages the fixture into its format and the RETURNED relation scans
    THAT source — the format round-trip is the contract."""
    from serverless_etl_aws_spark.queries.extras import scan_json
    from serverless_etl_aws_spark.queries.extras2 import scan_orc
    from serverless_etl_aws_spark.queries.extras5 import scan_binaryfile
    from serverless_etl_aws_spark.queries.extras7 import scan_text
    from serverless_etl_aws_spark.queries.extras8 import scan_xml
    from serverless_etl_aws_spark.queries.extras11 import scan_jdbc
    from serverless_etl_aws_spark.queries.relational import scan_pydatasource

    for fn, marker in (
        (scan_json, "FileScan json"),
        (scan_orc, "FileScan orc"),
        (scan_text, "FileScan text"),
        (scan_xml, "FileScan xml"),
        (scan_binaryfile, "FileScan binaryFile"),
        (scan_jdbc, "JDBCRelation"),
        (scan_pydatasource, "BatchScan"),
    ):
        plan = plan_of(fn(spark, sf_dir))
        assert marker in plan, (fn.__name__, marker)
        assert "CartesianProduct" not in plan, fn.__name__


def test_fused_scalar_tail_single_scans(spark, sf_dir):
    """fn_struct_map / fn_bitwise / fn_binary_codec /
    fn_regexp_extract_all / llm_pii_scrub / llm_data_split /
    llm_embed_quantize: one fused codegen span over one scan — no
    exchange, no Python (the PII scrub and the md5 split are pure JVM
    regex/hash expressions by design)."""
    from serverless_etl_aws_spark.queries.extras2 import fn_struct_map
    from serverless_etl_aws_spark.queries.extras4 import llm_data_split
    from serverless_etl_aws_spark.queries.extras6 import (
        fn_binary_codec,
        fn_regexp_extract_all,
    )
    from serverless_etl_aws_spark.queries.extras7 import fn_bitwise
    from serverless_etl_aws_spark.queries.llm import (
        llm_embed_quantize,
        llm_pii_scrub,
    )

    for fn in (fn_struct_map, fn_bitwise, fn_binary_codec,
               fn_regexp_extract_all, llm_pii_scrub, llm_data_split,
               llm_embed_quantize):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("FileScan parquet") == 1, fn.__name__
        assert "Exchange" not in plan, fn.__name__
        assert "EvalPython" not in plan, fn.__name__


def test_mm_decode_resize_single_arrow_pass(spark, sf_dir):
    """mm_decode_meta / mm_resize: one Arrow-batched MapInPandas pass,
    no shuffle — completes the multimodal family's plan pins."""
    from serverless_etl_aws_spark.queries.llm import mm_decode_meta, mm_resize

    for fn in (mm_decode_meta, mm_resize):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("MapInPandas") == 1, fn.__name__
        assert "Exchange" not in plan, fn.__name__


def test_agg_histogram_two_phase_single_scan(spark, sf_dir):
    """agg_histogram: bucket counts are one two-phase aggregate over
    one scan — the floor-bucket histogram never joins or re-scans."""
    from serverless_etl_aws_spark.queries.extras5 import agg_histogram

    plan = plan_of(agg_histogram(spark, sf_dir))
    assert plan.count("HashAggregate") == 2
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_pack_sequences_single_window(spark, sf_dir):
    """llm_pack_sequences: greedy first-fit packing is a running-sum
    window over one shuffle — never an iterative join."""
    from serverless_etl_aws_spark.queries.llm import llm_pack_sequences

    plan = plan_of(llm_pack_sequences(spark, sf_dir))
    assert plan.count("Window") >= 1
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_stream_stateful_result_is_materialized_read(spark, sf_dir):
    """stream_stateful (EAGER): the applyInPandasWithState run happens
    at build; the returned relation reads materialized state — no scan
    of the source, no join, no window."""
    from serverless_etl_aws_spark.queries.streaming_ops import stream_stateful

    plan = plan_of(stream_stateful(spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    for node in ("Join", "Window", "FileScan parquet"):
        assert node not in plan, node


def test_corpus_stats_scalar_attach_only(spark, sf_dir):
    """llm_corpus_stats: the only product-shaped node is the 1×1
    corpus-total attach — never a true cartesian or sort-merge."""
    from serverless_etl_aws_spark.queries.llm import llm_corpus_stats

    plan = plan_of(llm_corpus_stats(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_sketch_merge_object_hash_partial(spark, sf_dir):
    """agg_sketch_merge: sketch buffers aggregate partially map-side
    (ObjectHashAggregate pairs) and merge after the exchange — raw rows
    never ship to one node; no product."""
    from serverless_etl_aws_spark.queries.aggregates import agg_sketch_merge

    plan = plan_of(agg_sketch_merge(spark, sf_dir))
    assert plan.count("ObjectHashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_maintenance_rollup_results_read_back_clean(spark, sf_dir):
    """maintenance_vacuum / maintenance_delete_rows /
    rollup_incremental / rollup_upsert / export_warehouse (EAGER
    mutating keys): the commit/vacuum/rollup cycle runs at build and
    the returned relation is a plain read of the committed table —
    no join or product re-enters the final plan."""
    from serverless_etl_aws_spark.queries.extras5 import maintenance_vacuum
    from serverless_etl_aws_spark.queries.extras12 import (
        maintenance_delete_rows,
    )
    from serverless_etl_aws_spark.queries.pipeline_ops import (
        export_warehouse,
        rollup_incremental,
        rollup_upsert,
    )

    for fn in (maintenance_vacuum, maintenance_delete_rows,
               rollup_incremental, rollup_upsert, export_warehouse):
        plan = plan_of(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "Join" not in plan, fn.__name__


# Final round-13 wave: the last unpinned keys — every registry key now
# carries a plan assertion.


def test_udtf_python_runs_on_arrow_transport(spark, sf_dir):
    """udtf_python: the Python UDTF executes as ArrowEvalPythonUDTF
    (Arrow record batches), NEVER the row-pickling BatchEvalPythonUDTF
    — the round-13 session default
    (spark.sql.execution.pythonUDTF.arrow.enabled) that puts the fourth
    Python API shape on the same transport as pandas_udf/mapInPandas.
    The LATERAL fan-out itself stays Generate over the scan — no
    shuffle."""
    from serverless_etl_aws_spark.queries.udx import udtf_python

    plan = plan_of(udtf_python(spark, sf_dir))
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan
    assert "Exchange" not in plan


def test_approx_distinct_two_phase_single_scan(spark, sf_dir):
    """agg_approx_distinct: the HLL++ sketch aggregates partially
    map-side (sketch buffers merge after one exchange) — raw user ids
    never ship whole."""
    from serverless_etl_aws_spark.queries.aggregates import (
        agg_approx_distinct,
    )

    plan = plan_of(agg_approx_distinct(spark, sf_dir))
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1
    assert plan.count("FileScan parquet") == 1


def test_anomaly_mad_no_product(spark, sf_dir):
    """ts_anomaly_mad: the median/MAD branches attach per-type via
    broadcast equi-joins — never a product, never a sort-merge of the
    event stream against itself."""
    from serverless_etl_aws_spark.queries.extras13 import ts_anomaly_mad

    plan = plan_of(ts_anomaly_mad(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_ann_family_one_arrow_pass_topk(spark, sf_dir):
    """llm_sim_search_ivf / llm_sim_search_pq: the index probe is ONE
    Arrow-batched MapInPandas pass over the corpus scan finished by
    TakeOrderedAndProject — no shuffle of the corpus, no global sort,
    no join (candidates are pruned INSIDE the batch)."""
    from serverless_etl_aws_spark.queries.extras6 import llm_sim_search_pq
    from serverless_etl_aws_spark.queries.llm import llm_sim_search_ivf

    for fn in (llm_sim_search_ivf, llm_sim_search_pq):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("MapInPandas") == 1, fn.__name__
        assert "TakeOrderedAndProject" in plan, fn.__name__
        assert "Exchange" not in plan, fn.__name__
        assert "Join" not in plan, fn.__name__


def test_tfidf_no_true_cartesian(spark, sf_dir):
    """llm_tfidf (compute-eager): the returned relation reads
    checkpointed state; the only product-shaped node is the 1×1
    corpus-total attach — never a true cartesian."""
    from serverless_etl_aws_spark.queries.llm import llm_tfidf

    plan = plan_of(llm_tfidf(spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_bpe_train_final_plan_reads_checkpoint(spark, sf_dir):
    """llm_bpe_train (compute-eager): the merge-iteration loop runs at
    build; the returned vocabulary relation reads checkpointed state —
    no join re-enters."""
    from serverless_etl_aws_spark.queries.extras9 import llm_bpe_train

    plan = plan_of(llm_bpe_train(spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "Join" not in plan


def test_set_intersect_all_counted_not_joined(spark, sf_dir):
    """set_intersect_all: bag INTERSECT ALL resolves via per-key count
    minima + Generate replication — no join node (set_except_all's
    sibling shape)."""
    from serverless_etl_aws_spark.queries.extras7 import set_intersect_all

    plan = plan_of(set_intersect_all(spark, sf_dir))
    assert "Generate" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_remaining_streaming_results_are_materialized_reads(
    spark, sf_dir
):
    """stream_dedup / stream_join / stream_stream_join /
    stream_pydatasource return reads of their drained results;
    stream_cdc returns the committed sink's parquet readback — none may
    re-run the stream or carry a join in the final plan."""
    from serverless_etl_aws_spark.queries.streaming_ops import (
        stream_cdc,
        stream_dedup,
        stream_join,
        stream_pydatasource,
        stream_stream_join,
    )

    for fn in (stream_dedup, stream_join, stream_stream_join,
               stream_pydatasource):
        plan = plan_of(fn(spark, sf_dir))
        assert "Scan ExistingRDD" in plan, fn.__name__
        assert "Join" not in plan, fn.__name__
    plan = plan_of(stream_cdc(spark, sf_dir))
    assert "FileScan parquet" in plan
    assert "Join" not in plan
