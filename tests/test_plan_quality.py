"""Physical-plan regression tests: the optimizations the engine's scale
story depends on must be visible in the executed plan, not assumed.
(`.explain`-driven development per the project brief — these pin the
plan shape so a refactor can't silently regress it.)"""

from __future__ import annotations

import re

import __spark_entry__ as entrymod


def _plan(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_join_is_broadcast_with_pruned_scans(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pipe_valid_rows")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # column pruning: the orders scan must read only the 2 needed columns
    orders_scans = [l for l in plan.splitlines() if "orders.parquet" in l]
    assert orders_scans and all(
        "o_orderkey" in l and "o_totalprice" not in l for l in orders_scans
    )
    # join-key null filter pushed into the scan
    assert "PushedFilters: [IsNotNull(o_orderkey)]" in plan


def test_star_fact_resolution_all_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "st4_fact_resolved")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 5


def test_ann_certification_queries_stay_broadcast(spark, sf_dir):
    """The v4/v5/v7 certification reshapes triple the join count (exact +
    exhaustive + approx legs); all of it must stay broadcast-shaped — the
    corpus scan is the only large input, so a SortMergeJoin or a
    non-broadcast cartesian anywhere means a leg lost its broadcast hint
    and would shuffle the corpus at scale."""
    for name in ("v4_knn_lsh", "v5_ivf_ann", "v7_ivf_trained"):
        plan = _plan(spark, sf_dir, name)
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, name


def test_pq_certification_stays_broadcast_with_cached_corpus(spark, sf_dir):
    """v11's pair loop must broadcast the (3-row) query side and read
    the encoded/reconstructed corpus from the persisted relation — the
    persist is what keeps the per-VECTOR folds (reconstruction, norms,
    residual) from being inlined into the per-PAIR projection by
    CollapseProject (the §8 trap, which would triple pair cost)."""
    plan = _plan(spark, sf_dir, "v11_pq_adc")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan  # corpus side served from the persist


def test_lm_gate_window_shuffles_by_lang_not_globally(spark, sf_dir):
    """t12's percent_rank window must exchange on the lang hash only —
    a rangepartitioning exchange would mean Catalyst planned a global
    sort, which turns the per-stratum gate into an all-data total order
    at scale."""
    plan = _plan(spark, sf_dir, "t12_lm_percentile_gate")
    assert "Exchange hashpartitioning(lang" in plan
    assert "Exchange rangepartitioning" not in plan


def test_aggregation_is_partial_then_final(spark, sf_dir):
    """Map-side combine: grouped aggregations must show two
    HashAggregate levels around the exchange."""
    plan = _plan(spark, sf_dir, "a16_revenue_by_location")
    assert len(re.findall(r"HashAggregate", plan)) >= 2
    assert "Exchange hashpartitioning" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    """Global ORDER BY + LIMIT must compile to TakeOrderedAndProject,
    never a full Sort."""
    plan = _plan(spark, sf_dir, "o2_top10_orders")
    assert "TakeOrderedAndProject" in plan


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    """A source-column predicate must appear in PushedFilters."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.sources import read_table

    df = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 200000
    ).select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(o_totalprice,200000" in plan
    # and projection pruning: the read schema carries only the 2 columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "o_orderkey",
        "o_totalprice",
    }


def test_no_pythonudf_on_parity_path(spark, sf_dir):
    """The reference-parity queries must stay fully JVM-side — no
    BatchEvalPython / ArrowEvalPython stages anywhere."""
    for name in [
        "pipe_valid_rows",
        "a17_calendar_rollup",
        "st4_fact_resolved",
        "dd4_lsh_pairs",
        "v2_knn_bruteforce",
    ]:
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name


def test_default_dim_build_has_no_global_sort(spark, sf_dir):
    """The default dim path mints hash keys — no single-partition window
    anywhere in the plan. Dense keys (global sort) exist only under
    oracle_mode. Guards the dim_time 100x-scale liability: its natural
    key cardinality grows with the fact."""
    from nyc_taxi_etl_dashboard_spark.plans.star import _valid, dim_time

    valid = _valid(spark, sf_dir)
    plan = dim_time(valid)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    oracle_plan = (
        dim_time(valid, oracle_mode=True)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in oracle_plan  # the contrast: oracle mode pays the sort


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, sf_dir, tmp_path):
    """The partitioned-warehouse layout must enable DPP: joining the
    fact's partition column to a selectively-filtered dim plants a
    DynamicPruningExpression in the fact scan's PartitionFilters, so
    only matching partitions are read at runtime — the mechanism that
    makes date-dim slicers cheap at 100 TB."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.sources import read_table

    o = read_table(spark, sf_dir, "orders").withColumn(
        "om", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "fact_part")
    o.write.partitionBy("om").parquet(path)
    fact = spark.read.parquet(path)
    dim = o.select("om").distinct().withColumn("flag", F.col("om").endswith("-01"))
    plan = (
        fact.join(dim.filter(F.col("flag")), "om")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower()


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join handling: a planted hot key makes one shuffle
    partition dwarf the median; with the skew thresholds scaled to the
    fixture, the executed (adaptive) plan must mark the sort-merge join
    skew-handled ('skew=true') instead of letting one task drag the
    stage — the mechanism that replaces manual salting when skew is
    discovered only at runtime."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # pad must be incompressible (sha2, not a repeated constant) and
        # must SURVIVE column pruning (consumed by the aggregate):
        # shuffle skew is detected from compressed map-output sizes, and
        # 270k identical keys alone compress under any threshold
        big = spark.range(300_000).withColumn(
            "k",
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 1000),
        ).withColumn("pad", F.sha2(F.col("id").cast("string"), 256))
        right = spark.range(20_000).withColumn("k", F.col("id") % 1000)
        j = big.join(right, "k").select(F.max(F.length("pad")).alias("n"))
        # collect() finalizes THIS DataFrame's adaptive execution; a
        # sink write would run a separate queryExecution and leave this
        # one unexecuted (isFinalPlan=false)
        assert j.collect()[0].n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_join_probe_side(spark):
    """Runtime bloom-filter join pruning (on by default in Spark 4): a
    selective build side plants a bloom_filter_agg subquery whose
    might_contain() filters the probe side BEFORE the shuffle — at
    100 TB this drops most probe rows at the scan instead of shuffling
    them into the join. Thresholds are scaled down so the tiny fixture
    qualifies."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(500_000).withColumn("k", F.col("id") % 100_000).withColumn(
            "pad", F.sha2(F.col("id").cast("string"), 256)
        )
        dim = spark.range(100_000).withColumn("k", F.col("id")).filter(
            F.col("id") % 1000 == 0
        )
        j = big.join(dim, "k").select(F.count(F.lit(1)).alias("n"))
        assert j.collect()[0].n == 500  # 100 surviving keys x 5 rows each
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_no_hof_recompute_in_scan_filters(spark, sf_dir):
    """Constraint-pushdown regression guard (the dd7/v4/v6 trap): a
    null-INTOLERANT predicate or join key built on an expensive
    higher-order-function column lets Catalyst infer isnotnull(<HOF>)
    and push the entire expression recomputation into the parquet scan
    filter — silently doubling per-row work. Every HOF-heavy query's
    executed plan must be free of isnotnull(<HOF>) markers."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    hof_heavy = [
        "dd2_jaccard_pairs", "dd4_lsh_pairs", "dd5_simhash",
        "dd7_simhash_pairs", "dd8_dup_clusters", "dd10_cluster_curation",
        "v4_knn_lsh", "v6_embedding_dedup", "t3_fingerprints",
        "t9_repetition", "x7_corpus_pipeline",
        # round-7: minhash-signature banding (dd11) and RHP-blocked
        # semantic keep-list (v10) are HOF-heavy on the same traps
        "dd11_incremental_dedup", "v10_semantic_dedup",
        # round-15: DSIR's gram explode and dd16's per-source shingle
        # sets are HOF transforms feeding join keys — the same trap
        "x23_dsir_resample", "dd16_source_overlap",
        # round-16: same kernels under a parametric target / grouping
        "x25_dsir_balanced", "dd16b_snapshot_overlap",
    ]
    markers = (
        "isnotnull(transform(", "isnotnull(aggregate(",
        "isnotnull(filter(", "isnotnull(zip_with(",
    )
    for name in hof_heavy:
        plan = (
            qs[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in markers:
            assert marker not in plan, (name, marker)


def test_shuffle_shard_sorts_per_shard_never_globally(spark, sf_dir):
    """x15/x16's layout claim: position-in-shard comes from per-shard
    sorts under a hash Exchange on the shard key — a global order-by
    (Exchange rangepartitioning) anywhere in either plan would mean the
    'shuffled corpus without a global sort' promise regressed to
    exactly the single-task sort it exists to avoid."""
    for name in ("x15_shuffle_shard", "x16_curation_pipeline_v4"):
        plan = _plan(spark, sf_dir, name)
        assert "rangepartitioning" not in plan, name
        assert re.search(r"Exchange hashpartitioning\(shard", plan), name


def test_split_assign_windows_on_bucket_never_bare_stratum(spark, sf_dir):
    """x17's skew claim, structurally: the cut spec arrives via
    BroadcastHashJoin (never a shuffle of the corpus against a 6-row
    spec), the row_number window partitions on (stratum, __bkt) — a
    window specified on the bare stratum would recreate the one-reducer-
    per-language cliff — and no global sort appears anywhere."""
    plan = _plan(spark, sf_dir, "x17_split_assign")
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" not in plan
    # every row_number window partition spec must include the bucket
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "__bkt" in m.group(1), m.group(0)


def test_chunk_overlap_plan_has_no_keyed_exchange(spark, sf_dir):
    """t18 is a read → explode → project chain: a KEY-BASED Exchange
    (hash or range) in the plan means the chunking pass acquired a
    shuffle it does not need at any scale. The scale_out fan-out
    (RoundRobinPartitioning, a no-op on production-sized scans) is the
    only Exchange allowed."""
    plan = _plan(spark, sf_dir, "t18_chunk_overlap")
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Generate explode" in plan


def test_filtered_ann_predicate_reaches_the_scan(spark, sf_dir):
    """v14's pre-filter semantics must be a SCAN property: the label
    predicate appears in the corpus FileScan's DataFilters (prunable at
    100 TB by a label-partitioned layout), below the broadcast score
    join — a Filter above the join would mean post-filtering."""
    plan = _plan(spark, sf_dir, "v14_filtered_ann")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    scan_lines = [
        l for l in plan.splitlines() if "FileScan parquet" in l and "label" in l
    ]
    assert scan_lines and any("(label" in l and "= 3)" in l for l in scan_lines)


def test_contamination_audit_joins_stay_broadcast(spark, sf_dir):
    """t19: the shingle hit join must broadcast the (tiny) eval side and
    the final spine join the (eval-sized) audit aggregate — the corpus
    side streams; a SortMergeJoin anywhere means one of them started
    shuffling the corpus. The only keyed exchanges allowed are the two
    aggregation boundaries, both over hit rows (bounded by overlap),
    never over raw shingles."""
    plan = _plan(spark, sf_dir, "t19_contamination_audit")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "rangepartitioning" not in plan


def test_temperature_mix_is_single_scan(spark, sf_dir):
    """x20: the roll-up/explode shape exists so the plan hangs off ONE
    corpus scan — the naive counts→denominator→join shape rescans the
    corpus once per branch, which at 100 TB doubles the dominant cost."""
    plan = _plan(spark, sf_dir, "x20_temperature_mix")
    assert plan.count("FileScan parquet") == 1
    assert "SortMergeJoin" not in plan


def test_interleaved_pack_windows_per_source_never_globally(spark, sf_dir):
    """mm5 packs within a source shard like x6 — a rangepartitioning
    (global sort) or an unpartitioned window would serialize the packing
    pass at scale."""
    plan = _plan(spark, sf_dir, "mm5_interleaved_pack")
    assert "rangepartitioning" not in plan
    assert re.search(r"Exchange hashpartitioning\(source", plan)


def test_prototype_prune_prod_has_no_window(spark, sf_dir):
    """v15_prod's reason to exist: the percentile-sketch cutoff replaces
    the per-label rank window, so NO Window operator (and no global
    sort) may appear — a hot label must never serialize. Both small
    sides (centroids, cutoffs) ride broadcast joins."""
    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY

    df = BENCH_ONLY["v15_prod"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_distribution_drift_single_scan_no_global_sort(spark, sf_dir):
    """t20 is one corpus scan feeding two map-side-combinable aggs; a
    second scan or a rangepartitioning exchange means the roll-up shape
    regressed."""
    plan = _plan(spark, sf_dir, "t20_distribution_drift")
    assert plan.count("FileScan parquet") == 1
    assert "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_export_manifest_one_layout_window_on_split_shard(spark, sf_dir):
    """x21's layout claim, structurally: pos, start_offset and bin_id
    all come out of ONE Window operator partitioned by (split, shard)
    — the Exchange feeding it IS the final write partitioning, not an
    extra hop — and the only other windows are the split kernel's
    boundary-bucket ones (spec includes __bkt). No global sort
    anywhere."""
    plan = _plan(spark, sf_dir, "x21_export_manifest")
    assert "rangepartitioning" not in plan
    win_ops = [l for l in plan.splitlines() if "Window [" in l]
    layout = [l for l in win_ops if "__bkt" not in l]
    # one Window operator computes all three layout columns: row_number
    # and the running sum must not split into two Window nodes
    assert len(layout) == 1, win_ops
    assert "split" in layout[0] and "shard" in layout[0], layout[0]
    for l in win_ops:
        if l is not layout[0]:
            assert "__bkt" in l, l


def test_export_manifest_leakage_safe_one_layout_window(spark, sf_dir):
    """x21b inherits x21's layout claim: the cluster-atomic split adds
    LSH/CC joins and the split kernel's boundary-bucket windows, but the
    LAYOUT is still one Window on (split, shard) — the Exchange feeding
    it is the store-write partitioning — and no global sort appears.
    minhash/CC must not smuggle in a corpus-keyed window."""
    plan = _plan(spark, sf_dir, "x21b_export_manifest_ls")
    assert "rangepartitioning" not in plan
    win_ops = [l for l in plan.splitlines() if "Window [" in l]
    layout = [l for l in win_ops if "__bkt" not in l]
    assert len(layout) == 1, win_ops
    assert "split" in layout[0] and "shard" in layout[0], layout[0]


def test_dup_spans_no_pairs_no_global_sort(spark, sf_dir):
    """dd14's scale claim, structurally: no pair join (CartesianProduct/
    non-equi self-join would mean the suffix-array formulation leaked
    back in), no rangepartitioning (the islands window sorts WITHIN
    doc_id hash partitions, never globally), and the per-document
    window partitions on doc_id."""
    plan = _plan(spark, sf_dir, "dd14_dup_spans")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    win_ops = [l for l in plan.splitlines() if "Window [" in l]
    assert any("doc_id" in l for l in win_ops), win_ops


def test_span_redact_range_join_is_doc_keyed(spark, sf_dir):
    """dd15's removal anti-join must be keyed on doc_id (the range
    predicate rides a per-document equi-join, bounded by doc length ×
    spans-per-doc) — a pure range join over the whole corpus would be
    the quadratic form."""
    plan = _plan(spark, sf_dir, "dd15_span_redact")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_epoch_expand_broadcast_plan_no_global_sort(spark, sf_dir):
    """x22's scale claim: the 5-row mixing plan joins as a BROADCAST,
    the per-language rank window exchanges on the lang hash (never a
    rangepartitioning global sort), and the epoch fan-out is a narrow
    Generate — no SortMergeJoin anywhere."""
    plan = _plan(spark, sf_dir, "x22_epoch_expand")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "rangepartitioning" not in plan
    assert "Generate explode" in plan


def test_round15_wave_plan_shapes(spark, sf_dir):
    """Plan pins for the round-15 wave.

    - x23 (DSIR): every join is broadcast — the log-ratio table and the
      gram-count totals are bounded (≤ n_buckets / 1 row) BY DESIGN, so
      a SortMergeJoin anywhere means a bounded table stopped being
      recognized as such and the corpus would shuffle on bucket.
    - t21 (diversity report): aggregation-only — no sort-merge join and
      no range exchange may appear; every wide op is a lang/vocab-keyed
      hash agg.
    - x24 (curriculum): exactly ONE SinglePartition exchange — the
      global ntile rank, the documented approx-quantile swap point at
      100 TB; a second one means the per-stage position window stopped
      riding the same layout.
    - all three: zero Python (pure codegen).
    """
    import re

    from nyc_taxi_etl_dashboard_spark.plans.llmops import QUERIES

    def plan(name):
        return (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    p23 = plan("x23_dsir_resample")
    assert "SortMergeJoin" not in p23
    assert p23.count("BroadcastHashJoin") >= 3
    assert "PythonUDF" not in p23

    p21 = plan("t21_ngram_diversity")
    assert "SortMergeJoin" not in p21
    assert "rangepartitioning" not in p21
    assert "PythonUDF" not in p21

    p24 = plan("x24_curriculum_schedule")
    assert len(re.findall(r"Exchange SinglePartition", p24)) == 1
    assert "SortMergeJoin" not in p24
    assert "PythonUDF" not in p24

    # dd16: the sketch leg reduces to one signature row per source
    # before any pair logic (cross join over |groups| rows only); the
    # exact leg is the ONE permitted sort-merge join (shingle-keyed,
    # group granularity). A second SMJ means the sketch leg regressed
    # into a pair-space shuffle.
    p16 = plan("dd16_source_overlap")
    assert p16.count("SortMergeJoin") <= 1
    assert "PythonUDF" not in p16


def test_prod_paths_use_corpus_adaptive_bucketing():
    """Prod-config contract (VERDICT r14 item 4): the fixed-bucket-
    parameter defect class now has THREE instances (v8_prod fixed 16
    planes — leg alpha 1.50 at 100x; v13_prod fixed 8 cells — quadratic
    at 10x; v14_prod fixed 8 cells — caught by this test in round 15).
    Every BENCH_ONLY prod path that invokes a bucketed operator must
    pass its sizing kwarg EXPLICITLY as "auto" (corpus-adaptive), or
    carry a `bucket-fixed-ok:` justification comment on the call line.
    Omitting the kwarg is also a failure — the operator defaults are
    fixed literals sized for certification fixtures, not production.

    Follows one level of lambda indirection (v10_prod/x7_prod register
    lambdas that forward kwargs into their certification query)."""
    import ast
    import inspect
    import textwrap

    from nyc_taxi_etl_dashboard_spark.plans import llmops

    BUCKETED = {
        "knn_lsh": "n_planes",
        "ivf_ann_trained": "n_cells",
        "ivfadc_topk": "n_cells",
        "embedding_candidate_pairs": "n_planes",
        "embedding_dedup_pairs": "n_planes",
        "minhash_lsh_pairs": "max_shingle_freq",
        "containment_pairs": "max_shingle_freq",
        "knn_density_outliers": "n_cells",
    }

    def call_name(node: ast.Call) -> str | None:
        f = node.func
        return f.id if isinstance(f, ast.Name) else (
            f.attr if isinstance(f, ast.Attribute) else None
        )

    def check_tree(tree: ast.AST, src_lines: list[str], bindings: dict,
                   owner: str, violations: list[str]) -> None:
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            op = call_name(node)
            if op not in BUCKETED:
                continue
            line = src_lines[node.lineno - 1] if node.lineno - 1 < len(src_lines) else ""
            if "bucket-fixed-ok:" in line:
                continue
            kwarg = BUCKETED[op]
            kw = next((k for k in node.keywords if k.arg == kwarg), None)
            if kw is None:
                violations.append(
                    f"{owner}: {op}() omits {kwarg} (silent fixed default)"
                )
                continue
            v = kw.value
            ok = (
                isinstance(v, ast.Constant) and v.value == "auto"
            ) or (
                isinstance(v, ast.Name) and bindings.get(v.id) == "auto"
            )
            if not ok:
                violations.append(
                    f"{owner}: {op}({kwarg}={ast.unparse(v)}) is not 'auto'"
                )

    violations: list[str] = []
    for name, fn in llmops.BENCH_ONLY.items():
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
        lam = next((n for n in ast.walk(tree) if isinstance(n, ast.Lambda)), None)
        if lam is not None and isinstance(lam.body, ast.Call):
            # follow the forwarding: the lambda's constant kwargs become
            # bindings when analyzing the target certification query
            target_name = call_name(lam.body)
            bindings = {
                k.arg: k.value.value
                for k in lam.body.keywords
                if k.arg and isinstance(k.value, ast.Constant)
            }
            target = getattr(llmops, target_name, None)
            assert target is not None, f"{name}: lambda target {target_name} not found"
            tsrc = textwrap.dedent(inspect.getsource(target))
            check_tree(ast.parse(tsrc), tsrc.splitlines(), bindings, name, violations)
            # the lambda body itself may also call a bucketed op directly
            check_tree(lam.body, src.splitlines(), {}, name, violations)
        else:
            check_tree(tree, src.splitlines(), {}, name, violations)
    assert not violations, "\n".join(violations)


def test_auto_bucketing_memoizes_corpus_count(spark, sf_dir, monkeypatch):
    """VERDICT r14 nit 1: "auto" bucket sizing paid a full corpus
    count() PER INVOCATION — a full scan per query batch at 100 TB.
    Now memoized per plan semanticHash (the scale_out pattern): the
    second auto-resolved call on the same corpus plan must trigger NO
    new count job, and clear_nparts_memo invalidates (file rewrites
    change row counts exactly when they change partition counts)."""
    from pyspark.sql import functions as F

    # Spark 4 dispatches to the classic implementation class — patching
    # the abstract pyspark.sql.DataFrame would miss its count() override
    from pyspark.sql.classic.dataframe import DataFrame

    from nyc_taxi_etl_dashboard_spark.operators import (
        _COUNT_MEMO,
        _STAT_MEMO,
        clear_nparts_memo,
        memo_count,
    )
    from nyc_taxi_etl_dashboard_spark.operators.similarity import knn_lsh
    from nyc_taxi_etl_dashboard_spark.sources import read_table

    clear_nparts_memo()
    # the stat-keyed memo survives clear_nparts_memo BY DESIGN (it is
    # keyed on file size/mtime, so it self-invalidates); earlier tests
    # in the same process may already have probed this corpus — empty
    # it so the count-call assertions below see a deterministic state
    _STAT_MEMO.clear()
    calls = {"n": 0}
    orig = DataFrame.count

    def spy(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "count", spy)
    e = read_table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 2)
    # plan construction resolves n_planes="auto" -> exactly one count
    knn_lsh(e, qs, k=5, n_planes="auto")
    assert calls["n"] == 1
    # same corpus plan again -> memo hit, no new job
    knn_lsh(e, qs, k=5, n_planes="auto")
    assert calls["n"] == 1
    assert memo_count(e) == orig(e.alias("twin"))  # value correct; alias shares hash
    assert calls["n"] == 1
    # read_table-tagged frames ride the STAT-keyed memo (optimization
    # r18), which survives the blanket per-query clear — the count is a
    # property of the FILES, and the key embeds their size/mtime, so a
    # clear is neither needed nor paid (at 100 TB this count is a full
    # scan per query batch otherwise)
    clear_nparts_memo()
    assert not _COUNT_MEMO
    knn_lsh(e, qs, k=5, n_planes="auto")
    assert calls["n"] == 1
    # UNTAGGED frames (anything derived — new Python object, no _sg_src)
    # keep the original plan-keyed lifecycle: cleared -> one fresh count
    e2 = e.filter(F.lit(True))
    memo_count(e2)
    assert calls["n"] == 2
    memo_count(e2)
    assert calls["n"] == 2
    clear_nparts_memo()
    memo_count(e2)
    assert calls["n"] == 3


def test_stat_memo_invalidates_on_file_rewrite(spark, sf_dir, tmp_path):
    """The stat-keyed probe memo (optimization r18) must be exactly as
    safe as the clear-every-query regime it replaces: rewriting the
    backing file changes its (size, mtime_ns) fingerprint, so the next
    probe re-runs against the new data with NO clear call anywhere."""
    import shutil

    from pyspark.sql.classic.dataframe import DataFrame

    from nyc_taxi_etl_dashboard_spark.operators import memo_count, memo_dim
    from nyc_taxi_etl_dashboard_spark.sources import read_table

    src = f"{sf_dir}/embeddings.parquet"
    work = tmp_path / "embeddings.parquet"
    shutil.copyfile(src, work)

    e = read_table(spark, str(tmp_path), "embeddings")
    n1 = memo_count(e)
    d1 = memo_dim(e, "embedding")
    assert n1 == e.count() and d1 == 64
    # cached: re-reading the same files is a memo hit
    e_again = read_table(spark, str(tmp_path), "embeddings")
    orig_count = DataFrame.count
    calls = {"n": 0}

    def spy(self):
        calls["n"] += 1
        return orig_count(self)

    DataFrame.count = spy
    try:
        assert memo_count(e_again) == n1
        assert calls["n"] == 0
        # rewrite the file (half the rows -> different size and mtime):
        # the fingerprint changes, the memo misses, the count re-runs
        half = orig_count(spark.read.parquet(src)) // 2
        spark.read.parquet(src).limit(half).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "tmp_out"))
        part = next((tmp_path / "tmp_out").glob("*.parquet"))
        shutil.copyfile(part, work)
        e_new = read_table(spark, str(tmp_path), "embeddings")
        assert memo_count(e_new) == half
        assert calls["n"] == 1
    finally:
        DataFrame.count = orig_count


def test_lit_double_helpers_bit_identical_to_unrolled_lits(spark):
    """operators.lit_double_array/lit_double_matrix (optimization r18)
    must produce Literals bit-identical to the unrolled F.lit form for
    every representable double — including subnormals, -0.0, huge
    exponents, and 17-significant-digit values — since certified
    queries embed k-means/PQ models through them."""
    import struct

    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators import (
        lit_double_array,
        lit_double_matrix,
    )

    vals = [
        0.5,
        1e-07,
        -3.4e22,
        1.0,
        0.1 + 0.2,
        1 / 3,
        5e-324,
        1.7976931348623157e308,
        -0.0,
        2.2250738585072014e-308,
        -1.2345678901234567e-100,
    ]
    row = (
        spark.range(1)
        .select(
            F.array(*[F.lit(float(x)) for x in vals]).alias("o"),
            lit_double_array(vals).alias("n"),
        )
        .first()
    )
    bits = lambda xs: [struct.pack("<d", x) for x in xs]  # noqa: E731
    assert bits(row.o) == bits(row.n)
    m = [vals[:4], vals[4:8]]
    row2 = (
        spark.range(1)
        .select(
            F.array(
                *[F.array(*[F.lit(float(x)) for x in r]) for r in m]
            ).alias("o"),
            lit_double_matrix(m).alias("n"),
        )
        .first()
    )
    assert [bits(x) for x in row2.o] == [bits(x) for x in row2.n]


def test_sql_double_rejects_non_finite(spark):
    """VERDICT r18 item 6: the SQL-literal helper must raise a clear
    error on NaN/±inf instead of emitting text the parser rejects (or
    silently mis-resolves). No current model path can produce them —
    this pins the helper's contract for its next caller."""
    import pytest as _pytest

    from nyc_taxi_etl_dashboard_spark.operators import (
        _sql_double,
        lit_double_array,
    )

    assert _sql_double(1.5) == "1.5D"
    for bad in (float("nan"), float("inf"), float("-inf")):
        with _pytest.raises(ValueError, match="non-finite"):
            _sql_double(bad)
        with _pytest.raises(ValueError, match="non-finite"):
            lit_double_array([0.0, bad])


def test_density_gate_linear_branch_plan_shape(spark, sf_dir):
    """v16's production linear branch must keep the O(n) promise in the
    PLAN: centroids join back as a broadcast (labels are bounded), the
    decile threshold is a scalar broadcast — no sort-merge join, no
    range partitioning (a global sort would reintroduce the cost the
    branch exists to avoid), no Python UDF."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators.similarity import density_gate
    from nyc_taxi_etl_dashboard_spark.sources import read_table

    e = read_table(spark, sf_dir, "embeddings")
    plan = (
        density_gate(e, decile=0.1, budget=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "rangepartitioning" not in plan
    assert "PythonUDF" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_embedding_curation_prod_plan_shape(spark, sf_dir):
    """x26_prod (the embedding curation chain's production config): no
    global sort anywhere (the cert-only percent_rank is absent — the
    gate is a percentile_approx scalar, the ONE single-partition
    exchange), no Python UDF, and the diversity-cap window partitions
    by label. SortMergeJoins are expected and correct here: CC's
    pointer-jumping self-joins and the vec_id provenance joins run on
    slim id frames that shuffle on their key at scale."""
    import re as _re

    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY

    plan = (
        BENCH_ONLY["x26_prod"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan
    assert "PythonUDF" not in plan
    assert len(_re.findall(r"Exchange SinglePartition", plan)) <= 1
    assert "percent_rank" not in plan  # cert-only gate form must not leak


def test_joint_curation_prod_plan_shape(spark, sf_dir):
    """x27_prod (the joint chain's production config): the cert-only
    exact percent_rank must not leak into the prod plan, the gate's
    percentile_approx scalar is the ONE SinglePartition exchange, no
    Python UDF, no global sort. SortMergeJoins on doc_id are expected:
    the doc->embedding provenance joins shuffle on their key at scale."""
    import re as _re

    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY

    plan = (
        BENCH_ONLY["x27_prod"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan
    assert "PythonUDF" not in plan
    assert len(_re.findall(r"Exchange SinglePartition", plan)) <= 1
    assert "percent_rank" not in plan  # cert-only gate form must not leak


def test_greedy_pack_plan_shape(spark, sf_dir):
    """x28: ONE grouped-pandas stage (FlatMapGroupsInPandas), the doc
    scan pruned to the three packing columns (column pruning reaches
    through applyInPandas), no SortMergeJoin and no global sort."""
    import re as _re

    from nyc_taxi_etl_dashboard_spark.plans.llmops import QUERIES

    plan = (
        QUERIES["x28_greedy_pack"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(_re.findall(r"FlatMapGroupsInPandas", plan)) == 1
    assert "SortMergeJoin" not in plan
    assert "rangepartitioning" not in plan
    assert "n_chars" not in plan and "lang" not in plan  # pruned scan


def test_pack_efficiency_plan_shape(spark, sf_dir):
    """x29: exactly TWO grouped-pandas stages (one per packing mode),
    the per-source aggregates joined broadcast (never a SortMergeJoin
    on the |sources|-row frames), scans pruned to the packing columns,
    no global sort."""
    import re as _re

    from nyc_taxi_etl_dashboard_spark.plans.llmops import QUERIES

    plan = (
        QUERIES["x29_pack_efficiency"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(_re.findall(r"FlatMapGroupsInPandas", plan)) == 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "rangepartitioning" not in plan
    assert "n_chars" not in plan  # pruned scan


def test_store_health_plan_shape(spark, sf_dir):
    """v20: the dashboard composes the three kernels without a new
    shuffle — the only wide exchanges are the ones the kernels own
    (churn groupBy, v17 assignment aggregates, v18 candidate window);
    the store-wide KPI frames arrive as broadcast joins over
    single-row aggregates. The per-probe aggregate joins are
    broadcast-hinted (bounded by the probe set); the ONE allowed
    SortMergeJoin is annk-vs-exact — both sides |probes|x k rows,
    and force-broadcasting the exact leg measured 1.22x paired
    (PERF_AB_r16: it serializes the ground-truth leg behind a
    broadcast barrier), so the hint stops there."""
    from nyc_taxi_etl_dashboard_spark.plans.llmops import QUERIES

    plan = (
        QUERIES["v20_store_health"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("SortMergeJoin") <= 1
    # the 1-row KPI frames ride broadcast nested-loop cross joins
    assert "BroadcastNestedLoopJoin" in plan
    # no unhinted cartesian over corpus-scale inputs
    assert "CartesianProduct" not in plan
