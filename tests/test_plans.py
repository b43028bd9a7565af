"""Physical-plan audits (the 100 TB posture, SURVEY.md §4.2).

Correctness says the answer is right; these tests pin that the PLAN
is right — filters reach the parquet scan, projections prune the read
schema, small dims broadcast, partition filters prune directories,
and rank-filters become per-group limits. A regression here means a
query that still passes the oracle but would melt at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.registry import all_queries
from tests.conftest import SF0001, SF001


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet(spark):
    df = all_queries()["q_filter_cmp"](spark, SF0001)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "l_quantity" in m.group(1), m


def test_column_pruning_reads_two_columns(spark):
    df = all_queries()["q_scan_pruned"](spark, SF0001)
    plan = plan_of(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert sorted(cols) == ["l_orderkey", "l_quantity"], cols


def test_broadcast_join_pinned(spark):
    df = all_queries()["q_join_broadcast"](spark, SF0001)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, plan


def test_partition_pruning_on_partitioned_sink(spark):
    df = all_queries()["q_sink_partition_prune"](spark, SF0001)
    plan = plan_of(df)
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan


def test_topk_pergroup_uses_window_group_limit(spark):
    df = all_queries()["q_topk_pergroup"](spark, SF0001)
    plan = plan_of(df)
    assert "WindowGroupLimit" in plan, plan


def test_global_topk_avoids_full_sort(spark):
    df = all_queries()["q_topk_global"](spark, SF0001)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_agg_is_partial_then_final(spark):
    df = all_queries()["q_agg_group"](spark, SF0001)
    plan = plan_of(df)
    # two HashAggregate nodes around the exchange = map-side combine
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan


def test_semi_join_stays_semi(spark):
    df = all_queries()["q_join_semi"](spark, SF0001)
    plan = plan_of(df)
    assert "LeftSemi" in plan, plan


def test_scans_use_vectorized_columnar_reader(spark):
    df = read_table(spark, SF0001, "lineitem").select("l_orderkey")
    plan = plan_of(df)
    assert "ColumnarToRow" in plan or "Scan parquet" in plan


def test_minhash_has_no_cartesian_product(spark):
    df = all_queries()["q_dedup_minhash"](spark, SF0001)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, "LSH must not cross-join"


def test_events_filter_pushdown_survives_ns_conversion(spark):
    e = read_table(spark, SF0001, "events").where(F.col("user_id") == 3)
    plan = plan_of(e)
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "user_id" in m.group(1), plan


def test_global_ranking_has_no_single_partition_window(spark):
    """q_win_ntile_pctrank must not funnel all rows through one task:
    every WindowExec in the plan needs a non-empty partition spec
    (the two-pass range-partition + offset design, VERDICT r2 #2,
    now shared via operators.global_row_number)."""
    df = all_queries()["q_win_ntile_pctrank"](spark, SF0001)
    plan = plan_of(df)
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, plan
    # every window spec's first column is the partition key `__pid`
    # (an unpartitioned spec would lead with the order col o_totalprice)
    assert set(specs) == {"__pid"}, specs
    # and the range-repartition pass must be present (shared via reuse)
    assert "rangepartitioning" in plan.lower(), plan


def test_python_datasource_partition_fanout(spark):
    """The custom Python DataSource's partitions() must drive scan
    parallelism — 8 declared slices → 8 scan partitions."""
    from plankton_spark.sources.pyds import register

    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 1000)
        .option("n_partitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000


def test_gemm_ops_never_collect_to_driver(spark, monkeypatch):
    """The grid-GEMM similarity ops must be fully distributed: building
    AND executing them may not pull query data to the driver. At 100 TB
    a collect() here means the whole vector corpus on one machine."""
    import pyspark.sql.classic.dataframe as cdf

    import plankton_spark.functions as pf
    import plankton_spark.queries.llm_dedup as lld

    orig_collect = cdf.DataFrame.collect

    def boom(self, *a, **k):
        raise AssertionError("driver-side collect() in a GEMM op")

    # the ONE sanctioned driver fetch is the named scalar choke point
    # (embcos's refusal guard reads a 1-row HLL aggregate) — exempt it
    # but hold it to its contract: exactly one row ever crosses
    def scalar_ok(df):
        rows = orig_collect(df)
        assert len(rows) == 1, f"driver_scalar moved {len(rows)} rows"
        return rows[0]

    monkeypatch.setattr(cdf.DataFrame, "collect", boom)
    monkeypatch.setattr(pf, "driver_scalar", scalar_ok)
    monkeypatch.setattr(lld, "driver_scalar", scalar_ok)
    qs = all_queries()
    for name in ("q_dedup_embcos", "q_sim_cosine_topk"):
        df = qs[name](spark, SF0001)
        assert df.count() >= 0  # executes the full plan, collect-free


def test_text_pack_window_is_two_level(spark):
    """The heavy running-sum window must partition on (lang, blk), not
    lang alone — with ~5 languages a lang-only window serializes each
    language through one task at scale. The lang-only window may only
    appear at block granularity (the tiny offsets frame)."""
    df = all_queries()["q_text_pack"](spark, SF001)
    plan = plan_of(df)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    doc_level = [s for s in specs if "doc_id" in s]
    assert doc_level and all("blk" in s for s in doc_level), specs
    # and the per-row side still sees many partitions, not #langs
    t = read_table(spark, SF001, "documents").select(
        "lang", F.floor(F.col("doc_id") / 64).alias("blk")
    )
    assert t.select("lang", "blk").distinct().count() > 5


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_iterative_loops_release_superseded_cache(spark):
    """PageRank and label propagation persist per-iteration frames;
    superseded generations must be unpersisted inside the loop, and
    repeated invocation of the same query must not accumulate caches
    (one pinned generation per key, via cache.persist_swap)."""
    spark.catalog.clearCache()
    qs = all_queries()
    base = _n_persistent_rdds(spark)
    qs["q_graph_pagerank"](spark, SF0001).count()
    after_one = _n_persistent_rdds(spark)
    # ew + final ranks only — not one frame per iteration
    assert after_one - base <= 2, (base, after_one)
    qs["q_graph_pagerank"](spark, SF0001).count()
    assert _n_persistent_rdds(spark) - base <= 2  # swap, not accumulate

    base = _n_persistent_rdds(spark)
    qs["q_dedup_components"](spark, SF0001).count()
    qs["q_dedup_components"](spark, SF0001).count()
    # minhash sets + edges + final labels, single generation each
    assert _n_persistent_rdds(spark) - base <= 3


def test_label_propagation_checkpoints_long_chains(spark):
    """A 24-node path graph needs ~22 propagation rounds — enough to
    cross the checkpoint interval twice. The fixpoint must still be
    exact (every node labeled with the chain's minimum)."""
    from plankton_spark.queries.scale_patterns import min_label_propagation

    n = 24
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    labs = min_label_propagation(edges, max_rounds=40, checkpoint_every=6)
    rows = {r.node: r.lab for r in labs.collect()}
    assert rows == {i: 0 for i in range(n)}


def test_dynamic_partition_pruning(spark):
    """DPP: joining a partitioned fact on its partition column against
    a filtered dim must inject a runtime partition filter (the scan
    waits for the dim's broadcast result and prunes directories) —
    at 100 TB this is the difference between scanning one day and
    scanning the archive."""
    from plankton_spark.io import read_table
    from plankton_spark.queries.scans import _scratch

    path = _scratch(SF001, "orders_dpp")
    read_table(spark, SF001, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")], "st string, label string"
    ).where(F.col("label") == "finished")
    joined = fact.join(dim, fact.o_orderstatus == dim.st).groupBy("st").count()
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]


def test_span_dedup_has_no_cartesian_and_prunes_unique_spans(spark):
    """q_dedup_spans must equi-join on the span hash (no cross join)
    and must aggregate span frequencies BEFORE the pair join (the
    HAVING > 1 cut is what keeps the join off the unique-span tail)."""
    df = all_queries()["q_dedup_spans"](spark, SF0001)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, plan
    # frequency cut: an aggregate on the span hash feeding the join
    assert plan.count("HashAggregate") >= 2, plan


def test_gram_matrix_partial_aggregates(spark):
    """q_emb_gram: 136-group agg must combine map-side (partial+final
    HashAggregate pair) so the shuffle is 136 rows per partition, not
    one row per outer-product entry."""
    df = all_queries()["q_emb_gram"](spark, SF0001)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan, plan


def test_gram_matrix_full_width_same_shape(spark):
    """q_emb_gram_full (64 dims, 2080 groups) must keep exactly the
    q_emb_gram plan shape: partial+final agg around ONE shuffle — the
    per-vector expansion grows 15x but the exchanged rows stay
    bounded by groups x partitions, corpus-size-independent."""
    df = all_queries()["q_emb_gram_full"](spark, SF0001)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2, plan
    # formatted explain names each node in the tree and again in the
    # details section — count distinct node ids, expect ONE shuffle
    assert len(set(re.findall(r"\((\d+)\) Exchange", plan))) == 1, plan


def test_sample_assembly_single_shuffle_no_window(spark):
    """q_sample_assembly is ONE groupBy — no WindowExec, and the sort
    happens inside the agg expression (sort_array), not as a plan-level
    global Sort."""
    df = all_queries()["q_sample_assembly"](spark, SF0001)
    plan = plan_of(df)
    assert "Window" not in plan, plan


def test_profile_table_default_has_no_expand(spark):
    """The ANALYZE surface defaults to HLL sketches: the default
    profile plan must contain no Expand (exact multi-column
    COUNT(DISTINCT) multiplies scanned rows by #profiled columns —
    measured 4.9x at sf10; wrong default at 100 TB)."""
    from plankton_spark.operators import profile_table

    li = read_table(spark, SF0001, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    default_plan = plan_of(profile_table(li, cols))
    assert "Expand" not in default_plan, default_plan
    assert "HyperLogLog" in default_plan or "approx_count_distinct" in (
        default_plan
    )
    # the exact opt-in is the one that pays the EXPAND
    exact_plan = plan_of(profile_table(li, cols, exact=True))
    assert "Expand" in exact_plan


def test_range_binned_join_is_hash_not_bnl(spark):
    """q_join_range_binned's whole claim: a pure interval predicate
    becomes an EQUI join on the bin id — the plan must contain a
    hash/merge join and no BroadcastNestedLoopJoin/Cartesian."""
    df = all_queries()["q_join_range_binned"](spark, SF001)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan), plan


def test_tpcds_widerollup_expands_then_partially_aggregates(spark):
    """Q67 shape: the 5-level rollup runs as Expand -> partial
    HashAggregate -> exchange -> final — group cells cross the
    shuffle, not input rows."""
    df = all_queries()["q_tpcds_widerollup"](spark, SF001)
    plan = plan_of(df)
    assert "Expand" in plan
    # partial before the exchange: Spark marks partial aggregation
    # explicitly in formatted plans
    assert re.search(r"HashAggregate .*\n.*keys", plan) or "partial" in plan.lower()


def test_tpcds_multichannel_semijoins_not_loops(spark):
    """Q23 shape: both IN-subqueries must decorrelate to semi joins
    (broadcastable key sets), never nested-loop re-execution."""
    df = all_queries()["q_tpcds_multichannel"](spark, SF001)
    plan = plan_of(df)
    assert "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_semantic_dedup_pair_pass_is_cluster_grouped_gemm(spark):
    """SemDeDup's scale claim: pairwise work is cluster-bounded — the
    candidate pass is ONE FlatMapGroupsInPandas keyed by the cluster
    id (per-cluster GEMM), and the only pair-shaped joins left are the
    candidate-bounded exact-rescore equi-joins. No CartesianProduct,
    no component self-join materializing Σ|c|²×64 rows."""
    df = all_queries()["q_dedup_semantic"](spark, SF001)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    flat = opt.replace("\n", " ")
    assert re.search(r"FlatMapGroupsInPandas \[k#?\d*", flat), opt
    assert "CartesianProduct" not in opt, opt
    # the rescore attaches embeddings by candidate id — equi-joins on
    # vec_a / vec_b, not a component-index self-join
    assert re.search(r"vec_a#?\d*L?\b", flat), opt


def test_variant_shredded_filter_pushes_into_leaf_column(spark):
    """Variant shredding's scale claim: the typed predicate reaches the
    parquet scan as a PushedFilter ON THE SHREDDED LEAF, and the
    ReadSchema prunes away the binary metadata/value columns — variant
    filtering at plain-column speed."""
    df = all_queries()["q_json_variant_shredded"](spark, SF0001)
    plan = plan_of(df)
    assert "GreaterThanOrEqual(props_shredded.typed_val" in plan, plan
    i = plan.find("ReadSchema")
    rs = plan[i : i + 200]
    assert "typed_value:bigint" in rs, rs
    assert "metadata" not in rs, rs  # binary columns pruned from the scan


def test_variant_shredded_partial_pushes_both_leaves(spark):
    """PARTIAL shredding keeps the pushdown: the merge-on-read
    predicate reaches the scan as Or(typed-leaf >= 50,
    IsNotNull(residual leaf)) — BOTH shredded leaves, never the binary
    metadata — and the ReadSchema carries only the k field group (the
    variant dictionary column is pruned)."""
    df = all_queries()["q_json_variant_shredded_partial"](spark, SF0001)
    plan = plan_of(df)
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m, plan
    pf = m.group(1)
    assert (
        "Or(GreaterThanOrEqual(props_shredded.typed_value.k.typed_value,50)"
        in pf
    ), pf
    assert "IsNotNull(props_shredded.typed_value.k.value)" in pf, pf
    i = plan.find("ReadSchema")
    rs = plan[i : i + 250]
    assert "typed_value:bigint" in rs and "value:binary" in rs, rs
    assert "metadata" not in rs, rs


def test_variant_shredded_nested_pushes_through_both_levels(spark):
    """NESTED shredding keeps the pushdown: the b >= 50 predicate
    lands on the DOUBLY-nested typed leaf and the ReadSchema carries
    the two leaf chains while the binary metadata column is pruned."""
    df = all_queries()["q_json_variant_shredded_nested"](spark, SF0001)
    plan = plan_of(df)
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m, plan
    assert (
        "GreaterThanOrEqual(props_shredded.typed_value.a.typed_value"
        ".b.typed_value,50)" in m.group(1)
    ), m.group(1)
    i = plan.find("ReadSchema")
    rs = plan[i : i + 400]
    # nested-schema pruning goes all the way down: only the two typed
    # LEAVES are read — the per-field binary residuals and the variant
    # metadata never reach the scan
    assert "b:struct<typed_value:bigint" in rs, rs
    assert "s:struct<typed_value:string" in rs, rs
    assert "metadata" not in rs and "value:binary" not in rs, rs
