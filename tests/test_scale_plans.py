"""Physical-plan regression tests: the scale properties SCALING.md claims
must stay true as code evolves (pushdown, broadcast, zero-exchange top-k,
partial aggregation, shuffle-free bucketed joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectolite_spark.schema import load_table


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_topk_has_no_exchange(spark, sf_dir):
    from vectolite_spark.operators.topk import topk_ids

    embs = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in embs.first()["embedding"]]
    p = plan_str(topk_ids(embs, q, 10))
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p  # partial top-k -> driver merge, no shuffle


def test_filter_and_pruning_reach_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    ).select("l_returnflag")
    p = plan_str(li)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    assert "ReadSchema: struct<l_returnflag:string,l_shipdate:timestamp_ntz>" in p


def test_dimension_joins_broadcast(spark, sf_dir):
    import __spark_entry__ as m

    p = plan_str(m.queries()["join_revenue_by_nation"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "partial_" in p  # map-side aggregation before the shuffle


def test_minhash_partial_min_before_exchange(spark, sf_dir):
    from vectolite_spark.operators.dedup import minhash_signatures

    p = plan_str(minhash_signatures(load_table(spark, sf_dir, "documents")))
    # the partial (map-side) min must appear, and before the Exchange
    assert "partial_min" in p
    assert p.index("partial_min") > p.index("Exchange") or "Exchange" in p


def test_no_registry_query_plans_a_cartesian_product(spark, sf_dir):
    # global scale-invariant: NO declared query may compile to an unbounded
    # CartesianProduct — every pairwise operator must block/bucket first.
    # (BroadcastNestedLoopJoin is allowed: it only appears broadcast-sided,
    # e.g. for the single-row query-vector attach or non-equi range joins.)
    from vectolite_spark import registry

    offenders = []
    for name, fn in registry.QUERIES.items():
        try:
            p = plan_str(fn(spark, sf_dir))
        except Exception as e:  # building the plan must not fail either
            offenders.append(f"{name}: plan build failed: {e}")
            continue
        if "CartesianProduct" in p:
            offenders.append(f"{name}: CartesianProduct in plan")
    assert not offenders, offenders


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # SCALING.md §4: co-bucketing both sides on the join key removes the
    # exchange entirely — the 100 TB layout for lineitem<->orders.
    # (warehouse dir is a static conf; managed tables land in the default
    # spark-warehouse and are dropped in the finally block)
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    try:
        orders = spark.createDataFrame(
            [(i, float(i * 10)) for i in range(1000)], "o_orderkey long, total double"
        )
        items = spark.createDataFrame(
            [(i % 1000, j, float(j)) for i in range(2000) for j in range(1)],
            "l_orderkey long, line int, qty double",
        )
        (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
         .sortBy("o_orderkey").saveAsTable("bucketdemo.orders_b"))
        (items.write.mode("overwrite").bucketBy(8, "l_orderkey")
         .sortBy("l_orderkey").saveAsTable("bucketdemo.items_b"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob = spark.table("bucketdemo.orders_b")
        ib = spark.table("bucketdemo.items_b")
        joined = ob.join(ib, ob.o_orderkey == ib.l_orderkey)
        p = plan_str(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # co-bucketed: zero shuffle
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bucketdemo.items_b")
        spark.sql("DROP TABLE IF EXISTS bucketdemo.orders_b")
        spark.sql("DROP DATABASE IF EXISTS bucketdemo")


def test_quantized_topk_keeps_flagship_plan(spark, sf_dir):
    # int8 scoring must inherit the zero-Exchange partial-top-k shape —
    # quantization is a projection, not an excuse for a shuffle
    import __spark_entry__ as m

    p = plan_str(m.queries()["ann_quantized_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p


def test_q10_dims_broadcast_fact_join_keyed(spark, sf_dir):
    # customer/nation ride broadcasts; the only non-broadcast join is the
    # lineitem-orders key join
    import __spark_entry__ as m

    p = plan_str(m.queries()["q10_returned_items"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_q5_q8_all_dims_broadcast_single_fact_join(spark, sf_dir):
    # Q5: supplier/customer/nation/region all broadcast (nation pre-joined
    # to the region filter), so the only shuffled join is lineitem-orders.
    # Q8 adds part and a second nation alias — same property.
    import __spark_entry__ as m

    for name, n_bcast in (("q5_local_supplier_volume", 3),
                          ("q8_market_share", 5)):
        p = plan_str(m.queries()[name](spark, sf_dir))
        assert p.count("BroadcastHashJoin") >= n_bcast, name
        assert "CartesianProduct" not in p, name
        # exactly one non-broadcast (shuffle) join: the fact-fact key join
        n_shuffle_joins = p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
        assert n_shuffle_joins <= 1, f"{name}: {n_shuffle_joins} shuffled joins"


def test_bm25_stats_and_df_ride_broadcasts(spark, sf_dir):
    # single-pass BM25: the one-row stats aggregation (N, avgdl, per-term
    # df) broadcasts onto the scoring scan; the corpus itself must never
    # shuffle — no hash-partition Exchange anywhere in the plan
    import __spark_entry__ as m

    p = plan_str(m.queries()["bm25_topk"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoopJoin") >= 1
    assert "Exchange hashpartitioning" not in p
    assert "CartesianProduct" not in p


def test_decontaminate_eval_side_broadcasts(spark, sf_dir):
    # the eval split's grams broadcast; the training corpus must not
    # shuffle its exploded grams for the join
    import __spark_entry__ as m

    p = plan_str(m.queries()["decontaminate_eval_overlap"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q21_correlations_compile_to_semi_and_anti_joins(spark, sf_dir):
    # TPC-H Q21's EXISTS/NOT-EXISTS double correlation must stay equi-keyed
    # semi/anti joins (the <> suppkey residual rides the orderkey shuffle);
    # a planner change that degrades either to a nested-loop over the full
    # lineitem pair space would be a 100 TB scale-killer.
    import __spark_entry__ as m

    p = plan_str(m.queries()["q21_waiting_supplier"](spark, sf_dir))
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
