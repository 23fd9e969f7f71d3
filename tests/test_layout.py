"""Bucketed-layout tests: the join must be shuffle-free and
layout-invariant (same results as the plain parquet join)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from vectolite_spark.operators.layout import bucketed_join, ensure_bucketed_table
from vectolite_spark.schema import load_table

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_shuffle_above_scans(spark):
    # force SMJ so the assertion exercises the bucketed path, not a
    # broadcast that would trivially avoid the shuffle at toy scale
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            spark, SF, "lineitem", "orders", "l_orderkey", "o_orderkey"
        )
        plan = _executed_plan(j.select("o_orderpriority"))
        assert "Bucketed: true" in plan
        assert "SortMergeJoin" in plan
        # no exchange anywhere in the join subtree: co-located buckets
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark):
    j = bucketed_join(
        spark, SF, "lineitem", "orders", "l_orderkey", "o_orderkey"
    )
    got = {
        (r["o_orderpriority"], r["n"])
        for r in j.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    want = {
        (r["o_orderpriority"], r["n"])
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_bucketed_table_reattach_is_metadata_only(spark):
    # second ensure with the files on disk but the catalog entry dropped
    # must re-register (DDL) without rewriting, and keep the bucket spec
    name = ensure_bucketed_table(spark, SF, "orders", "o_orderkey", buckets=8)
    spark.sql(f"DROP TABLE {name}")
    name2 = ensure_bucketed_table(spark, SF, "orders", "o_orderkey", buckets=8)
    assert name2 == name
    # one file per bucket (repartition-before-bucketBy contract); bucket id
    # is recoverable from the file names, which is what lets the DDL
    # re-attach trust the existing layout
    files = spark.table(name2).inputFiles()
    assert len(files) == 8, files
    assert all(re.search(r"_0000\d\.", f) for f in files)
    # the reattached table still joins shuffle-free (a bare projection
    # legitimately skips bucketed scan via autoBucketedScan, so the join
    # is the meaningful probe)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            spark, SF, "lineitem", "orders", "l_orderkey", "o_orderkey"
        )
        plan = _executed_plan(j.select("o_orderpriority"))
        assert "Bucketed: true" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
