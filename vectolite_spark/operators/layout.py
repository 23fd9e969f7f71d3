"""Bucketed table layout: co-located (shuffle-free) joins at scale.

The single biggest shuffle in a TPC-H-shaped workload is the
lineitem<->orders join: both sides hash-exchange on the order key before
every SortMergeJoin.  Spark's bucketed tables remove that exchange
permanently — write each table ONCE clustered into N buckets by the join
key (Murmur3 hash, bucket id encoded in the file name), and every later
join/aggregation on that key reads co-located buckets with NO shuffle on
either input.  At 100 TB this converts the dominant recurring exchange
of a daily pipeline into a one-time layout cost, exactly like the IVF /
BM25 persisted indexes do for the retrieval paths (the same
build-once/probe-many economics, applied to relational joins).

Mechanics worth documenting because they're subtle:

* The data is written with ``repartition(n, key)`` BEFORE
  ``bucketBy(n, key)`` so each bucket lands in exactly one file (the
  writer otherwise emits numBuckets files *per task*).
* ``sortBy(key)`` stamps per-bucket sort metadata, letting the
  SortMergeJoin skip its sort when each bucket is a single file.
* The bucketed files outlive the Spark session, but catalog entries do
  not (in-memory catalog).  ``ensure_bucketed_table`` therefore
  re-registers an EXTERNAL table over the existing files with
  ``CREATE TABLE ... USING PARQUET CLUSTERED BY ... LOCATION`` — the
  scan recovers bucket ids from the file names, so re-registration is
  metadata-only (no rewrite, no scan).
* The bucket spec in the DDL must match the layout the files were
  written with (same key, same count); the recipe tag in the cache path
  pins that, and a changed spec changes the path.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["ensure_bucketed_table", "bucketed_join"]


def _table_ident(path: str) -> str:
    """Catalog-safe table name derived from the cache path (which already
    carries the recipe + dataset fingerprint, so names never collide
    across datasets or bucket specs within one session)."""
    return "bkt_" + re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(path)).lower()


def ensure_bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    buckets: int = 8,
) -> str:
    """Build-if-absent bucketed copy of ``table`` clustered by ``key``;
    returns the catalog table name to query.

    First call per dataset pays one write (a single exchange on ``key`` —
    the same exchange a single join would have paid, amortized over every
    future join).  Later sessions re-attach the existing files with a
    metadata-only DDL.
    """
    from vectolite_spark.registry import index_cache_path
    from vectolite_spark.schema import load_table

    path = index_cache_path(f"bktv1_{table}_{key}_b{buckets}", sf_dir)
    name = _table_ident(path)
    if spark.catalog.tableExists(name):
        return name

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        # files exist from a prior session: metadata-only re-attach
        schema_ddl = spark.read.parquet(path).schema.toDDL()
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} ({schema_ddl}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {buckets} BUCKETS "
            f"LOCATION '{path}'"
        )
        return name

    df = load_table(spark, sf_dir, table)
    (
        df.repartition(buckets, F.col(key))
        .write.bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return name


def bucketed_join(
    spark: SparkSession,
    sf_dir: str,
    left: str,
    right: str,
    left_key: str,
    right_key: str,
    buckets: int = 8,
) -> DataFrame:
    """Join two tables on a shared key through their bucketed layouts.

    Both sides cluster into the same bucket count on their join key, so
    the SortMergeJoin consumes co-located buckets directly — the physical
    plan has no shuffle above either scan (asserted in
    tests/test_layout.py).  This is the repeatable-join serving shape:
    layout cost once, every subsequent join shuffle-free.
    """
    lt = ensure_bucketed_table(spark, sf_dir, left, left_key, buckets)
    rt = ensure_bucketed_table(spark, sf_dir, right, right_key, buckets)
    ldf = spark.table(lt)
    rdf = spark.table(rt)
    return ldf.join(rdf, ldf[left_key] == rdf[right_key])
