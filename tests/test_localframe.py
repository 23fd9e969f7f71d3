"""local_df must be byte-equivalent to the default createDataFrame path
across every schema shape the engine builds locally — same rows, same
schema, same values — while producing exactly the requested slice count
(the whole point: 1 Python partition instead of defaultParallelism)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from vectolite_spark.localframe import local_df

CASES = [
    # (rows, schema) — the shapes used at real call sites
    ([(8,)], "n_buckets int"),
    ([(1, "a"), (2, "b")], "id long, s string"),
    ([("tri", 3, 1)], "trigram string, df bigint, bucket bigint"),
    ([(0, [1.0, 2.0, 3.0]), (1, [0.0, -1.5, 2.5])], "query_id long, qv array<float>"),
    ([(1, None), (None, "x")], "id long, s string"),
    ([], "id long, s string"),
    (
        [Row(doc_id=5, score=0.25), Row(doc_id=6, score=None)],
        "doc_id long, score double",
    ),
    (
        [(b"\x00\x01", {"k": "v"})],
        T.StructType(
            [
                T.StructField("blob", T.BinaryType()),
                T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
            ]
        ),
    ),
]


@pytest.mark.parametrize("rows,schema", CASES, ids=[str(i) for i in range(len(CASES))])
def test_local_df_matches_default_path(spark, rows, schema):
    got = local_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(repr, got.collect())) == sorted(map(repr, want.collect()))
    assert got.rdd.getNumPartitions() == 1


def test_local_df_default_path_pays_parallelism_tax(spark):
    # the pathology local_df exists to remove: a 1-row local list becomes
    # defaultParallelism partitions on the default path
    want = spark.createDataFrame([(8,)], "n_buckets int")
    assert want.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_local_df_slices(spark):
    rows = [(i,) for i in range(10)]
    df = local_df(spark, rows, "id long", slices=4)
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r.id for r in df.collect()) == list(range(10))


def test_local_df_requires_schema(spark):
    with pytest.raises(ValueError):
        local_df(spark, [(1,)], None)


def test_local_df_accepts_generator(spark):
    df = local_df(spark, ((i, str(i)) for i in range(3)), "id long, s string")
    assert df.count() == 3
