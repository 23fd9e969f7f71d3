"""As-of join edge semantics: inclusive bound, equal-ts ties, no-predecessor."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vectolite_spark.operators.asof import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_asof_join_semantics(spark):
    rights = spark.createDataFrame(
        [
            (1, ts(10), 101, 1.0),
            (1, ts(20), 102, 2.0),
            (1, ts(20), 103, 3.0),  # same ts: highest id wins the tie
            (2, ts(50), 201, 5.0),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    lefts = spark.createDataFrame(
        [
            (1, ts(5), 900),    # before any right -> NULL
            (1, ts(20), 901),   # equal ts -> inclusive, tie -> id 103
            (1, ts(99), 902),   # after all -> latest (103)
            (2, ts(60), 903),
            (3, ts(60), 904),   # key with no rights -> NULL
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(
            lefts, rights, key="user_id", left_ts="ts", right_ts="ts",
            left_id="event_id", right_id="event_id", right_payload=["value"],
        ).collect()
    }
    assert out[900] == (None, None)
    assert out[901] == (103, 3.0)
    assert out[902] == (103, 3.0)
    assert out[903] == (201, 5.0)
    assert out[904] == (None, None)


def test_range_join_bands(spark):
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 149.9), (4, 5000.0)], "id long, value double"
    )
    bands = spark.createDataFrame(
        [("a", 0.0, 50.0), ("b", 50.0, 150.0)], "band string, lo double, hi double"
    )
    got = {r["id"]: r["band"] for r in range_join(facts, bands, "value").collect()}
    assert got[1] == "a"
    assert got[2] == "b"  # lo inclusive
    assert got[3] == "b"  # hi exclusive boundary respected
    assert got[4] is None  # left join keeps uncovered values
