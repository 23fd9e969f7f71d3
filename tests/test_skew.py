"""Salted join: identical results to a plain join, salt spreads hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectolite_spark.operators.skew import SALT_COL, replicate_for_salt, salted_join, with_salt


def test_salted_join_equals_plain_join(spark):
    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else i, float(i)) for i in range(1000)],
        "row_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(0, 1000, 10)] + [(1, "name_1")],
        "k long, name string",
    )
    plain = {(r["row_id"], r["name"]) for r in fact.join(dim, ["k"]).collect()}
    salted = {(r["row_id"], r["name"]) for r in salted_join(fact, dim, ["k"], n_salts=8).collect()}
    assert salted == plain and len(plain) > 0


def test_salt_is_deterministic_and_spread(spark):
    fact = spark.createDataFrame(
        [(i, 1) for i in range(500)], "row_id long, k long"
    )
    a = {r["row_id"]: r[SALT_COL] for r in with_salt(fact, 8).collect()}
    b = {r["row_id"]: r[SALT_COL] for r in with_salt(fact, 8).collect()}
    assert a == b  # reproducible placement (no rand())
    used = set(a.values())
    assert len(used) == 8  # the hot key spreads across all salts
    assert all(0 <= s < 8 for s in used)


def test_replication_count(spark):
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, name string")
    assert replicate_for_salt(dim, 5).count() == 10


def test_salted_join_left_outer_and_rejects_dim_preserving(spark):
    fact = spark.createDataFrame(
        [(1, "hot"), (2, "hot"), (3, "cold"), (4, "orphan")], "row_id long, k string"
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, name string")
    left = {(r["row_id"], r["name"])
            for r in salted_join(fact, dim, ["k"], n_salts=4, how="left").collect()}
    plain = {(r["row_id"], r["name"])
             for r in fact.join(dim, ["k"], "left").collect()}
    assert left == plain  # unmatched FACT rows appear exactly once
    import pytest as _pytest

    for bad in ("right", "full", "full_outer", "rightouter"):
        with _pytest.raises(ValueError):
            salted_join(fact, dim, ["k"], n_salts=4, how=bad)


def test_zscore_anomalies_closed_form(spark):
    from vectolite_spark.operators.windows import zscore_anomalies

    # ten 10s and one 110: sample sd = sqrt(909.09...), z(110) ~ 3.015
    rows = [(i, 7, 10.0) for i in range(10)] + [(10, 7, 110.0)]
    # a constant-valued user must not divide by zero / reach sqrt(<0)
    rows += [(20 + i, 8, 5.0) for i in range(3)]
    df = spark.createDataFrame(rows, "event_id INT, user_id INT, value DOUBLE")
    got = zscore_anomalies(df, "value", "user_id", threshold=3.0).collect()
    assert [(r["event_id"], r["user_id"]) for r in got] == [(10, 7)]
    assert abs(got[0]["z_score"] - 3.0151134457776365) < 1e-12


def test_global_rank_matches_single_partition_window(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vectolite_spark.operators.windows import global_rank

    rng = random.Random(7)
    rows = [(i, rng.random()) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(8)
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["rnk"]
        for r in global_rank(df, order, rank_col="rnk", num_partitions=8).collect()
    }
    want = {
        r["id"]: r["rnk"]
        for r in df.withColumn(
            "rnk", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


def test_global_rank_tie_heavy_total_order(spark):
    from pyspark.sql import functions as F

    from vectolite_spark.operators.windows import global_rank

    # every value identical: the strict total order rests entirely on the
    # id tie-break, and every range-partition boundary splits a tie run
    df = spark.createDataFrame([(i, 1.0) for i in range(300)], ["id", "v"]).repartition(7)
    got = {
        r["id"]: r["rnk"]
        for r in global_rank(
            df, [F.desc("v"), F.asc("id")], rank_col="rnk", num_partitions=6
        ).collect()
    }
    assert got == {i: i + 1 for i in range(300)}


def test_aqp_sampled_revenue_properties(spark, sf_dir):
    """The md5-bucket sample is ~10% (binomial band), the scaled estimate
    lands near the exact sum, and a second run is bit-identical (the
    sample is a pure function of the keys, never an RNG)."""
    from vectolite_spark.registry import QUERIES

    r1 = QUERIES["aqp_sampled_revenue"](spark, sf_dir).first()
    n, total = r1["sample_rows"], r1["total_rows"]
    assert 0.05 * total < n < 0.15 * total
    assert r1["rel_err"] < 0.1
    # rel_err is ROUNDED 6dp, so allow a half-ulp-of-rounding slack
    assert abs(r1["est_revenue"] - r1["exact_revenue"]) <= (
        r1["rel_err"] + 5e-6
    ) * r1["exact_revenue"]
    r2 = QUERIES["aqp_sampled_revenue"](spark, sf_dir).first()
    assert r1 == r2


def test_aqp_universe_sample_key_coherence(spark, sf_dir):
    """Universe sampling's defining property: a key is either fully in or
    fully out — the sampled join revenue for any surviving order equals
    its exact revenue (never a partial fraction, which independent
    Bernoulli sampling of each side would produce)."""
    from pyspark.sql import functions as F

    from vectolite_spark.registry import QUERIES
    from vectolite_spark.schema import load_table

    out = QUERIES["aqp_join_universe_sample"](spark, sf_dir).collect()
    assert len(out) >= 1
    for r in out:
        assert r["rel_err"] < 0.5  # loose: 10% keyed sample, small SF
    # differential: the query's own per-year estimate must equal 10x a
    # key-coherent sample built INDEPENDENTLY here (whole orders in or
    # out) — if the query ever sampled on anything but the join key
    # (e.g. per-lineitem Bernoulli), partial orders would break equality
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sampled_keys = {
        r["o_orderkey"]
        for r in orders.select("o_orderkey").collect()
        if int(
            __import__("hashlib").md5(str(r["o_orderkey"]).encode())
            .hexdigest()[:8],
            16,
        ) % 10 == 0
    }
    ref = (
        li.filter(F.col("l_orderkey").isin(sampled_keys))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                )
                * 10
            )
            .cast("double")
            .alias("ref_est")
        )
    )
    ref_by_year = {r["order_year"]: r["ref_est"] for r in ref.collect()}
    for r in out:
        assert r["est_revenue"] == pytest_approx(
            ref_by_year[r["order_year"]]
        ), r["order_year"]


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-12)


def test_pareto_front_matches_naive_dominance(spark):
    """Differential vs the O(n^2) definition on randomized integer points,
    including duplicate points, cost ties, and gain ties."""
    import random

    from vectolite_spark.operators.windows import pareto_front

    rng = random.Random(11)
    for trial in range(3):
        pts = [
            (i, rng.randint(0, 8), rng.randint(0, 8)) for i in range(60)
        ]
        df = spark.createDataFrame(pts, "id long, cost long, gain long")
        got = [r["id"] for r in pareto_front(df, "cost", "gain", "id").collect()]

        def dominated(p):
            return any(
                q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
                for q in pts if q[0] != p[0]
            )

        want = sorted(
            (p[0] for p in pts if not dominated(p)),
            key=lambda i: (pts[i][1], i),
        )
        assert sorted(got) == sorted(want), trial
        # order contract: cost asc, id asc
        assert got == sorted(got, key=lambda i: (pts[i][1], i))


def test_copurchase_pairs_vs_naive_self_join(spark):
    from pyspark.sql import functions as F

    from vectolite_spark.operators.relational import copurchase_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # dup line: distinct first
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "c"),                                # singleton: no pairs
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = [
        (r["item_a"], r["item_b"], r["n_baskets"])
        for r in copurchase_pairs(df, "basket", "item", k=10).collect()
    ]
    assert got == [("a", "b", 3), ("a", "c", 1), ("b", "c", 1)]
    # min_support filters the tail
    got2 = copurchase_pairs(df, "basket", "item", k=10, min_support=2)
    assert [(r["item_a"], r["item_b"]) for r in got2.collect()] == [("a", "b")]
    # the plan has no join at all (the whole point vs the SQL shape)
    plan = copurchase_pairs(df, "basket", "item")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_association_rules_metrics(spark):
    import pytest

    from vectolite_spark.operators.relational import association_rules

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, "basket", "item", min_support=2).collect()
    }
    # a->b: n_both=2, n_a=3 -> conf 2/3; lift = 2*4/(3*3)
    r = got[("a", "b")]
    assert r["n_both"] == 2
    assert r["confidence"] == pytest.approx(round(2 / 3, 6))
    assert r["lift"] == pytest.approx(round(2 * 4 / (3 * 3), 6))
    # b->a direction present with its own confidence (n_b=3)
    assert got[("b", "a")]["confidence"] == pytest.approx(round(2 / 3, 6))
    # min_support prunes the (a,c) singleton pair
    assert ("a", "c") not in got and ("c", "a") not in got


def test_event_transitions_markov(spark):
    import datetime as dt

    import pytest

    from vectolite_spark.operators.windows import event_transitions

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: a -> b -> a ; user 2: a -> b (same ts: id breaks tie)
        (1, t0, 1, "a"), (2, t0 + dt.timedelta(1), 1, "b"),
        (3, t0 + dt.timedelta(2), 1, "a"),
        (4, t0, 2, "a"), (5, t0, 2, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r["prev_event"], r["next_event"]): (r["n"], r["p"])
        for r in event_transitions(ev).collect()
    }
    # a->b twice (both users), b->a once; P(b|a)=1.0, P(a|b)=1.0
    assert got[("a", "b")] == (2, pytest.approx(1.0))
    assert got[("b", "a")] == (1, pytest.approx(1.0))
    assert len(got) == 2  # no cross-user pair (u1's last 'a' -> u2's 'a')


def test_mad_outliers_robust_to_contamination(spark):
    import pytest

    from vectolite_spark.operators.windows import mad_outliers

    # 9 inliers around 10 plus one wild point; mean/std would be dragged,
    # the MAD detector must flag exactly the wild point
    rows = [(i, "g", 10.0 + (i % 3) * 0.5) for i in range(1, 10)]
    rows.append((10, "g", 1000.0))
    rows += [(11, "h", 5.0), (12, "h", 5.0)]  # constant group: MAD=0, excluded
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = mad_outliers(df, "event_type", "value", "event_id").collect()
    assert [r["event_id"] for r in got] == [10]
    # modified z-score of the wild point, computed closed-form:
    # med=10.5, deviations |x-10.5| -> med .5 -> MAD=0.5
    assert got[0]["m"] == pytest.approx(round(0.6745 * (1000.0 - 10.5) / 0.5, 6))


def test_transition_entropy_closed_form(spark):
    import datetime as dt
    import math

    import pytest

    from vectolite_spark.operators.windows import transition_entropy

    t0 = dt.datetime(2026, 1, 1)
    # from 'a': two b's and one c -> H = -(2/3)ln(2/3) - (1/3)ln(1/3)
    # from 'b': always a          -> H = 0
    rows = [
        (1, t0, 1, "a"), (2, t0 + dt.timedelta(1), 1, "b"),
        (3, t0 + dt.timedelta(2), 1, "a"), (4, t0 + dt.timedelta(3), 1, "c"),
        (5, t0, 2, "a"), (6, t0 + dt.timedelta(1), 2, "b"),
        (7, t0 + dt.timedelta(2), 2, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r["prev_event"]: r for r in transition_entropy(ev).collect()}
    want_a = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert got["a"]["n_transitions"] == 3
    assert got["a"]["entropy"] == pytest.approx(round(want_a, 6))
    assert got["b"]["entropy"] == pytest.approx(0.0)


def test_item_recommendations_cosine_closed_form(spark, sf_dir):
    import math

    import pytest

    from vectolite_spark.registry import QUERIES, load_table

    got = QUERIES["item_recommendations"](spark, sf_dir).collect()
    assert got, "recommender returned nothing at the test SF"
    # recompute the top row's cosine from raw basket facts
    li = load_table(spark, sf_dir, "lineitem")
    ppo = li.select("l_orderkey", "l_partkey").distinct()
    r = got[0]
    n_a = ppo.filter(f"l_partkey = {r['item']}").count()
    n_b = ppo.filter(f"l_partkey = {r['rec']}").count()
    both = (
        ppo.filter(f"l_partkey = {r['item']}")
        .select("l_orderkey")
        .intersect(ppo.filter(f"l_partkey = {r['rec']}").select("l_orderkey"))
        .count()
    )
    assert r["sim"] == pytest.approx(round(both / math.sqrt(n_a * n_b), 6))
    # ranks are 1..3 per item, no gaps, rec != item
    by_item = {}
    for row in got:
        by_item.setdefault(row["item"], []).append(row["rk"])
        assert row["rec"] != row["item"]
    for rks in by_item.values():
        assert rks == list(range(1, len(rks) + 1))


def test_basket_pair_counts_vs_bruteforce_hypothesis(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vectolite_spark.operators.relational import basket_pair_counts

    baskets = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),      # basket key
            st.sampled_from(list("abcdef")),            # item
        ),
        min_size=0,
        max_size=25,
    )

    @settings(max_examples=12, deadline=None)  # each example runs Spark jobs
    @given(baskets)
    def check(rows):
        from itertools import combinations

        want = {}
        by_key = {}
        for k, it in rows:
            by_key.setdefault(k, set()).add(it)
        for items in by_key.values():
            for a, b in combinations(sorted(items), 2):
                want[(a, b)] = want.get((a, b), 0) + 1
        df = spark.createDataFrame(
            rows or [(0, "z")], "basket long, item string"
        )
        if not rows:
            df = df.filter("basket < 0")
        got = {
            (r["item_a"], r["item_b"]): r["n_baskets"]
            for r in basket_pair_counts(df, "basket", "item").collect()
        }
        assert got == want, (rows, got, want)

    check()


def test_seasonal_decompose_pure_weekly_pattern(spark):
    """A noiseless weekly pattern (value = 100 + weekday offset, no trend)
    must decompose exactly: trend = the weekly mean (103), seasonal = the
    per-weekday offset around it, residual identically zero (and +0.0,
    never -0.0) on every interior day."""
    import datetime

    from vectolite_spark.operators.windows import seasonal_decompose_daily

    base = datetime.datetime(2024, 3, 4, 12, 0, 0)  # a Monday
    rows = []
    for i in range(28):
        d = base + datetime.timedelta(days=i)
        rows.append((i, d, 1, "view", 100.0 + (i % 7), "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["day"]: r for r in seasonal_decompose_daily(events).collect()}
    assert len(out) == 28
    for i in range(28):
        day = (base + datetime.timedelta(days=i)).strftime("%Y-%m-%d")
        r = out[day]
        assert r["day_value"] == 100.0 + (i % 7)
        if 3 <= i <= 24:  # interior: full centered window
            assert r["trend"] == 103.0, r
            assert r["seasonal"] == (i % 7) - 3.0, r
            assert r["residual"] == 0.0
            assert str(r["residual"])[0] != "-"  # +0.0, not -0.0
        else:
            assert r["trend"] is None and r["residual"] is None


def test_sliding_wau_trailing_window_closed_form(spark):
    """Hand-built activity: users {1,2} on day 0, {2,3} on day 3, {4} on
    day 10. Trailing-7-day WAU at day 3 sees days -3..3 = {1,2,3}; at
    day 10 the window (4..10) only sees {4}. Only observed days report."""
    import datetime

    from vectolite_spark.operators.windows import sliding_active_users

    base = datetime.datetime(2024, 5, 1, 9, 0, 0)
    rows = []
    for i, (day, user) in enumerate(
        [(0, 1), (0, 2), (3, 2), (3, 3), (10, 4)]
    ):
        rows.append(
            (i, base + datetime.timedelta(days=day), user, "view", 1.0, "{}")
        )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["day"]: r for r in sliding_active_users(events).collect()}
    d = lambda k: (base + datetime.timedelta(days=k)).strftime("%Y-%m-%d")  # noqa: E731
    assert set(got) == {d(0), d(3), d(10)}
    assert (got[d(0)]["wau"], got[d(0)]["dau"]) == (2, 2)
    assert (got[d(3)]["wau"], got[d(3)]["dau"]) == (3, 2)
    assert got[d(3)]["stickiness"] == round(2 / 3, 6)
    assert (got[d(10)]["wau"], got[d(10)]["dau"]) == (1, 1)


def test_resample_interpolate_linear_closed_form(spark):
    """Observations at minutes 0 (v=10) and 4 (v=30) for one user inside
    the 6h grid: interior gap minutes interpolate linearly (15/20/25);
    minutes after the last observation have only one neighbor -> NULL."""
    import datetime

    import __spark_entry__  # noqa: F401
    from vectolite_spark.registry import QUERIES
    import os, tempfile

    d = tempfile.mkdtemp()
    base = datetime.datetime(2024, 1, 1, 0, 0, 30)
    rows = [
        (1, base, 5, "view", 10.0, "{}"),
        (2, base + datetime.timedelta(minutes=4), 5, "view", 30.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["minute"]: r
        for r in QUERIES["resample_interpolate"](spark, d).collect()
    }
    assert len(got) == 360
    assert [got[m]["v_interp"] for m in range(5)] == [10.0, 15.0, 20.0, 25.0, 30.0]
    assert got[1]["was_gap"] == 1 and got[0]["was_gap"] == 0
    assert all(got[m]["v_interp"] is None for m in range(5, 360))


def test_key_skew_report_closed_form(spark):
    """A planted hot key (60 of 100 rows) reports share 0.6 and
    imbalance = 60 / (100/5 keys) = 3.0; ordering is count desc."""
    import __spark_entry__  # noqa: F401
    from vectolite_spark.registry import QUERIES
    import os, tempfile

    d = tempfile.mkdtemp()
    rows = [(i, 7) for i in range(60)] + [
        (100 + i, 1 + (i % 4)) for i in range(40)
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = QUERIES["key_skew_report"](spark, d).collect()
    top = got[0]
    assert (top["key"], top["cnt"]) == (7, 60)
    assert top["share"] == 0.6
    assert top["imbalance"] == 3.0
    assert (top["n_keys"], top["n_rows"]) == (5, 100)
    assert [r["cnt"] for r in got] == sorted(
        [r["cnt"] for r in got], reverse=True
    )
