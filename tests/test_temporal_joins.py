"""As-of and range joins: merge_asof parity, tolerance, forward mode,
exact-time inclusion, and binned range-join correctness vs a brute
inequality join."""

import pyspark.sql.functions as F

from synapse_etl_jobs_spark.operators.joins import asof_join, range_join


def _sides(spark):
    trades = spark.createDataFrame(
        [("a", 100, 10.0), ("a", 205, 11.0), ("a", 300, 12.0),
         ("b", 150, 20.0), ("b", 50, 19.0)],
        "sym string, ts long, px double",
    )
    quotes = spark.createDataFrame(
        [("a", 90, 1.0), ("a", 205, 2.0), ("a", 250, 3.0),
         ("b", 100, 9.0)],
        "sym string, qts long, bid double",
    )
    return trades, quotes


def test_asof_backward_with_exact_match_and_miss(spark):
    trades, quotes = _sides(spark)
    out = asof_join(trades, quotes, on=["sym"], left_ts="ts", right_ts="qts")
    got = {(r["sym"], r["ts"]): (r["qts_r"], r["bid_r"]) for r in out.collect()}
    assert got[("a", 100)] == (90.0, 1.0)
    assert got[("a", 205)] == (205.0, 2.0)   # exact time INCLUDED
    assert got[("a", 300)] == (250.0, 3.0)
    assert got[("b", 150)] == (100.0, 9.0)
    assert got[("b", 50)] == (None, None)    # nothing at-or-before → nulls
    assert out.count() == trades.count()     # left-outer, row-preserving


def test_asof_forward_and_tolerance(spark):
    trades, quotes = _sides(spark)
    fwd = asof_join(trades, quotes, on=["sym"], left_ts="ts", right_ts="qts",
                    direction="forward")
    got = {(r["sym"], r["ts"]): r["qts_r"] for r in fwd.collect()}
    assert got[("a", 100)] == 205.0
    assert got[("a", 205)] == 205.0          # exact time included forward too
    assert got[("a", 300)] is None           # nothing at-or-after
    assert got[("b", 50)] == 100.0
    tol = asof_join(trades, quotes, on=["sym"], left_ts="ts", right_ts="qts",
                    tolerance=20)
    got_t = {(r["sym"], r["ts"]): r["bid_r"] for r in tol.collect()}
    assert got_t[("a", 100)] == 1.0          # delta 10 ≤ 20
    assert got_t[("a", 300)] is None         # delta 50 > 20 → nulled
    assert got_t[("b", 150)] is None         # delta 50 > 20


def test_range_join_matches_brute_force(spark):
    pts = spark.range(0, 500).select(
        F.col("id"), (F.col("id") * 1.7 % 400).alias("x")
    )
    iv = spark.createDataFrame(
        [(i, i * 37.0 % 350, i * 37.0 % 350 + 25.0, f"band{i}") for i in range(30)],
        "iv_id long, lo double, hi double, label string",
    )
    fast = range_join(pts, iv, point_col="x", lower_col="lo", upper_col="hi",
                      bin_width=25.0).select("id", "iv_id")
    brute = pts.join(iv, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))) \
        .select("id", "iv_id")
    assert fast.exceptAll(brute).count() == 0
    assert brute.exceptAll(fast).count() == 0
    # left mode keeps unmatched points with null interval columns
    left = range_join(pts, iv, point_col="x", lower_col="lo", upper_col="hi",
                      bin_width=25.0, how="left")
    n_unmatched = pts.join(
        brute.select("id").distinct(), "id", "left_anti"
    ).count()
    assert left.filter(F.col("iv_id").isNull()).count() == n_unmatched


def test_range_join_keyed(spark):
    pts = spark.createDataFrame(
        [("u1", 5.0), ("u1", 15.0), ("u2", 5.0)], "k string, x double")
    iv = spark.createDataFrame(
        [("u1", 0.0, 10.0, "low"), ("u2", 0.0, 10.0, "low2"),
         ("u1", 10.5, 20.0, "high")],
        "k string, lo double, hi double, label string",
    )
    out = range_join(pts, iv, on=["k"], point_col="x",
                     lower_col="lo", upper_col="hi", bin_width=10.0)
    got = {(r["k"], r["x"]): r["label"] for r in out.collect()}
    assert got == {("u1", 5.0): "low", ("u1", 15.0): "high", ("u2", 5.0): "low2"}
