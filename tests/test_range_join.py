"""Interval join (operators/range_join.py): half-open semantics, bucket
boundaries, inverted intervals, and the no-fact-shuffle broadcast plan."""

from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.operators.range_join import interval_join


def _join(spark, facts, intervals, bucket_width=10, broadcast=False):
    f = spark.createDataFrame(facts, "fid long, t long")
    iv = spark.createDataFrame(intervals, "iid long, s long, e long")
    return interval_join(
        f, iv, "t", "s", "e", bucket_width, broadcast_intervals=broadcast
    )


def test_half_open_and_bucket_boundaries(spark):
    facts = [(1, 5), (2, 10), (3, 19), (4, 20), (5, 25)]
    # [10, 20) spans buckets 1..1; [5, 25) spans buckets 0..2
    out = _join(spark, facts, [(100, 10, 20), (200, 5, 25)]).collect()
    got = {(r.fid, r.iid) for r in out}
    assert got == {
        (2, 100), (3, 100),              # 10 in, 20 out (half-open)
        (1, 200), (2, 200), (3, 200), (4, 200),  # 5..24 in, 25 out
    }


def test_interval_within_one_bucket_and_empty(spark):
    facts = [(1, 12), (2, 14)]
    out = _join(spark, facts, [(1, 12, 13), (2, 13, 13), (3, 15, 14)]).collect()
    # single-point bucket-interior interval matches only t=12;
    # empty (s==e) and inverted (e<s) intervals match nothing
    assert {(r.fid, r.iid) for r in out} == {(1, 1)}


def test_fact_overlapping_intervals_multiplies(spark):
    out = _join(spark, [(1, 7)], [(1, 0, 10), (2, 5, 8), (3, 8, 9)]).collect()
    assert sorted(r.iid for r in out) == [1, 2]


def test_broadcast_plan_never_shuffles_fact(spark):
    f = spark.range(1000).select(
        F.col("id").alias("fid"), (F.col("id") % 100).alias("t")
    )
    iv = spark.createDataFrame([(1, 10, 30), (2, 50, 60)], "iid long, s long, e long")
    out = interval_join(f, iv, "t", "s", "e", 10, broadcast_intervals=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only exchange is the broadcast of the (small) interval side
    assert "Exchange hashpartitioning" not in plan
    assert out.count() == 1000 // 100 * (20 + 10)  # 10 ids/t × (20+10 ts)
