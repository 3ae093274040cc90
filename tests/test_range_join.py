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


def test_preagg_matches_plain_join_then_aggregate(spark):
    """interval_join_preagg + combine == interval_join + direct aggregate,
    including intervals that overlap each other (a tick feeding several
    intervals) and ticks shared by many facts."""
    from etl_edi_data_scrapper_spark.operators.range_join import interval_join_preagg

    facts = [(i, i % 25, float(i % 7)) for i in range(200)]
    f = spark.createDataFrame(facts, "fid long, t long, v double")
    iv = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 15), (3, 14, 15), (4, 20, 40), (5, 3, 3)],
        "iid long, s long, e long",
    )
    plain = (
        interval_join(f, iv, "t", "s", "e", 10)
        .groupBy("iid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    pre = (
        interval_join_preagg(
            f, iv, "t", "s", "e", 10,
            partial_aggs=[F.count(F.lit(1)).alias("pn"), F.sum("v").alias("pv")],
        )
        .groupBy("iid")
        .agg(F.sum("pn").alias("n"), F.sum("pv").alias("sv"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pre.collect()))


def test_preagg_fact_side_is_tick_count_not_fact_count(spark):
    """The joined intermediate carries one row per (tick, interval) pair —
    fact cardinality only enters the first groupBy."""
    from etl_edi_data_scrapper_spark.operators.range_join import interval_join_preagg

    f = spark.range(10_000).select((F.col("id") % 5).alias("t"))
    iv = spark.createDataFrame([(1, 0, 5), (2, 0, 5)], "iid long, s long, e long")
    j = interval_join_preagg(
        f, iv, "t", "s", "e", 5, partial_aggs=[F.count(F.lit(1)).alias("pn")]
    )
    assert j.count() == 5 * 2  # ticks x intervals, not 10k x 2
    assert j.agg(F.sum("pn")).collect()[0][0] == 10_000 * 2
