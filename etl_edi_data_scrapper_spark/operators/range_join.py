"""Interval (range) join: fact.ts ∈ [interval.start, interval.end).

Spark has no native range-join optimization (Databricks' range-join hint is
proprietary); a naive theta-join plans as BroadcastNestedLoopJoin — every
fact row tested against every interval, O(|fact|·|intervals|), hopeless at
100 TB. The scale path here is bucketing:

  1. explode each interval into the fixed-width time buckets it covers,
  2. equi-join facts on their bucket id (hash join — shuffles on a small
     integer key, or NO shuffle at all when the exploded intervals are
     broadcast),
  3. exact-filter the half-open predicate.

Work is bounded by Σ per-bucket (facts × intervals-covering-bucket) instead
of the full cross product. Pick ``bucket_width`` near the median interval
length: too small explodes intervals into many rows, too large puts many
unrelated facts in each bucket (the exact filter then discards them).
A single year-long interval among minute-scale ones explodes into ~500k
bucket rows — cap/split such outliers upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    fact_time: str,
    start: str,
    end: str,
    bucket_width: int,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner join of `fact` rows to every interval containing them.

    `fact_time`, `start`, `end` must be NUMERIC columns on the same axis
    (epoch seconds/days/µs — caller converts timestamps). The match is
    half-open: start <= fact_time < end. Output columns: fact's + interval's.

    With ``broadcast_intervals=True`` (right-size the interval table first)
    the fact side is never shuffled — the plan is scan → broadcast hash
    join → filter, which at petabyte fact scale is the difference between
    a map-only job and an impossible shuffle.
    """
    b = F.lit(bucket_width)
    f = fact.withColumn("__b", F.floor(F.col(fact_time) / b))
    # empty/inverted intervals match nothing under half-open semantics —
    # drop them BEFORE sequence(), which would otherwise descend
    intervals = intervals.filter(F.col(end) > F.col(start))
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / b),
                # end is exclusive: a bucket is covered only if the interval
                # extends past the bucket's start
                F.floor((F.col(end) - F.lit(1)) / b),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    return (
        f.join(iv, "__b")
        .filter((F.col(fact_time) >= F.col(start)) & (F.col(fact_time) < F.col(end)))
        .drop("__b")
    )


def interval_join_preagg(
    fact: DataFrame,
    intervals: DataFrame,
    fact_time: str,
    start: str,
    end: str,
    bucket_width: int,
    partial_aggs: list,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Interval join for DECOMPOSABLE aggregations: collapse the fact table
    to one partial-aggregate row per distinct ``fact_time`` tick FIRST, then
    interval-join the tiny tick table. The caller groups the result by the
    interval's key and COMBINES the partials (sum of counts, sum of sums,
    min of mins, ...).

    Why this exists: the plain ``interval_join`` materializes one row per
    (fact, containing-interval) pair. When intervals share a fixed time
    axis, interval density per bucket grows LINEARLY with corpus size, so
    that intermediate is O(|fact| x density) = O(N^2) rows — measured: the
    suite's 7-day-window query, fine at 1x-30x, ran for 25+ CPU-minutes at
    100x on two straggler tasks before being killed. Pre-aggregation makes
    the joined side |distinct ticks|, bounded by the time range over the
    tick resolution — a CONSTANT in corpus size — so total work is
    O(|fact| + ticks x density): the quadratic term no longer multiplies
    the fact table. This is the same partial-aggregate pushdown Catalyst
    does for plain group-bys, applied manually because the range predicate
    hides the opportunity from the optimizer.

    Only valid when every requested aggregate is decomposable over ticks
    (count/sum/min/max and anything built from them, e.g. avg as
    sum+count). Quantiles/distinct-counts need sketch partials instead
    (count-distinct via a per-tick HLL merge, not exact).
    """
    ticks = fact.groupBy(fact_time).agg(*partial_aggs)
    return interval_join(
        ticks, intervals, fact_time, start, end, bucket_width,
        broadcast_intervals=broadcast_intervals,
    )
