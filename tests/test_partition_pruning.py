"""Hive-style partitioned layout: writes partitioned by a derived date
column, reads with a partition predicate, and asserts the scan PRUNES
partitions (the predicate reaches the file index as a PartitionFilter, not
a post-scan Filter) — the storage lever that turns a 100 TB time-range
query into a scan of just the touched days."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_dir(spark, sf_dir, tmp_path_factory):
    from etl_edi_data_scrapper_spark.suite import _events

    out = str(tmp_path_factory.mktemp("events_by_day"))
    ev = _events(spark, sf_dir).withColumn("day", F.to_date(F.col("ts")))
    ev.write.partitionBy("day").mode("overwrite").parquet(out)
    return out


def test_partition_filter_prunes_scan(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir)
    days = sorted(r.day for r in df.select("day").distinct().collect())
    assert len(days) > 1, "fixture must span multiple days"
    one = df.filter(F.col("day") == days[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the day predicate lands in PartitionFilters (directory-level pruning,
    # evaluated against the file index — zero data files from other days
    # are opened), NOT in the row-level data filter
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "day" in pf
    assert "PushedFilters: []" in plan  # nothing left for row-level filtering
    # and the filtered frame equals a direct read of just that directory
    direct = spark.read.parquet(f"{partitioned_dir}/day={days[0]}")
    assert one.count() == direct.count() > 0


def test_non_partition_filter_keeps_all_partitions(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir)
    some = df.filter(F.col("event_type") == "click")
    plan = some._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "day" not in pf  # no partition pruning from a data predicate
    assert "event_type" in plan.split("PushedFilters: [")[1].split("]")[0]
