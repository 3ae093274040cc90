"""Bucketing: pre-shuffled storage so repeated joins/aggs on the bucket key
run WITHOUT an exchange — the SURVEY §7 scale lever for co-located joins
(two 50 TB fact tables bucketed on the same key join shuffle-free)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    (
        li.write.bucketBy(8, "l_partkey").sortBy("l_partkey")
        .option("path", str(wh / "li"))  # external table: no warehouse conf needed
        .mode("overwrite").format("parquet").saveAsTable("li_bucketed")
    )
    (
        part.withColumnRenamed("p_partkey", "l_partkey")
        .write.bucketBy(8, "l_partkey").sortBy("l_partkey")
        .option("path", str(wh / "part"))
        .mode("overwrite").format("parquet").saveAsTable("part_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS part_bucketed")


def _physical(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    li = spark.table("li_bucketed")
    part = spark.table("part_bucketed")
    joined = li.join(part.hint("merge"), "l_partkey").select("l_partkey", "p_name")
    plan = _physical(joined, spark)
    # both sides read pre-bucketed — a sort-merge join with ZERO exchanges
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == spark.table("li_bucketed").count()


def test_bucketed_agg_has_no_shuffle(spark, warehouse):
    agg = spark.table("li_bucketed").groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = _physical(agg, spark)
    assert "Exchange hashpartitioning" not in plan


# --- r10: persisted IVF index with a partition-pruned cell layout -----------


def test_ivf_index_save_load_roundtrip(spark, sf_dir, tmp_path):
    """A saved+loaded index answers identically to the in-memory one, and
    the assignment lands partitioned by centroid_id so probed cells are a
    pruned scan, not a corpus scan."""
    import os

    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.similarity import (
        ivf_index,
        ivf_topk,
        load_ivf_index,
        save_ivf_index,
    )

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = corpus.limit(5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    centroids, assigned = ivf_index(corpus, n_centroids=8)
    want = {
        (r.q_id, r.rank): r.vec_id
        for r in ivf_topk(queries, centroids, assigned, k=3, nprobe=2).collect()
    }

    idx = str(tmp_path / "ivf")
    save_ivf_index(centroids, assigned, idx)
    # cell layout on disk: one directory per centroid
    cells = [d for d in os.listdir(f"{idx}/assigned") if d.startswith("centroid_id=")]
    assert len(cells) == 8
    c2, a2 = load_ivf_index(spark, idx)
    got = {
        (r.q_id, r.rank): r.vec_id
        for r in ivf_topk(queries, c2, a2, k=3, nprobe=2).collect()
    }
    assert got == want and len(got) == 15

    # a literal cell probe compiles to a pruned scan: the partition filter
    # reaches the read, no post-scan Filter on centroid_id needed
    plan = (
        a2.filter(F.col("centroid_id") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(centroid_id" in plan
