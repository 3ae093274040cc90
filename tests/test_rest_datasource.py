"""Distributed REST Python DataSource: fixture-dir pagination, partition
fan-out, last_page probe, unknown-extent walk, non-dict row skipping."""

import json
import os

import pytest
from pyspark.sql import functions as F


def _write_pages(tmpdir, n_pages, rows_per_page=3, with_meta=True, with_links=False):
    for p in range(1, n_pages + 1):
        doc = {
            "data": [
                {"upc": f"{p:03d}{i}", "qty": p * 10 + i}
                for i in range(rows_per_page)
            ]
        }
        if with_meta:
            doc["meta"] = {"last_page": n_pages}
        if with_links:
            doc["links"] = {"next": f"page_{p + 1}"} if p < n_pages else {}
        with open(os.path.join(tmpdir, f"page_{p}.json"), "w") as f:
            json.dump(doc, f)
    return f"file://{tmpdir}"


@pytest.fixture()
def registered(spark):
    from etl_edi_data_scrapper_spark.sources.rest_datasource import RestDataSource

    spark.dataSource.register(RestDataSource)
    return spark


def test_reads_all_pages_distributed(registered, tmp_path):
    url = _write_pages(str(tmp_path), n_pages=5)
    df = (
        registered.read.format("edi_rest")
        .option("url", url)
        .option("pages_per_task", 1)
        .load()
    )
    parsed = df.select(
        F.get_json_object("value", "$.upc").alias("upc"),
        F.get_json_object("value", "$.qty").cast("long").alias("qty"),
    )
    rows = parsed.collect()
    assert len(rows) == 15
    assert {r.upc for r in rows} == {f"{p:03d}{i}" for p in range(1, 6) for i in range(3)}
    # pages_per_task=1 → 5 partitions → concurrent executor-side fetch
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 5


def test_unknown_extent_walks_links(registered, tmp_path):
    url = _write_pages(str(tmp_path), n_pages=3, with_meta=False, with_links=True)
    df = registered.read.format("edi_rest").option("url", url).load()
    assert df.count() == 9


def test_non_dict_rows_skipped_and_missing_page_empty(registered, tmp_path):
    with open(tmp_path / "page_1.json", "w") as f:
        json.dump(
            {"data": [{"a": 1}, "junk", 7, {"b": 2}], "meta": {"last_page": 2}}, f
        )
    # page_2.json intentionally absent → empty page, not an error
    df = (
        registered.read.format("edi_rest")
        .option("url", f"file://{tmp_path}")
        .load()
    )
    vals = sorted(r.value for r in df.collect())
    assert vals == ['{"a": 1}', '{"b": 2}']


def test_explicit_n_pages_skips_probe(registered, tmp_path):
    url = _write_pages(str(tmp_path), n_pages=4, with_meta=False)
    df = (
        registered.read.format("edi_rest")
        .option("url", url)
        .option("n_pages", 4)
        .option("pages_per_task", 2)
        .load()
    )
    assert df.count() == 12
