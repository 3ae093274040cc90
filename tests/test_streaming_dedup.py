"""Cross-batch stateful dedup: two micro-batches driven through
applyInPandasWithState; duplicates in batch 2 must be dropped by state."""

import json
import time


def _write_batch(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_dedup_across_batches(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.dedup_stream import streaming_exact_dedup

    src = tmp_path / "docs"
    src.mkdir()
    _write_batch(src, "b1.jsonl", [
        {"doc_id": 1, "text": "The quick brown fox!"},
        {"doc_id": 2, "text": "the QUICK brown fox"},   # same normalized text
        {"doc_id": 3, "text": "something else"},
    ])

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()}
        assert got1 == {1, 3}  # doc 2 deduped within batch (min doc_id wins)

        _write_batch(src, "b2.jsonl", [
            {"doc_id": 4, "text": "THE QUICK BROWN FOX"},  # dup of batch-1 state
            {"doc_id": 5, "text": "brand new content"},
        ])
        q.processAllAvailable()
        got2 = {r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()}
        assert got2 == {1, 3, 5}  # doc 4 dropped by cross-batch state
    finally:
        q.stop()
