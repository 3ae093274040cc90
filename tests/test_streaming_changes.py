"""Streaming CDC (applyInPandasWithState): replayed unchanged rows are
dropped, real updates emitted, cross-batch state honored."""

import json

def _write_batch(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_cdc_emits_only_changes(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.changes import emit_changes
    src = tmp_path / "feed"
    src.mkdir()
    _write_batch(src, "b1.jsonl", [
        {"upc": "a", "price": 10.0, "seq": 1},
        {"upc": "b", "price": 5.0, "seq": 2},
        {"upc": "a", "price": 10.0, "seq": 3},   # within-batch replay → dropped
        {"upc": "a", "price": 12.0, "seq": 4},   # within-batch change → update
    ])
    stream = spark.readStream.schema("upc string, price double, seq long").json(str(src))
    out = emit_changes(stream, key="upc", value_cols=["price"], seq_col="seq")
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName("cdc_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.upc, r.price, r.change) for r in spark.sql("SELECT * FROM cdc_out").collect()}
        assert got == {
            ("a", 10.0, "insert"),
            ("a", 12.0, "update"),
            ("b", 5.0, "insert"),
        }

        _write_batch(src, "b2.jsonl", [
            {"upc": "a", "price": 12.0, "seq": 5},   # replay of batch-1 state → dropped
            {"upc": "b", "price": 6.0, "seq": 6},    # real update
            {"upc": "c", "price": 1.0, "seq": 7},    # new key
        ])
        q.processAllAvailable()
        got2 = {(r.upc, r.price, r.change) for r in spark.sql("SELECT * FROM cdc_out").collect()}
        assert got2 == got | {("b", 6.0, "update"), ("c", 1.0, "insert")}
    finally:
        q.stop()
