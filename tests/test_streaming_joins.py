"""Stream-stream interval join (`streaming/joins.py`):

  * inner matches emit as both sides arrive, only inside the interval;
  * a left row with no match emits its null row (left_outer) ONLY after
    the right watermark proves no match can still arrive — and exactly
    once;
  * batch mode over the same files equals the streaming union (A/B).
"""

import json


SCHEMA = "ts timestamp, user_id bigint, value double"


def _write(path, rows):
    with open(path, "w") as f:
        for ts, uid, value in rows:
            f.write(
                json.dumps({"ts": f"2024-01-01T{ts}:00.000Z", "user_id": uid, "value": value})
                + "\n"
            )


def _streams(spark, tmp_path):
    views = tmp_path / "views"
    buys = tmp_path / "buys"
    views.mkdir()
    buys.mkdir()
    vs = spark.readStream.schema(SCHEMA).json(str(views))
    bs = spark.readStream.schema(SCHEMA).json(str(buys))
    return views, buys, vs, bs


def test_stream_interval_join_inner(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.joins import stream_interval_join

    views, buys, vs, bs = _streams(spark, tmp_path)
    joined = stream_interval_join(
        vs, bs, key="user_id", watermark="5 minutes", lower="0 seconds", upper="10 minutes"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_inner")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # view at 00:05; buys at 00:09 (inside), 00:20 (outside +10m),
        # different user at 00:06 (wrong key)
        _write(views / "v1.jsonl", [("00:05", 1, 0.0)])
        _write(buys / "b1.jsonl", [("00:09", 1, 9.9), ("00:20", 1, 20.0), ("00:06", 2, 6.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ssj_inner").collect()
        assert [(r.user_id, r.value, r.value_r) for r in rows] == [(1, 0.0, 9.9)]
        # the buy BEFORE the view (below the 0s lower bound) never matches
        _write(views / "v2.jsonl", [("00:30", 3, 0.0)])
        _write(buys / "b2.jsonl", [("00:29", 3, 29.0)])
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM ssj_inner").collect()[0][0] == 1
    finally:
        q.stop()

    # A/B: batch mode over the same files gives the same single match
    batch_v = spark.read.schema(SCHEMA).json(str(views))
    batch_b = spark.read.schema(SCHEMA).json(str(buys))
    batch = stream_interval_join(batch_v, batch_b, key="user_id").collect()
    assert [(r.user_id, r.value, r.value_r) for r in batch] == [(1, 0.0, 9.9)]


def test_stream_interval_join_left_outer_emits_after_watermark(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.joins import stream_interval_join

    views, buys, vs, bs = _streams(spark, tmp_path)
    joined = stream_interval_join(
        vs, bs, key="user_id", watermark="5 minutes", upper="10 minutes", how="left_outer"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # matched pair + an unmatched view at 00:05
        _write(views / "v1.jsonl", [("00:05", 1, 0.0), ("00:05", 2, 0.0)])
        _write(buys / "b1.jsonl", [("00:09", 1, 9.9)])
        q.processAllAvailable()
        got = {(r.user_id, r.value_r) for r in spark.sql("SELECT * FROM ssj_outer").collect()}
        # user 2's null row must NOT appear yet: a match could still arrive
        assert got == {(1, 9.9)}

        # push both watermarks past 00:05 + 10m interval + 5m delay
        _write(views / "v2.jsonl", [("00:40", 9, 0.0)])
        _write(buys / "b2.jsonl", [("00:40", 9, 40.0)])
        q.processAllAvailable()
        q.processAllAvailable()
        # LIST, not set — a double emission of the outer null row must fail
        rows = [(r.user_id, r.value_r) for r in spark.sql("SELECT * FROM ssj_outer").collect()]
        assert rows.count((2, None)) == 1  # the proven-unmatched row, exactly once
    finally:
        q.stop()
