"""Watermarked event-time window aggregation (`streaming/windows.py`):

  * append mode emits a window exactly once, only after the watermark
    passes its end (finalize-then-emit, state evicted);
  * a row later than the watermark is DROPPED — it must not resurrect or
    double-emit an already-finalized window;
  * a row late but within the watermark still lands in its window;
  * the same operator applied in batch mode equals the streaming union
    of finalized windows (A/B check against groupBy semantics).
"""

import json

from pyspark.sql import functions as F

SCHEMA = "ts timestamp, event_type string, value double"


def _write_events(path, rows):
    with open(path, "w") as f:
        for ts, etype, value in rows:
            f.write(
                json.dumps({"ts": f"2024-01-01T{ts}:00.000Z", "event_type": etype, "value": value})
                + "\n"
            )


def test_windowed_aggregate_watermark_lifecycle(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.windows import windowed_aggregate

    src = tmp_path / "events"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agg = windowed_aggregate(
        stream, ts_col="ts", watermark="5 minutes", window="10 minutes"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_agg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1: two open windows; watermark 00:12-5m=00:07 — nothing final
        _write_events(src / "b1.jsonl", [("00:05", "click", 1.0), ("00:12", "click", 2.0)])
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM win_agg").count() == 0

        # batch 2: ts 00:31 pushes the watermark to 00:26 → both earlier
        # windows finalize and emit; 00:31's own window stays open
        _write_events(src / "b2.jsonl", [("00:31", "click", 4.0)])
        q.processAllAvailable()
        emitted = {
            (r.win_start.minute, r.win_end.minute, r.event_type, r.n, r.total)
            for r in spark.sql("SELECT * FROM win_agg").collect()
        }
        assert emitted == {(0, 10, "click", 1, 1.0), (10, 20, "click", 1, 2.0)}

        # batch 3: 00:03 is older than the 00:26 watermark → dropped (the
        # already-emitted 00:00 window must NOT re-emit); 00:28 is late but
        # within range of its still-open window; 00:45 advances the
        # watermark to 00:40, finalizing 00:20-00:30 and 00:30-00:40
        _write_events(
            src / "b3.jsonl",
            [("00:03", "click", 99.0), ("00:28", "view", 8.0), ("00:45", "view", 16.0)],
        )
        q.processAllAvailable()
        final = {
            (r.win_start.minute, r.win_end.minute, r.event_type, r.n, r.total)
            for r in spark.sql("SELECT * FROM win_agg").collect()
        }
        assert final == {
            (0, 10, "click", 1, 1.0),   # emitted once, not re-emitted with 99.0
            (10, 20, "click", 1, 2.0),
            (20, 30, "view", 1, 8.0),   # within-watermark late row counted
            (30, 40, "click", 1, 4.0),
        }
    finally:
        q.stop()

    # A/B: the same operator over the same rows as a BATCH frame equals the
    # full window set (minus the dropped-late row, which batch mode keeps)
    batch = spark.read.schema(SCHEMA).json(str(src))
    batch_out = {
        (r.win_start.minute, r.win_end.minute, r.event_type, r.n, r.total)
        for r in windowed_aggregate(batch, watermark="5 minutes").collect()
    }
    # batch keeps 00:03 (no watermark dropping in batch) and the open 00:45
    assert batch_out == {
        (0, 10, "click", 2, 100.0),
        (10, 20, "click", 1, 2.0),
        (20, 30, "view", 1, 8.0),
        (30, 40, "click", 1, 4.0),
        (40, 50, "view", 1, 16.0),
    }


def test_windowed_aggregate_sliding_and_custom_aggs(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.windows import windowed_aggregate

    src = tmp_path / "events"
    src.mkdir()
    _write_events(
        src / "b1.jsonl",
        [("00:02", "click", 1.0), ("00:07", "click", 3.0), ("00:12", "view", 5.0)],
    )
    batch = spark.read.schema(SCHEMA).json(str(src))
    out = windowed_aggregate(
        batch,
        window="10 minutes",
        slide="5 minutes",
        aggs=[F.count(F.lit(1)).alias("n"), F.max("value").alias("vmax")],
    ).collect()
    # each row lands in window/slide = 2 windows
    assert sum(r.n for r in out) == 6
    by_win = {(r.win_start.minute % 60, r.event_type): r.vmax for r in out}
    assert by_win[(0, "click")] == 3.0   # 00:00-00:10 holds both clicks
    assert by_win[(5, "click")] == 3.0
    assert by_win[(10, "view")] == 5.0

    import pytest

    with pytest.raises(ValueError, match="aliased"):
        windowed_aggregate(batch, aggs=[F.sum("value")])


def test_sessionized_aggregate_merges_and_finalizes(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.windows import sessionized_aggregate

    src = tmp_path / "events"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agg = sessionized_aggregate(
        stream, watermark="5 minutes", gap="10 minutes", keys=("event_type",)
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_agg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # two events 8m apart (< gap): ONE merged session 00:02-00:20;
        # a second session starts at 00:35 (25m later, > gap)
        _write_events(src / "b1.jsonl", [("00:02", "click", 1.0), ("00:10", "click", 2.0)])
        q.processAllAvailable()
        _write_events(src / "b2.jsonl", [("00:35", "click", 4.0)])
        q.processAllAvailable()
        # watermark after b2 = 00:30 > first session end (00:20) → emitted
        rows = spark.sql("SELECT * FROM sess_agg").collect()
        got = {(r.win_start.minute, r.win_end.minute, r.n, r.total) for r in rows}
        assert got == {(2, 20, 2, 3.0)}  # merged: end = last event + gap

        # close the second session too
        _write_events(src / "b3.jsonl", [("01:10", "view", 8.0)])
        q.processAllAvailable()
        rows2 = spark.sql("SELECT * FROM sess_agg").collect()
        got2 = {(r.win_start.minute, r.win_end.minute, r.n, r.total) for r in rows2}
        assert (35, 45, 1, 4.0) in got2
    finally:
        q.stop()

    # batch A/B: same operator on the files as a batch frame sees all three
    # sessions (none dropped; batch never closes state early)
    batch = spark.read.schema(SCHEMA).json(str(src))
    out = {
        (r.win_start.minute, r.win_end.minute, r.event_type, r.n, r.total)
        for r in sessionized_aggregate(batch, keys=("event_type",)).collect()
    }
    assert out == {
        (2, 20, "click", 2, 3.0),
        (35, 45, "click", 1, 4.0),
        (10, 20, "view", 1, 8.0),  # 01:10 → minute 10 of the next hour
    }
