"""Incremental bloom contamination screen (streaming/bloom_stream.py):
bounded-state span screening across micro-batches, replay idempotence,
and the ≤ m store bound."""

import json

from pyspark.sql import functions as F


BANNER = " ".join(f"nav{i}" for i in range(10))  # >= width-token passage
FRESH_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
FRESH_B = "one two three four five six seven eight nine ten"


def _write_batch(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def test_batch_screen_and_insert(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.bloom_stream import (
        screen_batch_against_bloom_store,
    )

    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        [(1, f"{BANNER} {FRESH_A}"), (2, FRESH_B)], "doc_id long, text string"
    )
    v1 = {
        r.doc_id: (r.n_spans_maybe_seen, r.bloom_contaminated)
        for r in screen_batch_against_bloom_store(spark, b1, store, 0).collect()
    }
    # empty store: nothing can be seen (no false negatives AND no phantom
    # positives from an absent filter)
    assert v1 == {1: (0, False), 2: (0, False)}

    # batch 2 reuses the banner — every banner window is now maybe-seen
    b2 = spark.createDataFrame(
        [(10, f"lead in {BANNER} tail"), (11, FRESH_A + " extended words")],
        "doc_id long, text string",
    )
    v2 = {
        r.doc_id: r.bloom_contaminated
        for r in screen_batch_against_bloom_store(spark, b2, store, 1).collect()
    }
    assert v2[10] is True
    # doc 11 shares an 8+-token run with FRESH_A (10 tokens, inserted in
    # epoch 0) — also flagged; the screen is span-level, not doc-level
    assert v2[11] is True


def test_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running an epoch must return the
    SAME verdicts (its own insertions are excluded by epoch < e) and
    append nothing to the store."""
    from etl_edi_data_scrapper_spark.streaming.bloom_stream import (
        screen_batch_against_bloom_store,
    )

    store = str(tmp_path / "store")
    b = spark.createDataFrame([(1, f"{BANNER} {FRESH_A}")], "doc_id long, text string")
    first = screen_batch_against_bloom_store(spark, b, store, 0).collect()
    n_rows = spark.read.parquet(store).count()
    replay = screen_batch_against_bloom_store(spark, b, store, 0).collect()
    assert [tuple(r) for r in first] == [tuple(r) for r in replay]
    assert not replay[0].bloom_contaminated  # never matches itself
    assert spark.read.parquet(store).count() == n_rows  # nothing re-appended


def test_store_stays_bounded_by_m(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.bloom_stream import (
        screen_batch_against_bloom_store,
    )

    store = str(tmp_path / "store")
    m = 64  # tiny filter: positions MUST saturate below m
    for e in range(4):
        b = spark.createDataFrame(
            [(e * 10 + i, f"batch {e} doc {i} " + FRESH_A) for i in range(5)],
            "doc_id long, text string",
        )
        screen_batch_against_bloom_store(spark, b, store, e, m=m, k=3)
    st = spark.read.parquet(store)
    assert st.count() <= m  # THE bound: ≤ m rows however many batches
    assert st.select("pos").distinct().count() == st.count()  # no dup pos


def test_streaming_end_to_end(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.bloom_stream import (
        run_incremental_bloom_screen,
    )

    src = tmp_path / "docs"
    src.mkdir()
    _write_batch(src, "b1.jsonl", [{"doc_id": 1, "text": f"{BANNER} {FRESH_A}"}])
    results = {}

    def sink(df, epoch):
        for r in df.collect():
            results[r.doc_id] = r.bloom_contaminated

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = run_incremental_bloom_screen(
        spark,
        stream,
        store_dir=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_batch=sink,
    )
    try:
        q.processAllAvailable()
        assert results == {1: False}
        _write_batch(
            src,
            "b2.jsonl",
            [
                {"doc_id": 10, "text": f"prefix words {BANNER}"},
                {"doc_id": 11, "text": FRESH_B},
            ],
        )
        q.processAllAvailable()
        assert results[10] is True and results[11] is False
    finally:
        q.stop()


def test_corrupt_store_fails_loudly(spark, tmp_path):
    import pytest

    from etl_edi_data_scrapper_spark.streaming.bloom_stream import (
        screen_batch_against_bloom_store,
    )

    store = tmp_path / "store"
    store.mkdir()
    (store / "junk.parquet").write_text("not parquet at all")
    b = spark.createDataFrame([(1, FRESH_A)], "doc_id long, text string")
    with pytest.raises(Exception):
        screen_batch_against_bloom_store(spark, b, str(store), 0).collect()


def test_epoch_reset_new_incarnation_still_screens_history(spark, tmp_path):
    """A new stream incarnation (fresh checkpoint dir) restarts epochs at
    0; the incarnation stamp keeps the screen from going blind to every
    span ever ingested (r10 review — a bare epoch < e filter would)."""
    from etl_edi_data_scrapper_spark.streaming.bloom_stream import (
        screen_batch_against_bloom_store,
    )

    store = str(tmp_path / "store")
    b_old = spark.createDataFrame(
        [(1, BANNER)], "doc_id long, text string"
    )
    screen_batch_against_bloom_store(spark, b_old, store, 57, incarnation="ckpt_A")

    b_new = spark.createDataFrame(
        [(100, f"lead in {BANNER} tail"), (101, FRESH_B)],
        "doc_id long, text string",
    )
    v = {
        r.doc_id: r.bloom_contaminated
        for r in screen_batch_against_bloom_store(
            spark, b_new, store, 0, incarnation="ckpt_B"
        ).collect()
    }
    assert v == {100: True, 101: False}
    # replay of the same (incarnation, epoch): identical verdicts — its
    # own insertions stay excluded
    v2 = {
        r.doc_id: r.bloom_contaminated
        for r in screen_batch_against_bloom_store(
            spark, b_new, store, 0, incarnation="ckpt_B"
        ).collect()
    }
    assert v2 == v


def test_legacy_store_without_incarnation_column_screens(spark, tmp_path):
    """Stores written before the stamp existed (no incarnation column)
    read as a foreign incarnation: always screened, never shadowed."""
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.bloom import (
        _span_expr,
        bloom_positions,
    )
    from etl_edi_data_scrapper_spark.streaming.bloom_stream import (
        screen_batch_against_bloom_store,
    )

    store = str(tmp_path / "store")
    # hand-write a legacy-shape store: the banner's stride-1 width-8
    # window positions (the module's own span shape), no stamp column
    spans = spark.createDataFrame([(BANNER,)], "text string").select(
        F.explode(F.expr(_span_expr("text", 8))).alias("win")
    ).filter(F.col("win") != "")
    spans.select(
        F.explode(
            F.array(*[p.cast("long") for p in bloom_positions(F.col("win"), 1 << 16, 3)])
        ).alias("pos")
    ).distinct().withColumn("epoch", F.lit(3).cast("long")).write.parquet(store)

    b = spark.createDataFrame([(10, BANNER)], "doc_id long, text string")
    # epoch 0 of a new incarnation: legacy rows must still screen
    v = screen_batch_against_bloom_store(
        spark, b, store, 0, incarnation="ckpt_new"
    ).collect()[0]
    assert v.bloom_contaminated


def test_incarnation_stamp_survives_restart_changes_on_recreate(tmp_path):
    """The stamp is a UUID file INSIDE the checkpoint dir, not the dir
    path: an intact restart reads the same stamp (replay determinism),
    while delete-and-recreate of the SAME path — which resets Spark's
    epoch counter to 0 — yields a NEW stamp, so the reset counter cannot
    shadow the path's own prior insertions (ADVICE r10)."""
    import shutil

    from etl_edi_data_scrapper_spark.streaming.bloom_stream import (
        incarnation_stamp,
    )

    ckpt = str(tmp_path / "ckpt")
    first = incarnation_stamp(ckpt)
    assert incarnation_stamp(ckpt) == first  # intact restart: stable

    shutil.rmtree(ckpt)  # restart-from-scratch: epochs restart at 0 ...
    second = incarnation_stamp(ckpt)
    assert second != first  # ... and the stamp MUST change with them


def test_recreated_checkpoint_dir_still_screens_own_history(spark, tmp_path):
    """End-to-end shape of the ADVICE finding: ingest under the stamp of
    checkpoint dir X at epoch 5, delete+recreate X (epoch resets to 0),
    and the epoch-0 screen must still see the earlier spans."""
    import shutil

    from etl_edi_data_scrapper_spark.streaming.bloom_stream import (
        incarnation_stamp,
        screen_batch_against_bloom_store,
    )

    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")
    b_old = spark.createDataFrame([(1, BANNER)], "doc_id long, text string")
    screen_batch_against_bloom_store(
        spark, b_old, store, 5, incarnation=incarnation_stamp(ckpt)
    )

    shutil.rmtree(ckpt)
    b_new = spark.createDataFrame(
        [(100, f"lead in {BANNER} tail")], "doc_id long, text string"
    )
    v = screen_batch_against_bloom_store(
        spark, b_new, store, 0, incarnation=incarnation_stamp(ckpt)
    ).collect()[0]
    assert v.bloom_contaminated  # with a path stamp this went blind
