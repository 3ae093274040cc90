"""Incremental URL dedup (streaming/url_stream.py): canonical-key
screening across micro-batches, replay idempotence, NULL/placeholder
guard, and the one-row-per-distinct-key store bound."""

import json
import time


def test_batch_screen_and_insert(spark, tmp_path):
    from etl_edi_data_scrapper_spark.streaming.url_stream import (
        screen_batch_against_url_store,
    )

    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        [
            (1, "https://example.com/a"),
            (2, "https://WWW.example.com/a/#frag"),  # within-batch dup of 1
            (3, "https://example.com/b"),
        ],
        "doc_id long, url string",
    )
    v1 = {
        r.doc_id: (r.is_url_dup, r.dup_of)
        for r in screen_batch_against_url_store(spark, b1, store, 0).collect()
    }
    assert v1 == {1: (False, None), 2: (True, 1), 3: (False, None)}

    # batch 2: a re-crawl of /a (store hit names the ORIGINAL doc), a
    # tracking-param variant of /b, and a fresh page
    b2 = spark.createDataFrame(
        [
            (10, "https://example.com/a?utm_source=x"),
            (11, "https://example.com/b"),
            (12, "https://example.com/c"),
        ],
        "doc_id long, url string",
    )
    v2 = {
        r.doc_id: (r.is_url_dup, r.dup_of)
        for r in screen_batch_against_url_store(spark, b2, store, 1).collect()
    }
    assert v2 == {10: (True, 1), 11: (True, 3), 12: (False, None)}

    # store bound: one row per DISTINCT accepted canonical key
    got = spark.read.parquet(store)
    assert got.count() == 3  # /a, /b, /c
    assert got.select("canonical_url").distinct().count() == 3


def test_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running an epoch must return the
    SAME verdicts (a doc finding its OWN key in the store is the accepted
    representative, not a dup) and append nothing to the store."""
    from etl_edi_data_scrapper_spark.streaming.url_stream import (
        screen_batch_against_url_store,
    )

    store = str(tmp_path / "store")
    b = spark.createDataFrame(
        [(1, "https://example.com/a"), (2, "https://example.com/a")],
        "doc_id long, url string",
    )
    v_first = {
        r.doc_id: (r.is_url_dup, r.dup_of)
        for r in screen_batch_against_url_store(spark, b, store, 5).collect()
    }
    n_store = spark.read.parquet(store).count()
    v_replay = {
        r.doc_id: (r.is_url_dup, r.dup_of)
        for r in screen_batch_against_url_store(spark, b, store, 5).collect()
    }
    assert v_replay == v_first == {1: (False, None), 2: (True, 1)}
    assert spark.read.parquet(store).count() == n_store  # nothing re-appended


def test_null_and_placeholder_urls_never_dedup_or_insert(spark, tmp_path):
    """A missing key is not a shared key — in the store exactly as in the
    batch: NULL/placeholder rows are never flagged and never inserted, in
    this epoch or any later one."""
    from etl_edi_data_scrapper_spark.streaming.url_stream import (
        screen_batch_against_url_store,
    )

    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        [(1, None), (2, "N/A"), (3, "https://example.com/a")],
        "doc_id long, url string",
    )
    v1 = {
        r.doc_id: r.is_url_dup
        for r in screen_batch_against_url_store(spark, b1, store, 0).collect()
    }
    assert v1 == {1: False, 2: False, 3: False}
    assert spark.read.parquet(store).count() == 1  # only the real URL

    b2 = spark.createDataFrame(
        [(10, None), (11, "N/A")], "doc_id long, url string"
    )
    v2 = {
        r.doc_id: (r.is_url_dup, r.dup_of)
        for r in screen_batch_against_url_store(spark, b2, store, 1).collect()
    }
    assert v2 == {10: (False, None), 11: (False, None)}
    assert spark.read.parquet(store).count() == 1


def test_corrupt_store_raises(spark, tmp_path):
    """Anything but 'no store yet' must raise — silently forgetting
    ingestion history re-admits every historical duplicate."""
    import pytest

    from etl_edi_data_scrapper_spark.streaming.url_stream import (
        screen_batch_against_url_store,
    )

    store = tmp_path / "store"
    store.mkdir()
    (store / "part-00000.parquet").write_text("not parquet at all")
    b = spark.createDataFrame([(1, "https://x.com/a")], "doc_id long, url string")
    with pytest.raises(Exception):
        screen_batch_against_url_store(spark, b, str(store), 0).collect()


def test_streaming_e2e_two_batches(spark, tmp_path):
    """The writeStream wiring: two file-source micro-batches; the second
    must see the first's keys."""
    from etl_edi_data_scrapper_spark.streaming.url_stream import (
        run_incremental_url_dedup,
    )

    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    out: dict[int, dict] = {}

    def on_batch(verdict, epoch_id):
        rows = verdict.collect()
        if rows:
            out[len(out)] = {r.doc_id: (r.is_url_dup, r.dup_of) for r in rows}

    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 1, "url": "https://example.com/a"},
                {"doc_id": 2, "url": "https://example.com/b"},
            ]
        )
    )
    stream = spark.readStream.schema("doc_id long, url string").json(str(src))
    q = run_incremental_url_dedup(spark, stream, store, ckpt, on_batch)
    try:
        deadline = time.time() + 60
        while not out and time.time() < deadline:
            q.processAllAvailable()
        (src / "b2.json").write_text(
            json.dumps({"doc_id": 10, "url": "https://WWW.example.com/a/"})
        )
        while len(out) < 2 and time.time() < deadline:
            q.processAllAvailable()
    finally:
        q.stop()
    assert out[0] == {1: (False, None), 2: (False, None)}
    assert out[1] == {10: (True, 1)}


def test_epoch_reset_still_screens_history(spark, tmp_path):
    """A NEW stream incarnation (fresh checkpoint dir) restarts the epoch
    counter at 0 — screening must be identity-based, not epoch-relative,
    or every historical key goes invisible and all of history re-admits
    (review r10)."""
    from etl_edi_data_scrapper_spark.streaming.url_stream import (
        screen_batch_against_url_store,
    )

    store = str(tmp_path / "store")
    b_old = spark.createDataFrame(
        [(1, "https://example.com/a")], "doc_id long, url string"
    )
    screen_batch_against_url_store(spark, b_old, store, 57)  # old incarnation

    # new incarnation: epoch restarts at 0, store must still screen
    b_new = spark.createDataFrame(
        [(100, "https://example.com/a"), (101, "https://example.com/b")],
        "doc_id long, url string",
    )
    v = {
        r.doc_id: (r.is_url_dup, r.dup_of)
        for r in screen_batch_against_url_store(spark, b_new, store, 0).collect()
    }
    assert v == {100: (True, 1), 101: (False, None)}
    # and a replayed representative in the new incarnation is still not
    # a duplicate of itself
    v2 = {
        r.doc_id: (r.is_url_dup, r.dup_of)
        for r in screen_batch_against_url_store(spark, b_new, store, 0).collect()
    }
    assert v2 == v


def test_idna_regime_enforced_on_store(spark, tmp_path):
    """r12 (r11 verdict #4): the store's canonicalization regime is
    recorded at creation and ENFORCED — a batch screened under the other
    idna setting refuses loudly instead of silently splitting the key
    space (re-admitting historical IDN pages under respelled keys). A
    legacy store with no sidecar is idna=False by construction: an
    idna=False batch proceeds, an idna=True batch refuses."""
    import pytest

    from etl_edi_data_scrapper_spark import fsutil
    from etl_edi_data_scrapper_spark.streaming.url_stream import (
        screen_batch_against_url_store,
    )

    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        [(1, "https://münchen.de/pfad"), (2, "https://example.com/a")],
        "doc_id long, url string",
    )
    v1 = {
        r.doc_id: r.is_url_dup
        for r in screen_batch_against_url_store(
            spark, b1, store, 0, idna=True
        ).collect()
    }
    assert v1 == {1: False, 2: False}
    assert json.loads(
        fsutil.read_text(spark, f"{store}/_canon_meta.json")
    ) == {"idna": True}
    # the punycode spelling of batch 1's IDN page IS a store hit now
    b2 = spark.createDataFrame(
        [(10, "https://xn--mnchen-3ya.de/pfad")], "doc_id long, url string"
    )
    v2 = screen_batch_against_url_store(
        spark, b2, store, 1, idna=True
    ).collect()
    assert v2[0].is_url_dup and v2[0].dup_of == 1
    # regime mismatch refuses loudly
    with pytest.raises(ValueError, match="idna"):
        screen_batch_against_url_store(spark, b2, store, 2, idna=False)
    # legacy store (no sidecar): idna=False proceeds, idna=True refuses
    fs, p = fsutil._fs(spark, f"{store}/_canon_meta.json")
    fs.delete(p, False)
    v3 = screen_batch_against_url_store(
        spark,
        spark.createDataFrame(
            [(20, "https://example.com/z")], "doc_id long, url string"
        ),
        store,
        3,
        idna=False,
    ).collect()
    assert not v3[0].is_url_dup
    with pytest.raises(ValueError, match="idna"):
        screen_batch_against_url_store(spark, b2, store, 4, idna=True)
