"""fsutil.write_text_atomic failure semantics (r13 ADVICE #2): a failed
delete of the pre-existing destination must surface as an IOError when
the rename then fails too — the survivor at dst is the STALE original,
and silently returning success would hand callers old sidecar content
(the exact staleness the atomic writer exists to prevent). The genuine
lost-race case (a concurrent writer's FRESH file occupies dst) stays
tolerated.
"""

from __future__ import annotations

import pytest

from etl_edi_data_scrapper_spark import fsutil


class _FsProxy:
    """Python-side wrapper over the py4j FileSystem: fsutil only ever
    calls plain methods on it, so a delegating proxy can force delete/
    rename outcomes per-path without touching the JVM."""

    def __init__(self, real, dst_str, fail_delete=False, fail_rename=False,
                 fake_delete_ok=False):
        self._real = real
        self._dst = dst_str
        self._fail_delete = fail_delete
        self._fail_rename = fail_rename
        self._fake_delete_ok = fake_delete_ok

    def __getattr__(self, name):
        return getattr(self._real, name)

    def delete(self, p, recursive):
        if p.toString() == self._dst:
            if self._fail_delete:
                return False  # e.g. permissions: file survives
            if self._fake_delete_ok:
                return True  # pretend deleted; a "winner" recreated it
        return self._real.delete(p, recursive)

    def rename(self, src, dst):
        if dst.toString() == self._dst and self._fail_rename:
            return False
        return self._real.rename(src, dst)


def _patch(monkeypatch, spark, dst_path, **kw):
    real_fs = fsutil._fs

    def fake(spark_, path):
        fs, p = real_fs(spark_, path)
        return _FsProxy(fs, dst_path, **kw), p

    monkeypatch.setattr(fsutil, "_fs", fake)


def test_roundtrip_and_overwrite(spark, tmp_path):
    p = str(tmp_path / "meta.json")
    fsutil.write_text_atomic(spark, p, "v1")
    assert fsutil.read_text(spark, p) == "v1"
    fsutil.write_text_atomic(spark, p, "v2")
    assert fsutil.read_text(spark, p) == "v2"


def test_failed_delete_plus_failed_rename_raises_stale(
    spark, tmp_path, monkeypatch
):
    """delete returns False AND rename fails → the surviving dst is the
    old file; must raise, never silently succeed (the pre-r14 bug)."""
    p = str(tmp_path / "meta.json")
    fsutil.write_text_atomic(spark, p, "OLD")
    dst_str = fsutil._fs(spark, p)[1].toString()
    _patch(monkeypatch, spark, dst_str, fail_delete=True, fail_rename=True)
    with pytest.raises(IOError, match="stale"):
        fsutil.write_text_atomic(spark, p, "NEW")
    monkeypatch.undo()
    assert fsutil.read_text(spark, p) == "OLD"  # survivor is the original
    # and no tmp litter
    import os

    assert [f for f in os.listdir(tmp_path) if ".tmp." in f] == []


def test_lost_race_to_concurrent_writer_is_tolerated(
    spark, tmp_path, monkeypatch
):
    """Our delete 'succeeded' (winner recreated dst immediately), rename
    refuses the existing destination → dst holds the winner's complete
    file; the loser returns quietly and drops its tmp."""
    p = str(tmp_path / "meta.json")
    fsutil.write_text_atomic(spark, p, "WINNER")
    dst_str = fsutil._fs(spark, p)[1].toString()
    _patch(monkeypatch, spark, dst_str, fake_delete_ok=True,
           fail_rename=True)
    fsutil.write_text_atomic(spark, p, "LOSER")  # no raise
    monkeypatch.undo()
    assert fsutil.read_text(spark, p) == "WINNER"
    import os

    assert [f for f in os.listdir(tmp_path) if ".tmp." in f] == []
