"""The atomic small-file commit protocol (fsutil.write_text_atomic +
exists_atomic/read_text_atomic).

ADVICE r9 (medium): the r9 overwrite path was delete-then-rename — a
crash between the two left NO meta.json, and VectorStore.exists() then
read False, so the next increment silently re-fit a fresh store over
the orphaned generation. The fix is two-layered: an overwrite-ATOMIC
FileContext rename where the scheme supports it (local/HDFS — no
window at all), and for schemes without FileContext a backup-swap
whose every crash state the atomic readers resolve — dest wins; a
complete tmp with backup evidence rolls forward; a lone tmp (crashed
FIRST write, possibly torn) is correctly not a committed file.
"""

import pytest

from xdump_spark import fsutil


def _write(p, text):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)


def test_overwrite_is_windowless_on_local(spark, tmp_path):
    """Local paths take the FileContext overwrite rename: the tmp is
    swapped in in one call — no sibling artifacts survive."""
    dest = tmp_path / "meta.json"
    fsutil.write_text_atomic(spark, str(dest), "v1")
    assert dest.read_text() == "v1"
    fsutil.write_text_atomic(spark, str(dest), "v2")
    assert dest.read_text() == "v2"
    # no protocol siblings left behind (Hadoop's local .crc files are
    # checksum metadata, not part of the commit protocol)
    assert not (tmp_path / ".meta.json.tmp").exists()
    assert not (tmp_path / ".meta.json.old").exists()


def test_fallback_swap_round_trip(spark, tmp_path, monkeypatch):
    """With FileContext unavailable (the S3A shape) the backup-swap
    must still commit cleanly and leave no siblings."""
    monkeypatch.setattr(fsutil, "_rename_overwrite", lambda *a: False)
    dest = tmp_path / "meta.json"
    fsutil.write_text_atomic(spark, str(dest), "v1")
    fsutil.write_text_atomic(spark, str(dest), "v2")
    assert dest.read_text() == "v2"
    assert not (tmp_path / ".meta.json.tmp").exists()
    assert not (tmp_path / ".meta.json.old").exists()


def test_recovery_rolls_forward_interrupted_swap(spark, tmp_path):
    """The exact ADVICE crash state: dest deleted (backed up), rename
    of the complete tmp not yet done. The atomic readers must see the
    file as LIVE and serve the new text — not report it dead."""
    dest = tmp_path / "meta.json"
    _write(tmp_path / ".meta.json.tmp", '{"v": "new"}')
    _write(tmp_path / ".meta.json.old", '{"v": "old"}')
    assert fsutil.exists_atomic(spark, str(dest))
    assert fsutil.read_text_atomic(spark, str(dest)) == '{"v": "new"}'
    # the recovery completed the commit and swept the backup
    assert dest.read_text() == '{"v": "new"}'
    assert not (tmp_path / ".meta.json.tmp").exists()
    assert not (tmp_path / ".meta.json.old").exists()


def test_lone_tmp_is_not_a_committed_file(spark, tmp_path):
    """A crashed FIRST write (tmp possibly torn, nothing ever
    committed) must NOT be recovered — 'store does not exist yet' is
    the correct answer there."""
    dest = tmp_path / "meta.json"
    _write(tmp_path / ".meta.json.tmp", "torn{")
    assert not fsutil.exists_atomic(spark, str(dest))
    with pytest.raises(Exception):
        fsutil.read_text_atomic(spark, str(dest))
    assert not dest.exists()


def test_dest_wins_over_stale_siblings(spark, tmp_path):
    """An uncommitted tmp next to a live dest is a write that never
    happened: the committed text is served."""
    dest = tmp_path / "meta.json"
    _write(dest, "committed")
    _write(tmp_path / ".meta.json.tmp", "uncommitted")
    _write(tmp_path / ".meta.json.old", "older")
    assert fsutil.exists_atomic(spark, str(dest))
    assert fsutil.read_text_atomic(spark, str(dest)) == "committed"


def test_vector_store_meta_survives_interrupted_overwrite(spark, tmp_path):
    """End-to-end on the liveness bit itself: a VectorStore whose meta
    overwrite crashed mid-swap must still exists()=True and serve the
    NEW meta — the silent-refit-over-orphaned-history failure mode."""
    import json

    from xdump_spark.operators.incremental import VectorStore

    vs_dir = tmp_path / "vs"
    store = VectorStore(spark, str(vs_dir))
    old = {"centers": [[1.0, 0.0]], "n_cells": 1, "dtype": "float64"}
    new = {"centers": [[0.0, 1.0]], "n_cells": 1, "dtype": "float64",
           "generation": 1, "assigned_dir": "assigned_g1"}
    store._write_meta(old)
    # hand-construct the interrupted backup-swap state
    _write(vs_dir / ".meta.json.tmp", json.dumps(new))
    _write(vs_dir / ".meta.json.old", json.dumps(old))
    (vs_dir / "meta.json").unlink()
    assert store.exists()
    assert store._meta() == new


def test_fallback_swap_every_crash_point(spark, tmp_path, monkeypatch):
    """Exhaustive crash-point enumeration of the backup-swap fallback:
    simulate a crash after EVERY filesystem step of an overwrite commit
    and assert the atomic readers' invariant — once a first commit
    succeeded, the file always reads as LIVE and its content is either
    the old or the new text, never absent and never torn."""
    monkeypatch.setattr(fsutil, "_rename_overwrite", lambda *a: False)

    # the fallback's step sequence for an overwrite of dest:
    #   0: tmp fully written
    #   1: stale backup deleted (no-op when absent)
    #   2: dest renamed -> .old
    #   3: tmp renamed -> dest
    #   4: .old deleted
    for crash_after in range(5):
        d = tmp_path / f"case{crash_after}"
        d.mkdir()
        dest = d / "meta.json"
        fsutil.write_text_atomic(spark, str(dest), "OLD")  # first commit

        tmp = d / ".meta.json.tmp"
        old = d / ".meta.json.old"
        # replay the protocol by hand up to the crash point
        tmp.write_text("NEW")                       # step 0
        if crash_after >= 2:
            dest.rename(old)                        # step 2
        if crash_after >= 3:
            tmp.rename(dest)                        # step 3
        if crash_after >= 4:
            old.unlink()                            # step 4
        # the hand-simulated steps bypass Hadoop's local checksum
        # layer, so its .crc sidecars are stale; the fallback's real
        # targets (object stores) have no checksum sidecars at all
        for crc in d.glob(".*.crc"):
            crc.unlink()

        assert fsutil.exists_atomic(spark, str(dest)), crash_after
        got = fsutil.read_text_atomic(spark, str(dest))
        assert got in ("OLD", "NEW"), (crash_after, got)
        # crashes at/after the backup rename are committed (the
        # complete tmp + backup evidence rolls forward); before it the
        # write never happened
        want = "NEW" if crash_after >= 2 else "OLD"
        assert got == want, crash_after
        # and the state is self-healing: a plain re-read and the next
        # writer both see a clean, sibling-consistent file
        assert fsutil.read_text_atomic(spark, str(dest)) == want
        fsutil.write_text_atomic(spark, str(dest), "NEXT")
        assert dest.read_text() == "NEXT"
        assert not tmp.exists() and not old.exists()
