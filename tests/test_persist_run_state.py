"""Snapshot/restore of in-flight budget-run state (scripts/persist_run_state.py).

Pure file-level behavior — no jax. Guards the cross-segment durability
protocol in CLAUDE.md: snapshot copies the rolling checkpoint + small
sidecars into a tracked dir; restore is the inverse and never clobbers
newer live state.
"""
import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "persist_run_state",
    os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                 "persist_run_state.py"))
prs = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(prs)


@pytest.fixture
def run_dir(tmp_path, monkeypatch):
    # redirect the tracked snapshot root into the tmp tree
    monkeypatch.setattr(prs, "REPO", str(tmp_path / "repo"))
    d = tmp_path / "log" / "RUN-X"
    d.mkdir(parents=True)
    (d / "checkpoint.msgpack").write_bytes(b"ckpt-v1")
    (d / "metrics.json").write_text("{}")
    (d / "events.out.tfevents.123.host").write_bytes(b"tb")
    (d / "samples.png").write_bytes(b"big image")  # must NOT be copied
    return d


def test_snapshot_copies_checkpoint_and_sidecars(run_dir):
    assert prs.snapshot(str(run_dir)) == 0
    dst = prs._state_dir(str(run_dir))
    assert sorted(os.listdir(dst)) == [
        "checkpoint.msgpack", "events.out.tfevents.123.host",
        "metrics.json"]
    with open(os.path.join(dst, "checkpoint.msgpack"), "rb") as f:
        assert f.read() == b"ckpt-v1"


def test_snapshot_without_checkpoint_fails(run_dir):
    os.remove(run_dir / "checkpoint.msgpack")
    assert prs.snapshot(str(run_dir)) == 1


def test_restore_roundtrip_into_wiped_run_dir(run_dir):
    prs.snapshot(str(run_dir))
    # simulate the host wipe: the live run dir is gone
    for f in run_dir.iterdir():
        f.unlink()
    run_dir.rmdir()
    assert prs.restore(str(run_dir)) == 0
    assert (run_dir / "checkpoint.msgpack").read_bytes() == b"ckpt-v1"
    assert (run_dir / "metrics.json").exists()


def test_restore_never_clobbers_live_checkpoint(run_dir):
    prs.snapshot(str(run_dir))
    # the live run advanced past the snapshot
    (run_dir / "checkpoint.msgpack").write_bytes(b"ckpt-v2-newer")
    assert prs.restore(str(run_dir)) == 0
    assert (run_dir / "checkpoint.msgpack").read_bytes() == b"ckpt-v2-newer"


def test_restore_with_no_snapshot_is_noop(run_dir, tmp_path):
    other = tmp_path / "log" / "RUN-Y"
    other.mkdir()
    assert prs.restore(str(other)) == 0
    assert list(other.iterdir()) == []
