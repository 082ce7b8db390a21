"""Snapshot/restore of in-flight budget-run state (scripts/persist_run_state.py).

Pure file-level behavior — no jax. Guards the cross-segment durability
protocol in CLAUDE.md: snapshot copies the rolling checkpoint + small
sidecars into a tracked dir (checkpoint LAST, no TB events); restore is
recency-aware — it keeps live state that is at least as new as the
snapshot and replaces stale live state (moving it aside) otherwise.
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
    # no TB events in the snapshot (repo-size guard) and an origin marker
    assert sorted(os.listdir(dst)) == [
        "checkpoint.msgpack", "metrics.json", "origin"]
    with open(os.path.join(dst, "checkpoint.msgpack"), "rb") as f:
        assert f.read() == b"ckpt-v1"
    with open(os.path.join(dst, "origin")) as f:
        assert f.read().strip() == str(run_dir)


def test_snapshot_drops_legacy_events_files(run_dir):
    # pre-round-4 snapshots included TB event files; a new snapshot
    # removes them from the tracked dir
    dst = prs._state_dir(str(run_dir))
    os.makedirs(dst)
    with open(os.path.join(dst, "events.out.tfevents.9.host"), "wb") as f:
        f.write(b"legacy")
    assert prs.snapshot(str(run_dir)) == 0
    assert not any(n.startswith("events") for n in os.listdir(dst))


def test_sidecar_order_copies_checkpoint_last(run_dir):
    names = prs._sidecars(str(run_dir), include_events=False)
    assert names[-1] == "checkpoint.msgpack"
    assert "events.out.tfevents.123.host" not in names
    assert "samples.png" not in names


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


def test_restore_keeps_newer_live_checkpoint(run_dir):
    prs.snapshot(str(run_dir))
    # the live run advanced past the snapshot (copy2 preserved the
    # snapshot's mtime, so the rewritten live file is strictly newer)
    live = run_dir / "checkpoint.msgpack"
    live.write_bytes(b"ckpt-v2-newer")
    snap = os.path.join(prs._state_dir(str(run_dir)), "checkpoint.msgpack")
    os.utime(live, (os.path.getmtime(snap) + 10,) * 2)
    assert prs.restore(str(run_dir)) == 0
    assert live.read_bytes() == b"ckpt-v2-newer"


def test_restore_replaces_stale_live_checkpoint(run_dir):
    prs.snapshot(str(run_dir))
    # a stale leftover live checkpoint OLDER than the snapshot (e.g. a
    # partially-restored host) must not shadow the newer snapshot
    live = run_dir / "checkpoint.msgpack"
    live.write_bytes(b"ckpt-v0-stale")
    os.utime(live, (1, 1))
    assert prs.restore(str(run_dir)) == 0
    assert live.read_bytes() == b"ckpt-v1"
    assert (run_dir / "checkpoint.msgpack.stale").read_bytes() == \
        b"ckpt-v0-stale"


def test_origin_mismatch_refuses(run_dir, tmp_path):
    prs.snapshot(str(run_dir))
    other = tmp_path / "otherroot" / "RUN-X"
    other.mkdir(parents=True)
    (other / "checkpoint.msgpack").write_bytes(b"x")
    with pytest.raises(SystemExit):
        prs.snapshot(str(other))
    with pytest.raises(SystemExit):
        prs.restore(str(other))


def test_snapshot_and_restore_carry_sweep_jsons(run_dir):
    # per-pct prune/sign_flip sweep JSONs must straddle segment wipes so
    # the resumable sweeps actually resume (ADVICE r04)
    for sub, done in (("sign", ["10.json", "20.json"]), ("prune", ["10.json"])):
        (run_dir / sub).mkdir()
        for n in done:
            (run_dir / sub / n).write_text('{"WBOX": "0.0"}')
        (run_dir / sub / "scratch.txt").write_text("not a json")
    prs.snapshot(str(run_dir))
    dst = prs._state_dir(str(run_dir))
    assert sorted(os.listdir(os.path.join(dst, "sign"))) == \
        ["10.json", "20.json"]
    assert os.listdir(os.path.join(dst, "prune")) == ["10.json"]

    # wipe + restore brings the sweep state back
    for f in sorted(run_dir.rglob("*"), reverse=True):
        f.unlink() if f.is_file() else f.rmdir()
    run_dir.rmdir()
    assert prs.restore(str(run_dir)) == 0
    assert sorted(os.listdir(run_dir / "sign")) == ["10.json", "20.json"]


def test_restore_never_clobbers_live_sweep_json(run_dir):
    (run_dir / "sign").mkdir()
    (run_dir / "sign" / "10.json").write_text('{"old": 1}')
    prs.snapshot(str(run_dir))
    # live sweep advanced past the snapshot after it was taken
    (run_dir / "sign" / "10.json").write_text('{"new": 2}')
    (run_dir / "checkpoint.msgpack").write_text("newer")
    assert prs.restore(str(run_dir)) == 0
    assert (run_dir / "sign" / "10.json").read_text() == '{"new": 2}'


def test_restore_with_no_snapshot_is_noop(run_dir, tmp_path):
    other = tmp_path / "log" / "RUN-Y"
    other.mkdir()
    assert prs.restore(str(other)) == 0
    assert list(other.iterdir()) == []
