#!/usr/bin/env python
"""Snapshot / restore in-flight budget-run state across host wipes.

The multi-segment full-budget runs (CLAUDE.md) keep their rolling
checkpoint under the gitignored ``log/<RUN>/`` directory. The host is
NOT guaranteed to persist between driver segments (the 2026-08-19
segment found ``log/`` and both JAX compile caches gone, losing 124k
SRGAN steps), so durable progress must live in a git-tracked path.

``snapshot`` copies the rolling ``checkpoint.msgpack`` plus small
sidecar files (``metrics.json``, ``config.yaml``) from ``log/<RUN>/``
into ``artifacts/run_state/<RUN>/``; committing that directory makes
the training progress survive a wipe. TB event files are NOT
snapshotted — auto-resume never reads them and they grow tens of MB
per segment, compounding git history size for nothing (losing a
segment's TB scalars on a wipe is acceptable; losing steps is not).

``restore`` is the inverse. When the live run dir already has a
checkpoint, recency decides: an older live checkpoint (stale leftover
from a partly-restored host) is moved aside to ``checkpoint.msgpack
.stale`` and replaced by the newer snapshot; a live checkpoint at
least as new as the snapshot is kept. ``shutil.copy2`` preserves
mtimes through snapshot/restore round-trips, so the comparison is
meaningful across wipes.

Usage:
    python scripts/persist_run_state.py snapshot log/SRGAN-COMP-SYNTH-FULL
    python scripts/persist_run_state.py restore  log/SRGAN-COMP-SYNTH-FULL

No jax/flax imports — this runs next to a live trainer on a 1-core
host and must cost nothing.
"""
import argparse
import os
import shutil
import sys

CKPT = "checkpoint.msgpack"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _state_dir(run_dir: str) -> str:
    return os.path.join(REPO, "artifacts", "run_state",
                        os.path.basename(os.path.normpath(run_dir)))


def _check_origin(state_dir: str, run_dir: str) -> None:
    """The snapshot dir is keyed on basename(run_dir) only; record the
    full origin path and refuse if a different log root claims it."""
    marker = os.path.join(state_dir, "origin")
    origin = os.path.abspath(run_dir)
    if os.path.isfile(marker):
        with open(marker) as f:
            recorded = f.read().strip()
        if recorded != origin:
            sys.exit(f"snapshot dir {state_dir} belongs to {recorded}, "
                     f"not {origin}; refusing")
    else:
        os.makedirs(state_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write(origin + "\n")


def _sidecars(src: str, include_events: bool):
    """Small-files-first, checkpoint.msgpack LAST: the checkpoint is the
    authoritative file, so an interrupted copy sequence never leaves a
    newer checkpoint beside older sidecars."""
    names = []
    for name in sorted(os.listdir(src)):
        path = os.path.join(src, name)
        if not os.path.isfile(path) or name == "origin":
            continue
        if name.endswith((".msgpack", ".json", ".yaml")):
            names.append(name)
        elif include_events and name.startswith("events.out.tfevents"):
            names.append(name)
    names.sort(key=lambda n: n == CKPT)  # checkpoint last
    return names


SWEEP_DIRS = ("sign", "prune")


def _copy_sweep_jsons(src: str, dst: str, overwrite: bool = True) -> None:
    """The resumable prune/sign_flip sweeps key off per-pct JSONs under
    <run>/sign/ and <run>/prune/; carry them so a sweep interrupted by a
    segment boundary resumes where it stopped instead of from 10%.

    restore passes overwrite=False: a per-pct JSON already present in the
    live run dir is never clobbered by a (possibly older) snapshot copy.
    """
    for sub in SWEEP_DIRS:
        sdir = os.path.join(src, sub)
        if not os.path.isdir(sdir):
            continue
        ddir = os.path.join(dst, sub)
        os.makedirs(ddir, exist_ok=True)
        for name in sorted(os.listdir(sdir)):
            if not name.endswith(".json"):
                continue
            if not overwrite and os.path.exists(os.path.join(ddir, name)):
                continue
            tmp = os.path.join(ddir, name + ".tmp")
            shutil.copy2(os.path.join(sdir, name), tmp)
            os.replace(tmp, os.path.join(ddir, name))
            print(f"  {sub}/{name}")


def snapshot(run_dir: str) -> int:
    src = os.path.abspath(run_dir)
    if not os.path.isfile(os.path.join(src, CKPT)):
        print(f"no {CKPT} in {src}; nothing to snapshot", file=sys.stderr)
        return 1
    dst = _state_dir(run_dir)
    _check_origin(dst, run_dir)
    # drop any events file captured by the pre-round-4 snapshot format
    for name in os.listdir(dst):
        if name.startswith("events.out.tfevents"):
            os.remove(os.path.join(dst, name))
            print(f"dropped legacy snapshot file {name}")
    for name in _sidecars(src, include_events=False):
        # copy via a temp name then rename: the trainer may be rewriting
        # checkpoint.msgpack at a chunk boundary while we read it — the
        # rename keeps the snapshot dir always-valid even if this copy
        # races (the previous good snapshot stays in place until the new
        # one is complete)
        tmp = os.path.join(dst, name + ".tmp")
        shutil.copy2(os.path.join(src, name), tmp)
        os.replace(tmp, os.path.join(dst, name))
        print(f"snapshot {name}: "
              f"{os.path.getsize(os.path.join(dst, name)):,} bytes")
    _copy_sweep_jsons(src, dst)
    print(f"snapshotted {src} -> {dst}")
    return 0


def restore(run_dir: str) -> int:
    dst = os.path.abspath(run_dir)
    src = _state_dir(run_dir)
    snap_ckpt = os.path.join(src, CKPT)
    live_ckpt = os.path.join(dst, CKPT)
    if not os.path.isfile(snap_ckpt):
        print(f"no snapshot under {src}; nothing to restore")
        return 0
    _check_origin(src, run_dir)
    if os.path.isfile(live_ckpt):
        live_m, snap_m = os.path.getmtime(live_ckpt), \
            os.path.getmtime(snap_ckpt)
        print(f"live {CKPT}: {os.path.getsize(live_ckpt):,} bytes, "
              f"mtime {live_m:.0f}; snapshot: "
              f"{os.path.getsize(snap_ckpt):,} bytes, mtime {snap_m:.0f}")
        if live_m >= snap_m:
            print("live checkpoint is at least as new; keeping it")
            return 0
        stale = live_ckpt + ".stale"
        os.replace(live_ckpt, stale)
        print(f"live checkpoint OLDER than snapshot: moved to {stale}, "
              "restoring the newer snapshot")
    os.makedirs(dst, exist_ok=True)
    for name in _sidecars(src, include_events=True):
        shutil.copy2(os.path.join(src, name), os.path.join(dst, name))
        print(f"restore {name}")
    _copy_sweep_jsons(src, dst, overwrite=False)
    print(f"restored {src} -> {dst}")
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("action", choices=["snapshot", "restore"])
    ap.add_argument("run_dir", help="live run directory, e.g. "
                    "log/SRGAN-COMP-SYNTH-FULL")
    args = ap.parse_args()
    fn = snapshot if args.action == "snapshot" else restore
    raise SystemExit(fn(args.run_dir))


if __name__ == "__main__":
    main()
