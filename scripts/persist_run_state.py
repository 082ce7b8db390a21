#!/usr/bin/env python
"""Snapshot / restore in-flight budget-run state across host wipes.

The multi-segment full-budget runs (CLAUDE.md) keep their rolling
checkpoint under the gitignored ``log/<RUN>/`` directory. The host is
NOT guaranteed to persist between driver segments (the 2026-08-19
segment found ``log/`` and both JAX compile caches gone, losing 124k
SRGAN steps), so durable progress must live in a git-tracked path.

``snapshot`` copies the rolling ``checkpoint.msgpack`` plus any small
sidecar files (``metrics.json``, ``config.yaml``, TB event files) from
``log/<RUN>/`` into ``artifacts/run_state/<RUN>/``; committing that
directory makes the training progress survive a wipe. ``restore`` is
the inverse and is a no-op when the live run dir already has a
checkpoint (never clobber newer on-disk progress with an older
snapshot).

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


def _sidecars(src: str):
    for name in sorted(os.listdir(src)):
        path = os.path.join(src, name)
        if not os.path.isfile(path):
            continue
        if name.endswith((".msgpack", ".json", ".yaml")) \
                or name.startswith("events.out.tfevents"):
            yield name


def snapshot(run_dir: str) -> int:
    src = os.path.abspath(run_dir)
    if not os.path.isfile(os.path.join(src, CKPT)):
        print(f"no {CKPT} in {src}; nothing to snapshot", file=sys.stderr)
        return 1
    dst = _state_dir(run_dir)
    os.makedirs(dst, exist_ok=True)
    for name in _sidecars(src):
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
    print(f"snapshotted {src} -> {dst}")
    return 0


def restore(run_dir: str) -> int:
    dst = os.path.abspath(run_dir)
    src = _state_dir(run_dir)
    if not os.path.isfile(os.path.join(src, CKPT)):
        print(f"no snapshot under {src}; nothing to restore")
        return 0
    if os.path.isfile(os.path.join(dst, CKPT)):
        print(f"{dst} already has {CKPT}; refusing to clobber live state")
        return 0
    os.makedirs(dst, exist_ok=True)
    for name in _sidecars(src):
        shutil.copy2(os.path.join(src, name), os.path.join(dst, name))
        print(f"restore {name}")
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
