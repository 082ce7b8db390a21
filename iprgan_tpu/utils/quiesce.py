"""Pause live budget trainers while a measurement/validation runs.

The driver executes ``bench.py`` and ``__graft_entry__.dryrun_multichip``
at end-of-round on a host that may still be running a multi-segment
full-budget trainer (CLAUDE.md). On this 1-core machine the trainer
both competes for the CPU and keeps the single TPU chip busy, so any
timing (bench) or wall-clock-budgeted validation (dryrun) would be
roughly halved in speed. Stopping the host process lets the in-flight
device chunk drain (seconds at the budget configs' steps_per_call);
SIGCONT afterwards resumes training with zero lost steps.

Matching is deliberately narrow — a process whose argv[0] is a python
interpreter AND argv[1] basename is exactly ``train.py`` or
``attack.py`` (a budget-scale removal attack is a 100k-step trainer
too) — never a shell pattern match (a wrapper shell's command string
also contains "train.py"), and never any pid in our own ancestry.
"""

import contextlib
import os
import signal
import sys
import time


def _ancestors() -> set:
    out, pid = set(), os.getpid()
    while pid > 1:
        out.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
    return out


TRAINER_BASENAMES = (b"train.py", b"attack.py")


def find_trainers() -> list:
    """Pids of live ``python .../train.py`` / ``python .../attack.py``
    processes, own ancestry excluded."""
    skip = _ancestors()
    out = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit() or int(entry) in skip:
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as f:
                argv = f.read().split(b"\0")
        except OSError:
            continue
        if (len(argv) >= 2
                and os.path.basename(argv[0]).startswith(b"python")
                and os.path.basename(argv[1]) in TRAINER_BASENAMES):
            out.append(int(entry))
    return out


@contextlib.contextmanager
def pause_trainers(drain_secs: float = 20.0, log=sys.stderr):
    """SIGSTOP live trainers, wait for the in-flight chunk to drain,
    yield, SIGCONT on exit (also on exceptions)."""
    trainers = find_trainers()
    for t in trainers:
        try:
            os.kill(t, signal.SIGSTOP)
            print(f"quiesce: paused trainer pid {t} (SIGCONT on exit)",
                  file=log)
        except OSError:
            pass
    if trainers:
        time.sleep(drain_secs)
    try:
        yield
    finally:
        for t in trainers:
            try:
                os.kill(t, signal.SIGCONT)
                print(f"quiesce: resumed trainer pid {t}", file=log)
            except OSError:
                pass
