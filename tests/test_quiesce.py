"""Trainer quiescing (iprgan_tpu/utils/quiesce.py).

bench.py and __graft_entry__.dryrun_multichip pause live budget
trainers (SIGSTOP) while they measure/validate on the shared 1-core
host + single chip, and resume them afterwards. The matcher must be
surgical: real ``python train.py`` processes only — never a shell whose
command STRING merely mentions train.py (killing/stopping by pattern
match is how sessions shoot themselves), and never our own ancestry.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

from iprgan_tpu.utils.quiesce import find_trainers, pause_trainers


def _state(pid: int) -> str:
    with open(f"/proc/{pid}/stat") as f:
        return f.read().split(")")[-1].split()[0]


@pytest.fixture
def fake_trainer(tmp_path):
    """A real ``python <dir>/train.py`` process (just sleeps)."""
    script = tmp_path / "train.py"
    script.write_text("import time\ntime.sleep(600)\n")
    proc = subprocess.Popen([sys.executable, str(script)])
    time.sleep(0.3)
    yield proc
    proc.kill()
    proc.wait()


def test_find_trainers_matches_real_trainer(fake_trainer):
    assert fake_trainer.pid in find_trainers()


def test_find_trainers_matches_attack_process(tmp_path):
    # a budget-scale attack.py run (100k steps) is a trainer too — the
    # driver's bench/dryrun must pause it like train.py
    script = tmp_path / "attack.py"
    script.write_text("import time\ntime.sleep(600)\n")
    proc = subprocess.Popen([sys.executable, str(script)])
    time.sleep(0.3)
    try:
        assert proc.pid in find_trainers()
    finally:
        proc.kill()
        proc.wait()


def test_find_trainers_ignores_shell_mentions(tmp_path):
    # a shell whose -c STRING contains "train.py" must NOT match —
    # argv[0] is a shell, argv[1] is "-c"
    proc = subprocess.Popen(
        ["/bin/sh", "-c", "echo watching train.py; sleep 600"])
    time.sleep(0.3)
    try:
        assert proc.pid not in find_trainers()
    finally:
        proc.kill()
        proc.wait()


def test_find_trainers_ignores_non_trainer_python():
    proc = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(600)"])
    time.sleep(0.3)
    try:
        assert proc.pid not in find_trainers()
    finally:
        proc.kill()
        proc.wait()


def test_pause_resumes_even_on_exception(fake_trainer):
    with pytest.raises(RuntimeError):
        with pause_trainers(drain_secs=0.2):
            assert _state(fake_trainer.pid) == "T"
            raise RuntimeError("measurement blew up")
    time.sleep(0.2)
    assert _state(fake_trainer.pid) in ("S", "R")


def test_pause_skips_dead_pid_gracefully(fake_trainer):
    # trainer dies between find and SIGSTOP/SIGCONT: no crash
    ctx = pause_trainers(drain_secs=0.0)
    fake_trainer.send_signal(signal.SIGKILL)
    fake_trainer.wait()
    with ctx:
        pass  # must not raise despite the stale pid


def test_own_ancestry_never_matched():
    # this pytest process's ancestry chain is excluded by construction;
    # sanity-check that we are not somehow in the candidate list
    assert os.getpid() not in find_trainers()
