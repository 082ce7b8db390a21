"""Collector script for full-budget artifacts (scripts/full_budget_postrun.py).

Pure file-IO paths — no model build, no compiles: fabricate a finished
log dir (END-sentinel checkpoint + metrics + sweep JSONs) and check the
collect step; fabricate an unfinished one and check the refusal.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "full_budget_postrun.py")

METRICS = {"synthetic": {"WBOX": "0.0000",
                         "BBOX": {"MATCH": "8/8", "P": "1e-3",
                                  "Q_WM": "0.9"}}}


def make_log(tmp_path, step):
    from iprgan_tpu.utils import checkpoint as ckpt
    log = tmp_path / "LOG"
    log.mkdir()
    ckpt.save(str(log / ckpt.CKPT_NAME),
              {"G": {"params": {"w": np.zeros(2, np.float32)}},
               "step": step})
    (log / "metrics.json").write_text(json.dumps(METRICS))
    for sweep, pcts in (("sign", range(10, 101, 10)),
                        ("prune", range(10, 91, 10))):
        (log / sweep).mkdir()
        for pct in pcts:
            (log / sweep / f"{pct}.json").write_text(json.dumps(METRICS))
    return log


def run(log, out, *extra):
    return subprocess.run(
        [sys.executable, SCRIPT, "-l", str(log), "-o", str(out), *extra],
        capture_output=True, text=True, cwd=REPO)


def test_collects_finished_run(tmp_path):
    log = make_log(tmp_path, "END")
    out = tmp_path / "artifacts"
    r = run(log, out, "--skip-sweeps")
    assert r.returncode == 0, r.stderr
    assert (out / "metrics.json").exists()
    assert sorted(os.listdir(out / "sign")) == sorted(
        f"{p}.json" for p in range(10, 101, 10))
    assert sorted(os.listdir(out / "prune")) == sorted(
        f"{p}.json" for p in range(10, 91, 10))
    # markdown tables carry the flattened metric columns
    assert "BBOX.Q_WM" in r.stdout and "| 100 |" in r.stdout


def test_refuses_unfinished_run(tmp_path):
    log = make_log(tmp_path, np.int32(42))
    r = run(log, tmp_path / "artifacts", "--skip-sweeps")
    assert r.returncode != 0
    assert "not complete" in r.stderr and "42" in r.stderr
    assert not (tmp_path / "artifacts").exists()
