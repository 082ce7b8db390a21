"""Resumable sweep CLIs (prune.py / sign_flip.py).

Budget-scale sweeps can straddle a host/segment boundary; a pct point
whose JSON already exists must be skipped without rebuilding the
experiment, and — for sign_flip — WITHOUT perturbing the sequential
rng stream that later points consume. Host-only: the experiment layer
is replaced by a recording fake, so no jax compiles.
"""

import argparse
import json
import os

import numpy as np
import pytest

from iprgan_tpu.utils import checkpoint as ckpt
from tests.test_dcgan_train import make_config


def _write_victim(tmp_path):
    os.makedirs(tmp_path, exist_ok=True)
    config = make_config(tmp_path, iteration=2, freq=2)
    os.makedirs(config.log.path, exist_ok=True)
    rng = np.random.default_rng(0)
    sd = {
        "step": "END",
        "G": {"params": {
            "conv": {"kernel": rng.normal(size=(3, 3, 4, 4))
                     .astype(np.float32)},
            "bn": {"scale": rng.normal(size=(8,)).astype(np.float32),
                   "bias": np.zeros((8,), np.float32)},
        }},
    }
    ckpt.save(os.path.join(config.log.path, ckpt.CKPT_NAME), sd)
    return config


class _FakeExp:
    """Records the G norm scales it was asked to evaluate."""

    seen = {}  # attack_mode -> copy of the scale leaf

    def __init__(self, config):
        self.config = config

    def load_state_dict(self, sd, strict=True):
        scale = np.asarray(sd["G"]["params"]["bn"]["scale"])
        _FakeExp.seen[self.config.attack_mode] = scale.copy()

    def evaluate(self, fpath):
        with open(fpath, "w") as f:
            json.dump({"synthetic": {"WBOX": 0.0}}, f)


@pytest.fixture
def fake_experiment(monkeypatch):
    _FakeExp.seen = {}
    monkeypatch.setattr("iprgan_tpu.experiments.get_experiment",
                        lambda name: _FakeExp)
    return _FakeExp


def _args(config):
    return argparse.Namespace(log=config.log.path, sample=None, cpu=False)


def test_prune_skips_existing_points(tmp_path, fake_experiment):
    import prune

    config = _write_victim(tmp_path)
    prune_dir = os.path.join(config.log.path, "prune")
    os.makedirs(prune_dir)
    for pct in range(10, 90, 10):  # pre-done: 10..80
        with open(os.path.join(prune_dir, f"{pct:02d}.json"), "w") as f:
            json.dump({"done": True}, f)

    prune.main(config.copy(), _args(config))

    # only the missing point was evaluated; pre-done files untouched
    assert list(fake_experiment.seen) == ["PRUNE-90"]
    assert json.load(open(os.path.join(prune_dir, "10.json"))) == \
        {"done": True}
    assert os.path.exists(os.path.join(prune_dir, "90.json"))


def test_prune_all_done_builds_no_experiment(tmp_path, fake_experiment):
    import prune

    config = _write_victim(tmp_path)
    prune_dir = os.path.join(config.log.path, "prune")
    os.makedirs(prune_dir)
    for pct in range(10, 100, 10):
        with open(os.path.join(prune_dir, f"{pct:02d}.json"), "w") as f:
            json.dump({"done": True}, f)

    prune.main(config.copy(), _args(config))
    assert fake_experiment.seen == {}


def test_sign_flip_rng_stream_survives_skips(tmp_path, fake_experiment):
    """Flips applied at pct P are identical whether or not earlier
    points were skipped — flip_signs still advances the rng on skipped
    points, so a resumed sweep continues the exact same stream."""
    import sign_flip

    # full run: record scales at every point
    config = _write_victim(tmp_path / "full")
    sign_flip.main(config.copy(), _args(config))
    full = dict(_FakeExp.seen)
    assert set(full) == {f"SIGN-{p}" for p in range(10, 101, 10)}

    # resumed run on an identical victim: 10..50 already done
    _FakeExp.seen = {}
    config2 = _write_victim(tmp_path / "resume")
    sign_dir = os.path.join(config2.log.path, "sign")
    os.makedirs(sign_dir)
    for pct in range(10, 60, 10):
        with open(os.path.join(sign_dir, f"{pct:02d}.json"), "w") as f:
            json.dump({"done": True}, f)

    sign_flip.main(config2.copy(), _args(config2))

    assert set(_FakeExp.seen) == {f"SIGN-{p}" for p in range(60, 101, 10)}
    for mode, scale in _FakeExp.seen.items():
        np.testing.assert_array_equal(scale, full[mode], err_msg=mode)
