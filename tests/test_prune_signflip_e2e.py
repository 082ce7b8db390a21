"""End-to-end prune.py and sign_flip.py sweeps through their real
main() on a tiny protected DCGAN checkpoint (stub inception)."""

import argparse
import json
import os

import pytest

from tests.test_dcgan_train import make_config

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


@pytest.fixture(autouse=True)
def fake_inception(monkeypatch):
    monkeypatch.setenv("IPRGAN_FAKE_INCEPTION", "1")


def _train_victim(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_config(tmp_path, iteration=2, freq=2)
    # small eval set keeps the 9/10-point sweeps fast
    config.evaluation.data = [{"bsz": 16, "name": "synthetic",
                               "path": "", "size": 32, "n": 64}]
    exp = get_experiment(config.experiment)(config)
    exp.start()
    return config


def test_prune_sweep(tmp_path):
    import prune

    config = _train_victim(tmp_path)
    args = argparse.Namespace(log=config.log.path, sample=None, cpu=False)
    prune.main(config.copy(), args)

    prune_dir = os.path.join(config.log.path, "prune")
    files = sorted(os.listdir(prune_dir))
    assert files == [f"{p:02d}.json" for p in range(10, 100, 10)]

    # the signature survives magnitude pruning (the paper's robustness
    # claim): norm scales sit at |w| ~= 1 while conv weights are small,
    # so even 90% global pruning leaves the sign bits intact
    for pct in (10, 50, 90):
        m = json.load(open(os.path.join(prune_dir, f"{pct:02d}.json")))
        assert float(m["synthetic"]["WBOX"]) < 0.05, pct


def test_sign_flip_sweep(tmp_path):
    import sign_flip

    config = _train_victim(tmp_path)
    args = argparse.Namespace(log=config.log.path, sample=None, cpu=False)
    sign_flip.main(config.copy(), args)

    sign_dir = os.path.join(config.log.path, "sign")
    files = set(os.listdir(sign_dir))
    assert files == {f"{p:02d}.json" for p in
                     list(range(10, 100, 10)) + [100]}

    # flipping p% of signs yields BER ~= p/100 (exact count by design)
    for pct in (10, 50, 100):
        m = json.load(open(os.path.join(sign_dir, f"{pct:02d}.json")))
        ber = float(m["synthetic"]["WBOX"])
        assert abs(ber - pct / 100.0) < 0.02, (pct, ber)
