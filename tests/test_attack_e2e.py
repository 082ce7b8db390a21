"""End-to-end removal attacks through the real attack.py main():
finetune and overwrite on a tiny protected DCGAN checkpoint."""

import argparse
import json
import os

import numpy as np
import pytest

from iprgan_tpu.utils import checkpoint as ckpt
from tests.test_dcgan_train import make_config, make_watermark


@pytest.fixture(autouse=True)
def fake_inception(monkeypatch):
    monkeypatch.setenv("IPRGAN_FAKE_INCEPTION", "1")


def _train_victim(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_config(tmp_path, iteration=2, freq=2)
    exp = get_experiment(config.experiment)(config)
    exp.start()
    return config


def test_attack_finetune_e2e(tmp_path):
    import attack

    config = _train_victim(tmp_path)
    args = argparse.Namespace(mode="finetune", load_discriminator=False,
                              watermark=None, log=config.log.path)
    attack.main(config.copy(), args)

    ft_log = os.path.abspath(config.log.path) + "-ND-FT"
    assert os.path.exists(os.path.join(ft_log, "config.yaml"))

    # owner's verification re-ran on the attacked weights
    metrics = json.load(open(os.path.join(config.log.path, "metrics.json")))
    assert "synthetic" in metrics
    # wbox BER still present (owner pipeline) — attack kept G weights
    assert "WBOX" in metrics["synthetic"]

    # attacked checkpoint has the victim's keys (no fn_*_ov for finetune
    # since the attack config dropped protection)
    sd = ckpt.load(os.path.join(config.log.path, ckpt.CKPT_NAME))
    assert "G" in sd and "sign" in sd


def test_attack_overwrite_e2e(tmp_path):
    import attack

    config = _train_victim(tmp_path)
    wm2_dir = tmp_path / "wm2_dir"
    wm2_dir.mkdir()
    wm2 = make_watermark(wm2_dir)
    args = argparse.Namespace(mode="overwrite", load_discriminator=True,
                              watermark=wm2, log=config.log.path)
    attack.main(config.copy(), args)

    ov_log = os.path.abspath(config.log.path) + "-D-OV"
    assert os.path.exists(os.path.join(ov_log, "config.yaml"))

    # attacker's transforms merged into the victim checkpoint as fn_*_ov
    sd = ckpt.load(os.path.join(config.log.path, ckpt.CKPT_NAME))
    assert "fn_inp_ov" in sd and "fn_out_ov" in sd
    assert "fn_inp" in sd and "fn_out" in sd
    metrics = json.load(open(os.path.join(config.log.path, "metrics.json")))
    assert "BBOX" in metrics["synthetic"]
