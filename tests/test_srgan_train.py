"""SRGAN: two-phase training, lr drop, pretrain snapshot, SR eval metrics."""

import os

import numpy as np
import pytest

from iprgan_tpu.config import Config
from tests.test_dcgan_train import make_watermark

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def make_sr_config(tmp_path, pretrain=2, iteration=4):
    wm = make_watermark(tmp_path)
    conf = {
        "dataset": {"name": "sr_synthetic", "path": "", "size": 96},
        "evaluation": {
            "p_thres": 0.05,
            "data": [{"bsz": 1, "name": "sr_synthetic", "path": "",
                      "size": -1, "n": 3}],
        },
        "experiment": "ImageSuperResolution",
        "model": {
            "G": "SRResNet", "D": "Discriminator96", "V": "VGG19Feature",
            "opt": "Adam", "opt_param": {"lr": 1.0e-4},
            "type": "SRGAN",
        },
        "hparam": {"bsz": 2, "pretrain_iter": pretrain,
                   "iteration": iteration, "steps_per_call": 2},
        "log": {"freq": 2, "path": str(tmp_path / "log")},
        "protection": {
            "bbox": {
                "fn_inp": {"size": 12, "type": "RandomNoisePatch"},
                "fn_out": {"size": 48, "opaque": True,
                           "type": "PasteWatermark", "watermark": wm},
                "lambda": 1.0,
                "loss_fn": "ssim",
            },
            "wbox": {"gamma_0": 0.1, "string": "EXAMPLE A"},
        },
        "resource": {"gpu": True, "ngpu": 1, "worker": 0},
        "seed": 1234,
    }
    return Config(conf)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from iprgan_tpu.experiments import get_experiment

    tmp_path = tmp_path_factory.mktemp("srgan")
    config = make_sr_config(tmp_path)
    exp = get_experiment(config.experiment)(config)
    return exp, config, tmp_path


def test_srgan_two_phase(trained):
    exp, config, tmp_path = trained

    # pretrain chunk: MSE only metrics (+ sign loss), no adversarial
    m1 = exp.train_chunk(2)
    assert "G/MSE" in m1 and "P/SignLoss" in m1
    assert "G/Adv" not in m1 and "P/SSIM" not in m1  # bbox inhibited
    assert np.isfinite(m1["G/MSE"]).all()
    # pretrain snapshot saved at boundary
    assert os.path.exists(os.path.join(config.log.path,
                                       "pretrain.msgpack"))

    # GAN phunk: adversarial + perceptual + protection
    m2 = exp.train_chunk(2)
    for key in ("G/Adv", "G/Con", "D/Sum", "D/Real", "D/Fake",
                "P/SSIM", "P/SignLoss", "G/Sum"):
        assert key in m2 and np.isfinite(m2[key]).all(), key

    # halfway lr drop: pretrain=2, iteration=4 -> halfway at step 4
    lr_now = float(np.asarray(
        exp.state["optG"].hyperparams["learning_rate"]))
    assert lr_now == pytest.approx(1.0e-5, rel=1e-3)

    # BER of SRResNet BN scales still 0 after training
    assert exp.model.protection.ber(exp.state,
                                    exp.state["G"]["params"]) == 0.0


def test_srgan_eval_metrics(trained):
    exp, config, tmp_path = trained
    fpath = str(tmp_path / "metrics.json")
    metrics = exp.evaluate(fpath)
    entry = metrics["sr_synthetic"]
    assert set(entry) == {"PSNR", "SSIM", "WBOX", "BBOX"}
    assert float(entry["WBOX"]) == 0.0
    assert 0 < float(entry["SSIM"]) <= 1
    assert float(entry["PSNR"]) > 0
    assert os.path.exists(fpath)


def test_sr_quality_metrics_sanity():
    from iprgan_tpu.ops.quality import psnr_uint8, rgb_to_luma_uint8, ssim_uint8

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    y = rgb_to_luma_uint8(img)
    assert y.dtype == np.uint8 and y.shape == (32, 32)
    assert 16 <= y.min() and y.max() <= 235 + 1

    assert psnr_uint8(y, y) == float("inf")
    assert ssim_uint8(y, y) == pytest.approx(1.0)
    noisy = np.clip(y.astype(int) + rng.integers(-20, 21, y.shape),
                    0, 255).astype(np.uint8)
    p = psnr_uint8(y, noisy)
    assert 15 < p < 40
    s = ssim_uint8(y, noisy)
    assert 0 < s < 1
