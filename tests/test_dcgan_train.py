"""End-to-end DCGAN training: protected train step, experiment loop,
checkpoint/resume, data-parallel mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iprgan_tpu.config import Config

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def make_watermark(tmp_path):
    from PIL import Image

    wm = np.zeros((16, 16, 4), np.uint8)
    wm[2:14, 2:14] = [0, 128, 255, 255]
    p = str(tmp_path / "wm.png")
    Image.fromarray(wm).save(p)
    return p


def make_config(tmp_path, ngpu=1, protection=True, iteration=4, freq=2,
                bsz=8):
    wm = make_watermark(tmp_path)
    conf = {
        "dataset": {"name": "synthetic", "path": "", "size": 32},
        "evaluation": {
            "p_thres": 0.01,
            "data": [{"bsz": 10, "name": "synthetic", "path": "",
                      "size": 32}],
        },
        "experiment": "ImageGeneration",
        "model": {
            "G": "ConvGenerator32", "D": "SNDiscriminator32",
            "opt": "Adam",
            "opt_param": {"lr": 2.0e-4, "betas": [0.5, 0.999]},
            "type": "DCGAN",
        },
        "hparam": {"bsz": bsz, "iteration": iteration,
                   "steps_per_call": 2},
        "log": {"freq": freq, "path": str(tmp_path / "log")},
        "protection": {
            "bbox": {
                "fn_inp": {"type": "TransformDist"},
                "fn_out": {"size": 16, "opaque": True,
                           "type": "PasteWatermark", "watermark": wm},
                "lambda": 1.0,
                "loss_fn": "ssim",
            },
            "wbox": {"gamma_0": 0.1, "string": "EXAMPLE A"},
        } if protection else None,
        "resource": {"gpu": True, "ngpu": ngpu, "worker": 0},
        "seed": 1234,
    }
    return Config(conf)


def test_dcgan_protected_training_runs(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_config(tmp_path)
    exp = get_experiment(config.experiment)(config)

    assert exp.bbox and exp.wbox
    # sign embedding at init -> BER is exactly 0
    ber0 = exp.model.protection.ber(exp.state, exp.state["G"]["params"])
    assert ber0 == 0.0

    metrics = exp.train_chunk(2)
    for key in ("D/Sum", "D/Real", "D/Fake", "G/Sum", "G/Adv", "P/SSIM",
                "P/SignLoss"):
        assert key in metrics, key
        assert np.all(np.isfinite(metrics[key])), key
        assert metrics[key].shape == (2,)
    # watermark loss is 1 - SSIM of untrained G: strictly positive
    assert metrics["P/SSIM"].min() > 0

    # params actually changed
    exp2_state = exp.state
    assert int(exp2_state["step"]) == 2


def test_dcgan_start_checkpoint_resume(tmp_path):
    from iprgan_tpu.experiments import get_experiment
    from iprgan_tpu.utils import checkpoint as ckpt

    config = make_config(tmp_path)
    exp = get_experiment(config.experiment)(config)
    exp.start()

    ckpt_path = os.path.join(config.log.path, ckpt.CKPT_NAME)
    assert os.path.exists(ckpt_path)
    sd = ckpt.load(ckpt_path)
    assert sd["step"] == "END"
    # reference key schema
    for key in ("G", "D", "optG", "optD", "fn_inp", "fn_out", "sign"):
        assert key in sd, key
    # sign training keeps the signature: BER still 0 after training
    ber = exp.model.protection.ber(exp.state, exp.state["G"]["params"])
    assert ber == 0.0

    # resume from END: init_step = total (reference quirk: base.py:57-65
    # re-runs the final step)
    config2 = make_config(tmp_path)
    config2.log.path = config.log.path
    exp2 = get_experiment(config2.experiment)(config2)
    exp2.load_state_dict(sd)
    assert exp2.init_step == config2.hparam.iteration

    # weights round-tripped exactly
    w_a = np.asarray(
        jax.device_get(exp.state["G"]["params"]["fc"]["dense"]["kernel"]))
    w_b = np.asarray(
        jax.device_get(exp2.state["G"]["params"]["fc"]["dense"]["kernel"]))
    np.testing.assert_array_equal(w_a, w_b)

    # mid-run checkpoint resume: step int
    sd["step"] = 2
    exp3 = get_experiment(make_config(tmp_path).experiment)(config2)
    exp3.load_state_dict(sd)
    assert exp3.init_step == 3


def test_dcgan_unprotected(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_config(tmp_path, protection=False)
    exp = get_experiment(config.experiment)(config)
    assert not exp.bbox and not exp.wbox
    metrics = exp.train_chunk(1)
    assert "P/SSIM" not in metrics
    assert "sign" not in exp.state and "fn_inp" not in exp.state
    assert np.isfinite(metrics["G/Sum"]).all()


def test_dcgan_data_parallel_8_devices(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_config(tmp_path, ngpu=8, iteration=16, bsz=4)
    exp = get_experiment(config.experiment)(config)
    # weak scaling applied: iteration 16//8=2, bsz 4*8=32
    assert config.hparam.iteration == 2
    assert config.hparam.bsz == 32
    assert exp.pctx.n == 8
    metrics = exp.train_chunk(2)
    assert np.isfinite(metrics["G/Sum"]).all()


def test_generate_shapes(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_config(tmp_path)
    exp = get_experiment(config.experiment)(config)
    z = jnp.zeros((4, 128))
    x = exp.model.generate(exp.state, z)
    assert x.shape == (4, 32, 32, 3)
    zwm = exp.model.transform_latent(exp.state, z)
    assert zwm.shape == z.shape
    ywm = exp.model.transform_output(exp.state, x)
    assert ywm.shape == x.shape
    # watermark pasted in the corner: top-left 16x16 differs from x
    assert not np.allclose(np.asarray(ywm[:, :16, :16]),
                           np.asarray(x[:, :16, :16]))
    assert np.allclose(np.asarray(ywm[:, 16:, 16:]),
                       np.asarray(x[:, 16:, 16:]))
