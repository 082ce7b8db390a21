"""VAE training: joint optimizer, KL+BCE numerics, latent-space trigger."""

import numpy as np

from iprgan_tpu.config import Config
from tests.test_dcgan_train import make_watermark
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def make_vae_config(tmp_path, protection=True):
    wm = make_watermark(tmp_path)
    conf = {
        "dataset": {"name": "synthetic", "path": "", "size": 32},
        "evaluation": {
            "p_thres": 0.05,
            "data": [{"bsz": 10, "name": "synthetic", "path": "",
                      "size": 32}],
        },
        "experiment": "ImageGeneration",
        "model": {
            "G": "Decoder32", "D": "Encoder32",
            "opt": "Adam",
            "opt_param": {"lr": 1.0e-3, "weight_decay": 1.0e-6},
            "type": "VAE",
        },
        "hparam": {"bsz": 8, "iteration": 4, "steps_per_call": 2},
        "log": {"freq": 2, "path": str(tmp_path / "log")},
        "protection": {
            "bbox": {
                "fn_inp": {"type": "TransformDist"},
                "fn_out": {"size": 16, "opaque": True,
                           "type": "PasteWatermark", "watermark": wm},
                "lambda": 50.0,
                "loss_fn": "ssim",
            },
            "wbox": {"gamma_0": 0.1, "string": "EXAMPLE A"},
        } if protection else None,
        "resource": {"gpu": True, "ngpu": 1, "worker": 0},
        "seed": 1234,
    }
    return Config(conf)


def test_vae_training_and_losses(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_vae_config(tmp_path)
    exp = get_experiment(config.experiment)(config)

    # single joint optimizer under the reference's 'opt' key
    assert "opt" in exp.state and "optG" not in exp.state

    metrics = exp.train_chunk(3)
    for key in ("G/KL", "G/R", "G/Sum", "P/SSIM", "P/SignLoss"):
        assert key in metrics and np.all(np.isfinite(metrics[key])), key
    # BCE-sum reconstruction per sample over 32*32*3 pixels is O(1000+)
    assert metrics["G/R"].min() > 100
    assert metrics["G/KL"].min() >= 0

    # training reduces reconstruction loss over a few more chunks
    first = metrics["G/R"][0]
    for _ in range(3):
        metrics = exp.train_chunk(3)
    assert metrics["G/R"][-1] < first

    # sign embedded in the decoder ("G"): BER 0
    assert exp.model.protection.ber(exp.state, exp.state["G"]["params"]) == 0.0


def test_vae_encode_decode_shapes(tmp_path):
    import jax
    import jax.numpy as jnp

    from iprgan_tpu.experiments import get_experiment

    config = make_vae_config(tmp_path, protection=False)
    exp = get_experiment(config.experiment)(config)
    x = jnp.zeros((4, 32, 32, 3))
    z, (mean, logvar) = exp.model.encode(exp.state, x, jax.random.PRNGKey(0))
    assert z.shape == (4, 128)
    y = exp.model.generate(exp.state, z)
    assert y.shape == (4, 32, 32, 3)
    assert float(y.min()) >= -1 and float(y.max()) <= 1
