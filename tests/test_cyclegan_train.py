"""CycleGAN: pools, LR decay, epoch->step conversion, eval PNG dumps."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iprgan_tpu.config import Config
from iprgan_tpu.models.cyclegan import pool_query
from tests.test_dcgan_train import make_watermark

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def make_cg_config(tmp_path, epochs=2):
    wm = make_watermark(tmp_path)
    conf = {
        "dataset": {"name": "unaligned_synthetic", "path": "",
                    "load": 70, "crop": 64},
        "evaluation": {
            "p_thres": 0.05,
            "data": [{"bsz": 1, "name": "unaligned_synthetic", "path": "",
                      "load": 70, "crop": 64}],
        },
        "experiment": "ImageTranslation",
        "model": {
            "G": "Resnet6Blocks", "D": "ConvDiscriminator",
            "lambda_A": 10.0, "lambda_B": 10.0, "lambda_idt": 0.5,
            "opt": "Adam",
            "opt_param": {"lr": 2.0e-4, "betas": [0.5, 0.999]},
            "pool_size": 4, "type": "CycleGAN",
        },
        "hparam": {"bsz": 2, "iteration": epochs, "steps_per_call": 3},
        "log": {"freq": 1, "path": str(tmp_path / "log")},
        "protection": {
            "bbox": {
                "fn_inp": {"size": 32, "type": "RandomNoisePatch"},
                "fn_out": {"size": 32, "opaque": True,
                           "type": "PasteWatermark", "watermark": wm},
                "lambda": 1.0, "loss_fn": "ssim",
            },
            "wbox": {"gamma_0": 0.1, "string": "EXAMPLE A"},
        },
        "resource": {"gpu": True, "ngpu": 1, "worker": 0},
        "seed": 1234,
    }
    return Config(conf)


def test_pool_query_semantics():
    pool = {"images": jnp.zeros((4, 2, 2, 1)), "counts": jnp.int32(0)}
    img = jnp.ones((1, 2, 2, 1))

    # fill phase: returns incoming, appends
    out, pool = pool_query(pool, img, jax.random.PRNGKey(0), 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    assert int(pool["counts"]) == 1
    assert float(pool["images"][0].sum()) == 4.0

    for i in range(3):
        out, pool = pool_query(pool, img * (i + 2),
                               jax.random.PRNGKey(i + 1), 4)
    assert int(pool["counts"]) == 4

    # full phase: counts stop growing; returned is either incoming or a
    # pool entry; pool contents stay from {1..5}
    out, pool = pool_query(pool, img * 9, jax.random.PRNGKey(99), 4)
    assert int(pool["counts"]) == 4
    v = float(np.asarray(out)[0, 0, 0, 0])
    assert v in {1.0, 2.0, 3.0, 4.0, 9.0}


def test_pool_query_rejects_small_pool():
    pool = {"images": jnp.zeros((2, 2, 2, 1)), "counts": jnp.int32(0)}
    img = jnp.ones((4, 2, 2, 1))
    with pytest.raises(ValueError, match="pool_size"):
        pool_query(pool, img, jax.random.PRNGKey(0), 2)


def test_cyclegan_train_and_lr_decay(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_cg_config(tmp_path, epochs=2)
    exp = get_experiment(config.experiment)(config)

    # epoch->step conversion: 12 samples / bsz 2 -> 6 steps/epoch
    assert config.hparam.iteration == 12
    assert config.log.freq == 6
    assert exp.model.epoch == 2

    m = exp.train_chunk(3)
    for key in ("G/A", "G/B", "G/CycA", "G/CycB", "G/IdtA", "G/IdtB",
                "G/Sum", "D/RealA", "D/FakeA", "D/SumA", "D/RealB",
                "D/FakeB", "D/SumB", "LR", "P/SSIM", "P/SignLoss"):
        assert key in m and np.all(np.isfinite(m[key])), key
    # epoch 0 of 2 (half=1): factor 1.0
    assert m["LR"][0] == pytest.approx(2.0e-4)

    # advance into the second epoch: factor 1 - (1-1)/1 = 1 at epoch 1,
    # then 0 at epoch 2 (final steps)
    for _ in range(3):
        m = exp.train_chunk(3)
    # last step is step 12 -> epochs_done = 1 -> factor 1 - 0 = 1.0
    # (decay reaches 0 only past the final epoch boundary)
    assert m["LR"][-1] <= 2.0e-4

    # checkpoint schema includes pools and schedulers
    sd = exp.state_dict()
    for key in ("GA", "GB", "DA", "DB", "optG", "optD", "schG", "schD",
                "poolA", "poolB", "fn_inp", "fn_out", "sign"):
        assert key in sd, key

    # sign embedded in GB (InstanceNorm affine scales): BER 0
    assert exp.model.protection.ber(exp.state,
                                    exp.state["GB"]["params"]) == 0.0


def test_cyclegan_eval_dumps_pngs(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_cg_config(tmp_path)
    exp = get_experiment(config.experiment)(config)
    fpath = str(tmp_path / "out" / "metrics.json")
    os.makedirs(os.path.dirname(fpath), exist_ok=True)
    metrics = exp.evaluate(fpath)

    entry = metrics["unaligned_synthetic"]
    assert "WBOX" in entry and "BBOX" in entry
    # translated frames dumped for the external FCN scorer
    img_dir = os.path.join(tmp_path, "out", "samples",
                           "unaligned_synthetic")
    assert os.path.exists(os.path.join(img_dir, "0.png"))
    assert len(os.listdir(img_dir)) == 12
