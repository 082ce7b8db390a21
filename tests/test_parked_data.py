"""HBM-parked data path (``dataset.park: true``): device-side crop/flip
sampling for the SR and translation experiments (data/parked.py).

The host-streamed path stays the default (real corpora like ImageNet
don't fit HBM); parking is the TPU-native fast path for datasets that
do, removing all per-step host->device traffic.
"""

import os

import jax
import numpy as np
import pytest

from tests.test_cyclegan_train import make_cg_config
from tests.test_srgan_train import make_sr_config

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def test_crop_batch_matches_host_slicing():
    """Every sampled crop must be an exact (possibly h-flipped)
    sub-window of the image its index points at."""
    from iprgan_tpu.data.parked import crop_batch

    rng = np.random.default_rng(3)
    stack = rng.integers(0, 256, (5, 12, 14, 3), dtype=np.uint8)
    crops, (idx, ys, xs, flips) = crop_batch(
        jax.numpy.asarray(stack), jax.random.PRNGKey(7), 16, 8,
        flip=True, with_meta=True)
    crops = np.asarray(crops)
    for j in range(16):
        ref = stack[int(idx[j]),
                    int(ys[j]):int(ys[j]) + 8,
                    int(xs[j]):int(xs[j]) + 8]
        if bool(flips[j]):
            ref = ref[:, ::-1]
        np.testing.assert_array_equal(crops[j], ref)
    # offsets actually span the valid range over many draws
    assert int(np.asarray(ys).max()) <= 12 - 8
    assert int(np.asarray(xs).max()) <= 14 - 8


def test_sr_park_images_uniform_and_padded():
    from iprgan_tpu.data import get_dataset

    ds = get_dataset("sr_synthetic", path="", size=96)
    imgs = ds.park_images()
    assert imgs.dtype == np.uint8
    assert imgs.shape[0] == len(ds)
    assert imgs.shape[1] >= 96 and imgs.shape[2] >= 96


def test_unaligned_park_images_two_sides():
    from iprgan_tpu.data import get_dataset

    ds = get_dataset("unaligned_synthetic", path="", load=70, crop=64)
    a, b = ds.park_images()
    assert a.dtype == np.uint8 and b.dtype == np.uint8
    assert a.shape[1:] == b.shape[1:]
    assert a.shape[1] == 70  # load-resize applied


def test_sr_parked_two_phase_train(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_sr_config(tmp_path)
    config.dataset["park"] = True
    exp = get_experiment(config.experiment)(config)
    assert exp._parked

    m1 = exp.train_chunk(2)  # pretrain phase
    assert "G/MSE" in m1 and np.isfinite(m1["G/MSE"]).all()
    assert os.path.exists(os.path.join(config.log.path,
                                       "pretrain.msgpack"))
    m2 = exp.train_chunk(2)  # GAN phase
    for key in ("G/Adv", "D/Sum", "P/SSIM", "P/SignLoss"):
        assert key in m2 and np.isfinite(m2[key]).all(), key
    assert exp.model.protection.ber(
        exp.state, exp.state["G"]["params"]) == 0.0


def test_sr_parked_dp_matches_single_device(tmp_path):
    """The parked sampler draws from the PRNG key only, so an 8-device
    mesh sees the same global batch as one device (weak scaling:
    bsz x8 / iterations /8) — metrics and params must agree."""
    from iprgan_tpu.experiments import get_experiment

    results = {}
    for ngpu, bsz, iters, sub in ((1, 8, 4, "p1"), (8, 1, 32, "p8")):
        config = make_sr_config(tmp_path, pretrain=iters // 2,
                                iteration=iters // 2)
        config.dataset["park"] = True
        config.hparam.bsz = bsz
        config.resource.ngpu = ngpu
        config.log.path = str(tmp_path / sub)
        exp = get_experiment(config.experiment)(config)
        m = exp.train_chunk(2)
        leaf = np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(exp.state["G"]["params"])[0]))
        results[ngpu] = (m, leaf)

    m1, k1 = results[1]
    m8, k8 = results[8]
    np.testing.assert_allclose(m1["G/MSE"], m8["G/MSE"],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(m1["P/SignLoss"], m8["P/SignLoss"],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(k1, k8, rtol=0, atol=2e-3)


def test_translation_parked_train(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_cg_config(tmp_path)
    config.dataset["park"] = True
    exp = get_experiment(config.experiment)(config)
    assert exp._parked

    m = exp.train_chunk(3)
    for key in ("G/Sum", "D/SumA", "D/SumB", "P/SSIM", "P/SignLoss"):
        assert key in m and np.isfinite(m[key]).all(), key
    # pools were queried and filled from device-sampled batches
    assert int(np.asarray(exp.state["poolA"]["counts"])) > 0
    assert exp.model.protection.ber(
        exp.state, exp.state["GB"]["params"]) == 0.0
