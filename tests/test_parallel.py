"""Data-parallel correctness: an 8-device mesh must compute the same
training math as a single device (same global batch, same seeds) —
GSPMD partitions the program, it must not change it."""

import jax
import numpy as np
import pytest

from tests.test_dcgan_train import make_config


def _run(tmp_path, ngpu, bsz, iteration, subdir):
    from iprgan_tpu.experiments import get_experiment

    config = make_config(tmp_path, ngpu=ngpu, bsz=bsz,
                         iteration=iteration, freq=100)
    config.log.path = str(tmp_path / subdir)
    exp = get_experiment(config.experiment)(config)
    metrics = exp.train_chunk(2)
    g_kernel = np.asarray(jax.device_get(
        exp.state["G"]["params"]["fc"]["dense"]["kernel"]))
    return metrics, g_kernel


def test_dp_matches_single_device(tmp_path):
    # weak scaling: ngpu=8 with bsz 4 -> global batch 32, iterations /8;
    # ngpu=1 with bsz 32 -> same global batch. Same seed -> same latents,
    # same batch indices, same math (up to reduction order).
    m1, k1 = _run(tmp_path, ngpu=1, bsz=32, iteration=2, subdir="a")
    m8, k8 = _run(tmp_path, ngpu=8, bsz=4, iteration=16, subdir="b")

    for key in ("D/Sum", "G/Sum", "G/Adv", "P/SSIM"):
        np.testing.assert_allclose(m1[key], m8[key], rtol=2e-3, atol=2e-4)
    # params diverge only by reduction order (psum/BN-mean) amplified by
    # Adam's rsqrt on near-zero second moments — bound absolutely
    np.testing.assert_allclose(k1, k8, rtol=0, atol=2e-3)


def test_eval_matches_single_device(tmp_path, monkeypatch):
    """Mesh-sharded evaluation (generated/real batches scattered over
    the data axis, the reference's DataParallel-eval equivalent) must
    produce the same metrics as a single device — including the padding
    path (eval bsz 10 over 8 devices pads 6 rows)."""
    monkeypatch.setenv("IPRGAN_FAKE_INCEPTION", "1")
    from iprgan_tpu.experiments import get_experiment

    results = {}
    for ngpu, sub in ((1, "e1"), (8, "e8")):
        config = make_config(tmp_path, ngpu=ngpu, bsz=8, iteration=2,
                             freq=100)
        config.log.path = str(tmp_path / sub)
        exp = get_experiment(config.experiment)(config)
        results[ngpu] = exp.evaluate(str(tmp_path / f"metrics{ngpu}.json"))

    e1, e8 = results[1]["synthetic"], results[8]["synthetic"]
    assert set(e1) == set(e8)
    np.testing.assert_allclose(float(e1["FID"]), float(e8["FID"]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(e1["IS_MEAN"]), float(e8["IS_MEAN"]),
                               rtol=1e-3, atol=1e-4)
    assert e1["WBOX"] == e8["WBOX"]
    np.testing.assert_allclose(float(e1["BBOX"]["Q_WM"]),
                               float(e8["BBOX"]["Q_WM"]), atol=1e-3)
    assert e1["BBOX"]["MATCH"] == e8["BBOX"]["MATCH"]


def test_parallel_context_shardings():
    from iprgan_tpu.parallel import ParallelContext

    pctx = ParallelContext(n_requested=8)
    assert pctx.n == 8
    x = np.zeros((4, 16, 2, 2, 3), np.uint8)
    sharded = pctx.shard_batch(x, axis=1)
    # batch axis split over 8 devices
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(4, 2, 2, 2, 3)}

    pctx1 = ParallelContext(n_requested=4, use_accel=False)
    assert pctx1.n == 1  # resource.gpu false pins to one device
