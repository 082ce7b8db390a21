"""Data-parallel correctness: an 8-device mesh must compute the same
training math as a single device (same global batch, same seeds) —
GSPMD partitions the program, it must not change it."""

import jax
import numpy as np
import pytest

from tests.test_dcgan_train import make_config

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


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


def _tree_allclose(a, b, atol):
    """Leaf-wise parameter agreement between two model states (psum /
    BN-stat reduction order amplified by Adam bounds them absolutely)."""
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(jax.device_get(xa)),
                                   np.asarray(jax.device_get(xb)),
                                   rtol=0, atol=atol)


def test_vae_dp_matches_single_device(tmp_path):
    """The reference wraps VAE in DataParallel (reference
    models/vae.py:18-19); our mesh equivalent: ngpu=8 x bsz 1 must equal
    ngpu=1 x bsz 8 (joint 'opt' over E+D, on-device batch sampling)."""
    from tests.test_vae_train import make_vae_config
    from iprgan_tpu.experiments import get_experiment

    results = {}
    for ngpu, bsz, sub in ((1, 8, "v1"), (8, 1, "v8")):
        config = make_vae_config(tmp_path)
        config.resource.ngpu = ngpu
        config.hparam.bsz = bsz
        config.hparam.iteration = 8 * ngpu  # weak scaling: /ngpu at init
        config.log.path = str(tmp_path / sub)
        exp = get_experiment(config.experiment)(config)
        assert config.hparam.bsz == 8 and exp.pctx.n == ngpu
        results[ngpu] = (exp.train_chunk(2), exp.state["G"]["params"])

    m1, m8 = results[1][0], results[8][0]
    for key in ("G/KL", "G/R", "G/Sum", "P/SSIM", "P/SignLoss"):
        np.testing.assert_allclose(m1[key], m8[key], rtol=2e-3, atol=2e-3)
    # Adam moves a param by up to ~lr per step when reduction-order
    # noise flips a near-zero gradient's sign: bound = 2 steps x ~2 x
    # lr(1e-3) -> 4e-3 worst case (observed max 3.9e-3); 6e-3 w/ margin
    _tree_allclose(results[1][1], results[8][1], atol=6e-3)


def test_srgan_dp_matches_single_device(tmp_path):
    """SRGAN DataParallel parity (reference models/srgan.py:17-19) on
    BOTH phases: the pretrain chunk (pixel MSE + wbox) and the GAN chunk
    (adversarial + perceptual + bbox), with per-phase weak scaling of
    pretrain_iter/iteration. ngpu=2 keeps the 96px compile small."""
    from tests.test_srgan_train import make_sr_config
    from iprgan_tpu.experiments import get_experiment

    results = {}
    for ngpu, bsz, sub in ((1, 2, "s1"), (2, 1, "s2")):
        config = make_sr_config(tmp_path, pretrain=2 * ngpu,
                                iteration=4 * ngpu)
        config.resource.ngpu = ngpu
        config.hparam.bsz = bsz
        config.log.path = str(tmp_path / sub)
        exp = get_experiment(config.experiment)(config)
        assert config.hparam.bsz == 2 and exp.pctx.n == ngpu
        m_pre = exp.train_chunk(2)   # pretrain phase
        m_gan = exp.train_chunk(2)   # GAN phase
        results[ngpu] = (m_pre, m_gan, exp.state["G"]["params"])

    for phase, keys in ((0, ("G/MSE", "P/SignLoss")),
                        (1, ("G/Adv", "G/Con", "D/Sum", "P/SSIM",
                             "G/Sum"))):
        for key in keys:
            np.testing.assert_allclose(
                results[1][phase][key], results[2][phase][key],
                rtol=5e-3, atol=5e-3, err_msg=f"phase {phase} {key}")
    _tree_allclose(results[1][2], results[2][2], atol=5e-3)


def test_cyclegan_dp_matches_single_device(tmp_path):
    """CycleGAN is the hardest DP case (reference models/cyclegan.py:
    19-23): replicated history pools updated from a sharded batch,
    per-epoch LR scheduler state, joint G/D optimizers. ngpu=2 x bsz 1
    must equal ngpu=1 x bsz 2 — including the pool buffers and the
    scheduler epoch counters."""
    from tests.test_cyclegan_train import make_cg_config
    from iprgan_tpu.experiments import get_experiment

    results = {}
    for ngpu, bsz, sub in ((1, 2, "c1"), (2, 1, "c2")):
        config = make_cg_config(tmp_path, epochs=2 * ngpu)
        config.resource.ngpu = ngpu
        config.hparam.bsz = bsz
        config.log.path = str(tmp_path / sub)
        exp = get_experiment(config.experiment)(config)
        assert config.hparam.bsz == 2 and exp.pctx.n == ngpu
        # identical LR-schedule constants on both legs
        assert exp.model.epoch == 2 and exp.model.steps_per_epoch == 6
        m = exp.train_chunk(3)
        results[ngpu] = (m, exp.state)

    m1, m2 = results[1][0], results[2][0]
    for key in ("G/Sum", "G/CycA", "G/CycB", "D/SumA", "D/SumB", "LR",
                "P/SSIM", "P/SignLoss"):
        np.testing.assert_allclose(m1[key], m2[key], rtol=5e-3, atol=5e-3,
                                   err_msg=key)
    s1, s2 = results[1][1], results[2][1]
    _tree_allclose(s1["GB"]["params"], s2["GB"]["params"], atol=5e-3)
    for pool in ("poolA", "poolB"):
        assert int(jax.device_get(s1[pool]["counts"])) == \
            int(jax.device_get(s2[pool]["counts"]))
        # pool entries are generator OUTPUTS: reduction-order noise in
        # the G update passes through InstanceNorm into the stored
        # images (observed max 6.5e-3 on <0.05% of pixels)
        _tree_allclose(s1[pool]["images"], s2[pool]["images"], atol=2e-2)
    assert int(jax.device_get(s1["schG"]["last_epoch"])) == \
        int(jax.device_get(s2["schG"]["last_epoch"]))


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
