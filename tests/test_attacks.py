"""Attack battery: prune percentile zeroing, sign flips, config rewrites,
and an end-to-end finetune-attack + owner-verification cycle."""

import os

import numpy as np
import pytest

from iprgan_tpu.config import Config
from tests.test_dcgan_train import make_config, make_watermark

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def test_prune_module_zeroes_below_percentile():
    from prune import prune_module

    sd = {
        "params": {
            "a": np.arange(1, 101, dtype=np.float32),   # 1..100
            "nested": {"b": -np.arange(1, 101, dtype=np.float32)},
        },
        "ints": np.arange(10, dtype=np.int32),  # non-float: untouched
    }
    prune_module(sd, 50)
    a = sd["params"]["a"]
    b = sd["params"]["nested"]["b"]
    # global percentile over 200 values (1..100 twice) -> threshold 50.5
    assert (a == 0).sum() == 50
    assert (b == 0).sum() == 50
    assert a[99] == 100  # large magnitudes survive
    np.testing.assert_array_equal(sd["ints"], np.arange(10))


def test_flip_signs_counts():
    from sign_flip import flip_signs

    sd = {"params": {
        "n0": {"scale": np.ones(10, np.float32)},
        "n1": {"scale": np.ones(6, np.float32)},
        "conv": {"kernel": np.ones((3, 3), np.float32)},
    }}
    rng = np.random.default_rng(0)
    nparams, nflip = flip_signs(sd, 50, rng)
    assert nparams == 16 and nflip == 8
    flipped = (sd["params"]["n0"]["scale"] < 0).sum() + \
        (sd["params"]["n1"]["scale"] < 0).sum()
    assert flipped == 8
    # kernel untouched
    assert (sd["params"]["conv"]["kernel"] == 1).all()

    # 100%: all signs flipped
    sd2 = {"params": {"n0": {"scale": np.ones(10, np.float32)}}}
    flip_signs(sd2, 100, rng)
    assert (sd2["params"]["n0"]["scale"] == -1).all()


def test_attack_config_rewrites(tmp_path):
    import attack

    config = make_config(tmp_path, iteration=10)
    ft = attack.update_finetune_config(config, load_discriminator=False)
    assert ft.protection is None
    assert ft.model.opt_param.lr == pytest.approx(2.0e-5)
    assert ft.hparam.iteration == 5
    assert ft.log.path.endswith("-ND-FT")
    assert ft.attack_mode == "FINETUNE"
    # original untouched
    assert config.hparam.iteration == 10 and config.protection is not None

    wm2 = make_watermark(tmp_path)
    ov = attack.update_overwrite_config(config, load_discriminator=True,
                                        watermark=wm2)
    assert ov.protection.wbox is None
    assert ov.protection.bbox.fn_out.watermark == wm2
    assert ov.log.path.endswith("-D-OV")
    assert ov.attack_mode == "OVERWRITE"


class _StubInception:
    """Cheap feature extractor standing in for InceptionV3 in tests."""

    def __init__(self, dim=16):
        self.dim = dim

    def __call__(self, x):
        import numpy as np

        x = np.asarray(x)
        n = x.shape[0]
        rng = np.random.default_rng(abs(int(x.sum() * 1000)) % (2 ** 31))
        feats = x.reshape(n, -1)[:, : self.dim].astype(np.float64)
        feats = feats + rng.normal(0, 1e-3, feats.shape)
        probs = np.full((n, 10), 0.1)
        return feats, probs


def test_evaluate_and_sign_flip_end_to_end(tmp_path, monkeypatch):
    """Train a tiny protected DCGAN, evaluate (stub inception), flip all
    signs, verify BER goes 0 -> ~1 through the owner pipeline."""
    from iprgan_tpu.experiments import get_experiment
    from iprgan_tpu.experiments.image_generation import ImageGeneration
    from iprgan_tpu.utils import checkpoint as ckpt
    from sign_flip import flip_signs

    monkeypatch.setattr(ImageGeneration, "_feature_fn",
                        lambda self: _StubInception())

    config = make_config(tmp_path, iteration=2, freq=2)
    exp = get_experiment(config.experiment)(config)
    exp.start()

    fpath = str(tmp_path / "metrics.json")
    metrics = exp.evaluate(fpath)
    entry = metrics["synthetic"]
    assert float(entry["WBOX"]) == 0.0
    assert "FID" in entry and "BBOX" in entry
    q_wm = float(entry["BBOX"]["Q_WM"])
    assert -1.0 <= q_wm <= 1.0

    # owner-side ambiguity attack: flip 100% of the norm-scale signs
    sd = ckpt.load(os.path.join(config.log.path, ckpt.CKPT_NAME))
    flip_signs(sd["G"], 100, np.random.default_rng(0))

    config2 = make_config(tmp_path, iteration=2, freq=2)
    config2.log.path = str(tmp_path / "log2")
    exp2 = get_experiment(config2.experiment)(config2)
    exp2.load_state_dict(sd, strict=True)
    ber = exp2.model.protection.ber(exp2.state, exp2.state["G"]["params"])
    assert ber == 1.0  # every sign disagrees -> ambiguity attack detected
