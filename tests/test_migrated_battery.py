"""Attack battery on a MIGRATED CycleGAN checkpoint.

The converter's hardest case (scripts/convert_reference_checkpoint.py):
GB carries the sign target, per-layer sign re-keying crosses the
document-order vs sorted-path mismatch, pools are variable-length NCHW
buffers, and fn_inp/fn_out are noise/watermark corner pastes. This test
builds a synthetic reference-layout torch ``checkpoint.pt`` dict
(DataParallel ``module.`` prefixes, reference networks/resnet_generator
+ conv_discriminator key layouts), converts it, and runs the REAL
ownership-verification battery on the result:

* white-box: BER == 0 straight off the conversion;
* ``sign_flip.main`` sweep: flipping p% of norm-scale signs yields
  BER == p/100 on the migrated weights (the ambiguity-attack curve,
  reference sign_flip.py);
* ``attack.main`` finetune: the ^G regex surgery restores the migrated
  GA/GB into a fresh attack run, trains, and the owner's evaluation
  runs on the attacked weights.
"""

import argparse
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from iprgan_tpu.protection.sign import compute_ber  # noqa: E402
from iprgan_tpu.utils import checkpoint as ckpt  # noqa: E402

from scripts.convert_reference_checkpoint import convert  # noqa: E402
from tests.test_cyclegan_train import make_cg_config  # noqa: E402
from tests.test_reference_checkpoint import (  # noqa: E402
    _embed_reference_signs,
    np_sd,
    randomize,
    t_conv_discriminator,
    t_resnet_generator,
)

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def _module_sd(net):
    return {f"module.{k}": v for k, v in np_sd(net).items()}


def _make_torch_cyclegan_ckpt(crop: int, step):
    """Reference-layout CycleGAN checkpoint.pt dict (all four nets,
    pools with partial fill, paste-transform buffers, GB signs)."""
    ga = randomize(t_resnet_generator(n_block=6), seed=30)
    gb = randomize(t_resnet_generator(n_block=6), seed=31)
    da = randomize(t_conv_discriminator(), seed=32)
    db = randomize(t_conv_discriminator(), seed=33)
    sign_sd = _embed_reference_signs(gb)

    rng = np.random.default_rng(34)
    paste = lambda s: {  # noqa: E731
        "module.fg": rng.uniform(-1, 1, (1, 3, s, s)).astype(np.float32),
        "module.bg": np.zeros((1, 1, s, s), np.float32)}
    pool = lambda n: {  # noqa: E731
        "images": rng.uniform(-1, 1, (n, 3, crop, crop)).astype(np.float32),
        "counts": float(n)}
    return {
        "GA": _module_sd(ga), "GB": _module_sd(gb),
        "DA": _module_sd(da), "DB": _module_sd(db),
        "optG": {"state": {}}, "optD": {"state": {}},
        "schG": {"last_epoch": 1}, "schD": {"last_epoch": 1},
        "poolA": pool(3), "poolB": pool(2),
        "fn_inp": paste(32), "fn_out": paste(32),
        "sign": sign_sd,
        "step": step,
    }, gb


def _migrate(tmp_path, step="END"):
    """Convert a synthetic torch CycleGAN checkpoint into a ready-to-use
    log dir (checkpoint.msgpack + config.yaml), as the converter CLI
    does (convert_reference_checkpoint.main)."""
    config = make_cg_config(tmp_path, epochs=2)
    torch_ckpt, gb = _make_torch_cyclegan_ckpt(
        crop=config.dataset.crop, step=step)
    sd = convert(config, torch_ckpt)
    os.makedirs(config.log.path, exist_ok=True)
    ckpt.save(os.path.join(config.log.path, ckpt.CKPT_NAME), sd)
    with open(os.path.join(config.log.path, "config.yaml"), "w") as f:
        f.write(config.to_yaml())
    return config, sd, gb


def test_migrated_cyclegan_converts_verified(tmp_path):
    config, sd, gb = _migrate(tmp_path)

    # schema: full reference CycleGAN key contract
    assert {"GA", "GB", "DA", "DB", "optG", "optD", "schG", "schD",
            "poolA", "poolB", "fn_inp", "fn_out", "sign",
            "step"} <= set(sd)
    # white-box verifies on the migrated weights, per-layer re-keying
    assert float(compute_ber(sd["GB"]["params"], sd["sign"])) == 0.0
    # pools: partial fill carried over into the fixed-shape NHWC buffer
    assert int(sd["poolA"]["counts"]) == 3
    assert sd["poolA"]["images"].shape == (4, 64, 64, 3)
    np.testing.assert_allclose(
        sd["poolA"]["images"][3], np.zeros((64, 64, 3)), atol=0)

    # forward parity: generate() through the migrated state equals the
    # torch GB forward (the B->A protected generator)
    import jax
    from flax import serialization
    from scripts.convert_reference_checkpoint import build_model

    model = build_model(config.copy())
    template = serialization.to_state_dict(jax.device_get(
        model.init_state(jax.random.PRNGKey(config.seed))))
    x = np.random.default_rng(35).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32)
    gb.eval()
    ref = gb(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    gvars = serialization.from_state_dict(template["GB"], sd["GB"])
    y = model.generate({"GB": gvars}, x)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               atol=5e-4, rtol=1e-3)


def test_migrated_cyclegan_sign_flip_battery(tmp_path):
    import sign_flip

    config, _, _ = _migrate(tmp_path)
    args = argparse.Namespace(log=config.log.path, sample=None, cpu=False)
    sign_flip.main(config.copy(), args)

    sign_dir = os.path.join(config.log.path, "sign")
    # the translation eval also dumps SIGN-<pct>/ PNG dirs next to the
    # sweep JSONs (evaluate's attack_mode dirname) — compare JSONs only
    files = {f for f in os.listdir(sign_dir) if f.endswith(".json")}
    assert files == {f"{p:02d}.json" for p in
                     list(range(10, 100, 10)) + [100]}
    # flipping p% of ^G norm-scale signs yields BER == p/100 exactly
    # (count-exact flips) against the migrated signature
    for pct in (10, 50, 100):
        m = json.load(open(os.path.join(sign_dir, f"{pct:02d}.json")))
        ber = float(m["unaligned_synthetic"]["WBOX"])
        assert abs(ber - pct / 100.0) < 0.02, (pct, ber)


def test_migrated_cyclegan_finetune_attack(tmp_path):
    import attack

    config, sd, _ = _migrate(tmp_path)
    args = argparse.Namespace(mode="finetune", load_discriminator=False,
                              watermark=None, log=config.log.path)
    attack.main(config.copy(), args)

    ft_log = os.path.abspath(config.log.path) + "-ND-FT"
    assert os.path.exists(os.path.join(ft_log, "config.yaml"))
    ft_sd = ckpt.load(os.path.join(ft_log, ckpt.CKPT_NAME))
    assert ft_sd["step"] == "END"

    # the attacked run STARTED from the migrated GA/GB (finetune restores
    # ^G keys) — after a short finetune the signature still verifies
    # (the paper's robustness-to-finetuning claim at tiny budgets)
    ber = float(compute_ber(ft_sd["GB"]["params"], sd["sign"]))
    assert ber < 0.05, ber

    # owner's verification ran on the attacked weights
    metrics = json.load(open(os.path.join(config.log.path, "metrics.json")))
    entry = metrics["unaligned_synthetic"]
    assert "WBOX" in entry and "BBOX" in entry
