"""End-to-end removal attacks through the real attack.py main():
finetune and overwrite on a tiny protected DCGAN checkpoint."""

import argparse
import json
import os

import numpy as np
import pytest
import yaml

from iprgan_tpu.utils import checkpoint as ckpt
from tests.test_dcgan_train import make_config, make_watermark

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


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


def test_attack_finetune_resume(tmp_path, capsys):
    """A preempted attack run auto-resumes from the attack log dir's own
    rolling checkpoint instead of re-injecting the victim's weights
    (budget-scale attacks span host/segment boundaries)."""
    import re

    import attack
    from iprgan_tpu.experiments import get_experiment

    config = make_config(tmp_path, iteration=4, freq=2)
    exp = get_experiment(config.experiment)(config)
    exp.start()
    victim = ckpt.load(os.path.join(config.log.path, ckpt.CKPT_NAME))

    # simulate a preempted attack: set up the attack experiment exactly
    # as attack.main does (victim G injected, step 0), then checkpoint
    # at step 1 of the 2-step attack budget (iteration 4 // 2)
    alt = attack.update_finetune_config(config.copy(),
                                        load_discriminator=False)
    pre = get_experiment(alt.experiment)(alt)
    restored = {"step": 0}
    for key in victim:
        if re.match(r"G", key):
            restored[key] = victim[key]
    pre.load_state_dict(restored, strict=False)
    pre.save_checkpoint(1)

    args = argparse.Namespace(mode="finetune", load_discriminator=False,
                              watermark=None, log=config.log.path)
    attack.main(config.copy(), args)
    assert "Resuming attack from step 1" in capsys.readouterr().out

    # the resumed run completed the remaining budget and ran merge+eval
    ft_log = os.path.abspath(config.log.path) + "-ND-FT"
    assert ckpt.load(os.path.join(ft_log, ckpt.CKPT_NAME))["step"] == "END"
    metrics = json.load(open(os.path.join(config.log.path, "metrics.json")))
    assert "WBOX" in metrics["synthetic"]


def test_attack_preempted_defers_merge(tmp_path, monkeypatch):
    """If the attack run stops early on SIGTERM (start() returns False),
    the victim checkpoint must NOT be touched — merge+eval only happen
    once the attack reaches its full step budget."""
    import attack
    from iprgan_tpu.experiments import base as exp_base

    config = _train_victim(tmp_path)
    victim_path = os.path.join(config.log.path, ckpt.CKPT_NAME)
    before = open(victim_path, "rb").read()

    monkeypatch.setattr(exp_base.Experiment, "start",
                        lambda self: False)
    args = argparse.Namespace(mode="finetune", load_discriminator=False,
                              watermark=None, log=config.log.path)
    attack.main(config.copy(), args)

    assert open(victim_path, "rb").read() == before
    assert not os.path.exists(os.path.join(config.log.path, "metrics.json"))


# ---------------------------------------------------------------------------
# CycleGAN: the ^G / ^D regex surgery is most at risk on the multi-key
# schema (GA/GB/DA/DB/optG/optD/schG/schD/poolA/poolB) — reference
# attack.py:50-61 semantics.
# ---------------------------------------------------------------------------

def _train_cg_victim(tmp_path):
    from iprgan_tpu.experiments import get_experiment
    from tests.test_cyclegan_train import make_cg_config

    config = make_cg_config(tmp_path, epochs=2)
    exp = get_experiment(config.experiment)(config)
    exp.start()
    return config


def test_attack_restore_semantics_cyclegan(tmp_path):
    """The attack's key-filtered restore: GA+GB come from the victim,
    DA/DB stay fresh (no -d), pools/schedulers/optimizers reset."""
    import attack
    import jax
    import numpy as np
    from iprgan_tpu.experiments import get_experiment

    config = _train_cg_victim(tmp_path)
    victim = ckpt.load(os.path.join(config.log.path, ckpt.CKPT_NAME))
    assert {"GA", "GB", "DA", "DB", "optG", "optD", "schG", "schD",
            "poolA", "poolB", "fn_inp", "fn_out", "sign",
            "step"} <= set(victim)

    alt = attack.update_finetune_config(config.copy(),
                                        load_discriminator=False)
    exp = get_experiment(alt.experiment)(alt)
    restored = {"step": 0}
    import re
    for key in victim:
        if re.match(r"G", key):
            restored[key] = victim[key]
    exp.load_state_dict(restored, strict=False)

    state = jax.device_get(exp.state)
    for g in ("GA", "GB"):
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(state[g]["params"])[0]),
            np.asarray(jax.tree_util.tree_leaves(victim[g]["params"])[0]))
    # D fresh: victim trained DA differs from the attack's re-init
    assert not np.array_equal(
        np.asarray(jax.tree_util.tree_leaves(state["DA"]["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(victim["DA"]["params"])[0]))
    # pools and schedulers reset
    assert int(state["poolA"]["counts"]) == 0
    assert int(state["poolB"]["counts"]) == 0
    assert int(state["schG"]["last_epoch"]) == 0
    assert int(state["step"]) == 0


def test_attack_finetune_e2e_vae(tmp_path):
    """Finetune attack on VAE: the one family with a JOINT optimizer
    under the ``opt`` key (reference models/vae.py:25-32) — the ``^G``
    regex must restore G only, leaving D and the joint opt fresh."""
    import attack
    import jax
    from iprgan_tpu.experiments import get_experiment
    from tests.test_vae_train import make_vae_config

    config = make_vae_config(tmp_path)
    exp = get_experiment(config.experiment)(config)
    exp.start()
    victim = ckpt.load(os.path.join(config.log.path, ckpt.CKPT_NAME))
    assert {"G", "D", "opt", "fn_inp", "fn_out", "sign",
            "step"} <= set(victim)

    args = argparse.Namespace(mode="finetune", load_discriminator=False,
                              watermark=None, log=config.log.path)
    attack.main(config.copy(), args)

    ft_log = os.path.abspath(config.log.path) + "-ND-FT"
    assert os.path.exists(os.path.join(ft_log, "config.yaml"))
    # the attacked run continued from the victim's G (strict=False load
    # with only ^G keys): its saved G differs from the victim's after
    # finetuning, but the owner's eval ran on the attacked weights
    metrics = json.load(open(os.path.join(config.log.path, "metrics.json")))
    assert "WBOX" in metrics["synthetic"]
    ft_sd = ckpt.load(os.path.join(ft_log, ckpt.CKPT_NAME))
    assert "G" in ft_sd and "opt" in ft_sd


def test_attack_finetune_e2e_srgan(tmp_path):
    """Finetune attack on SRGAN — completes the attack-battery matrix
    over all four families. The attack config rewrite zeroes
    pretrain_iter (reference attack.py:106), so the attacked run goes
    straight to the GAN phase from the victim's G."""
    import attack
    from iprgan_tpu.experiments import get_experiment
    from tests.test_srgan_train import make_sr_config

    config = make_sr_config(tmp_path)
    exp = get_experiment(config.experiment)(config)
    exp.start()
    victim = ckpt.load(os.path.join(config.log.path, ckpt.CKPT_NAME))
    assert {"G", "D", "optG", "optD", "fn_inp", "fn_out", "sign",
            "step"} <= set(victim)

    args = argparse.Namespace(mode="finetune", load_discriminator=False,
                              watermark=None, log=config.log.path)
    attack.main(config.copy(), args)

    ft_log = os.path.abspath(config.log.path) + "-ND-FT"
    # the attack dir's config.yaml holds the OWNER's config with the
    # attack log path ("save old config to the log", reference
    # attack.py:77-82) — NOT the mutated attack config
    with open(os.path.join(ft_log, "config.yaml")) as f:
        ft_conf = yaml.safe_load(f)
    assert ft_conf["protection"] is not None
    assert ft_conf["hparam"]["pretrain_iter"] == 2  # owner's value
    assert ft_conf["log"]["path"] == ft_log
    # ...but the attacked RUN used pretrain 0 + iteration//2: its END
    # checkpoint resolves to 2 total steps
    ft_sd = ckpt.load(os.path.join(ft_log, ckpt.CKPT_NAME))
    assert ft_sd["step"] == "END"

    metrics = json.load(open(os.path.join(config.log.path, "metrics.json")))
    entry = metrics["sr_synthetic"]
    assert "WBOX" in entry and "BBOX" in entry and "PSNR" in entry


def test_attack_finetune_e2e_cyclegan(tmp_path):
    """Full finetune attack through attack.main on CycleGAN, ending in
    the owner's verification on the attacked weights."""
    import attack

    config = _train_cg_victim(tmp_path)
    args = argparse.Namespace(mode="finetune", load_discriminator=False,
                              watermark=None, log=config.log.path)
    attack.main(config.copy(), args)

    ft_log = os.path.abspath(config.log.path) + "-ND-FT"
    assert os.path.exists(os.path.join(ft_log, "config.yaml"))

    sd = ckpt.load(os.path.join(config.log.path, ckpt.CKPT_NAME))
    assert "GA" in sd and "GB" in sd and "sign" in sd

    metrics = json.load(open(os.path.join(config.log.path, "metrics.json")))
    entry = metrics["unaligned_synthetic"]
    assert "WBOX" in entry and "BBOX" in entry
