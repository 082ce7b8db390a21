#!/usr/bin/env python
"""Removal-attack CLI: finetune / overwrite (reference attack.py).

finetune: drop all protection, lr x 0.1, pretrain_iter = 0, iterations/2,
retrain from the victim's generator (optionally discriminator) weights.

overwrite: keep black-box protection but point fn_out at the attacker's
watermark and reset the input trigger; drop white-box; same lr/iteration
changes. After the attack run, the attacker's fn_inp/fn_out are merged
into the victim checkpoint under ``fn_*_ov`` keys and the ORIGINAL config
(the owner's verification pipeline) is evaluated on the attacked weights.

Unlike the reference, attack runs are preemption-safe: the underlying
experiment driver checkpoints into the attack log dir on SIGTERM, and
rerunning the same attack command auto-resumes from that rolling
checkpoint instead of re-injecting the victim's weights — budget-scale
attacks (100k+ steps) survive host/segment boundaries. The merge+eval
stage only runs once the attack reaches its full step budget.
"""

import argparse
import copy
import os
import random
import re
import tempfile

import numpy as np

from iprgan_tpu.config import Config


def update_finetune_config(config, load_discriminator):
    alt = config.copy()
    alt.protection = None
    alt.model.opt_param.lr *= 0.1
    if "pretrain_iter" in alt.hparam.keys():
        alt.hparam.pretrain_iter = 0
    alt.hparam.iteration //= 2
    postfix = ("-D" if load_discriminator else "-ND") + "-FT"
    alt.log.path = os.path.abspath(alt.log.path) + postfix
    alt.attack_mode = "FINETUNE"
    return alt


def update_overwrite_config(config, load_discriminator, watermark):
    alt = config.copy()
    assert alt.get("protection") and alt.protection.get("bbox"), \
        "Experiment not supported, no black-box protection found"
    assert watermark, "please specify --watermark <PATH>"
    alt.protection.bbox.fn_out.watermark = watermark
    alt.protection.wbox = None
    alt.model.opt_param.lr *= 0.1
    if "pretrain_iter" in alt.hparam.keys():
        alt.hparam.pretrain_iter = 0
    alt.hparam.iteration //= 2
    postfix = ("-D" if load_discriminator else "-ND") + "-OV"
    alt.log.path = os.path.abspath(alt.log.path) + postfix
    alt.attack_mode = "OVERWRITE"
    return alt


def main(config, args):
    import jax

    from iprgan_tpu.experiments import get_experiment
    from iprgan_tpu.utils import checkpoint as ckpt

    Experiment = get_experiment(config.experiment)

    alt_config = {
        "finetune": lambda c: update_finetune_config(
            c, args.load_discriminator),
        "overwrite": lambda c: update_overwrite_config(
            c, args.load_discriminator, args.watermark),
    }[args.mode](config)

    exp_state_dict = ckpt.load(
        os.path.join(config.log.path, ckpt.CKPT_NAME))
    keys_g = [k for k in exp_state_dict if re.match(r"G", k)]
    keys_d = [k for k in exp_state_dict if re.match(r"D", k)]

    attack_experiment = Experiment(alt_config)
    attack_ckpt = os.path.join(alt_config.log.path, ckpt.CKPT_NAME)
    if os.path.exists(attack_ckpt):
        # Auto-resume a preempted attack run: the attack log dir's own
        # rolling checkpoint carries the attacker's weights, optimizer
        # state and step counter — re-injecting the victim's weights
        # here would silently restart the attack from scratch.
        attack_sd = ckpt.load(attack_ckpt)
        attack_experiment.load_state_dict(attack_sd, strict=False)
        print(f"Resuming attack from step {attack_sd.get('step')} "
              f"({attack_ckpt})")
    else:
        state_dict = {"step": 0}
        for key in keys_g:
            state_dict[key] = exp_state_dict[key]
        if args.load_discriminator:
            for key in keys_d:
                state_dict[key] = exp_state_dict[key]
        attack_experiment.load_state_dict(state_dict, strict=False)

        if args.mode == "overwrite":
            # fresh attacker trigger (reference attack.py:66-67)
            new_state = dict(attack_experiment.state)
            new_state["fn_inp"] = \
                attack_experiment.model.protection.fn_inp.reset(
                    jax.random.PRNGKey(config.seed + 1))
            attack_experiment.state = attack_experiment.pctx.replicate(
                new_state)

    if not attack_experiment.start():
        print("attack preempted before reaching its step budget; rerun "
              "the same attack command to resume — merge+eval deferred")
        return

    for k, v in attack_experiment.state_dict().items():
        if k == "step":  # keep the victim's step counter
            continue
        if k.startswith("fn_"):
            k = k + "_ov"
        exp_state_dict[k] = v

    # save the owner's config into the attack log dir
    orig_log = config.log.path
    config.log.path = alt_config.log.path
    with open(os.path.join(alt_config.log.path, "config.yaml"), "w") as f:
        f.write(config.to_yaml())
    config.log.path = orig_log

    with tempfile.TemporaryDirectory() as tmp_dir:
        log = config.log.path
        config.log.path = tmp_dir

        ckpt.save(os.path.join(log, ckpt.CKPT_NAME), exp_state_dict)
        fpath = os.path.join(log, "metrics.json")

        eval_experiment = Experiment(config)
        eval_experiment.load_state_dict(exp_state_dict, strict=True)
        eval_experiment.evaluate(fpath)
        print(f"Result saved to: {fpath}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="IPR-GAN attack script")
    parser.add_argument("-l", "--log", required=True, metavar="PATH")
    parser.add_argument("-m", "--mode", required=True,
                        choices=["finetune", "overwrite"])
    parser.add_argument("-w", "--watermark", metavar="PATH",
                        help="Path to new watermark (overwrite mode)")
    parser.add_argument("-d", "--load-discriminator", action="store_true",
                        default=False)
    args = parser.parse_args()

    config_fpath = os.path.join(args.log, "config.yaml")
    assert os.path.exists(config_fpath), f"Invalid experiment log: {args.log}"
    config = Config.parse(config_fpath)

    random.seed(config.seed)
    np.random.seed(config.seed)

    main(config, args)
