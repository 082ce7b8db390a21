#!/usr/bin/env python
"""Ambiguity-attack CLI: random sign flips (reference sign_flip.py).

For percent in 10..100 step 10: reload the checkpoint, count all
norm-layer scale parameters of each ^G module, randomly flip that
percentage of their signs in place, evaluate -> log/sign/{pct}.json.
Layer traversal order is the canonical sorted-path order shared with the
sign-loss machinery (iprgan_tpu/protection/sign.py).
"""

import argparse
import os
import random
import re
import tempfile

import numpy as np

from iprgan_tpu.config import Config
from iprgan_tpu.protection.sign import iter_norm_scale_paths


def flip_signs(module_sd: dict, percent: float, rng: np.random.Generator):
    """Flip percent% of norm-scale signs in a module's serialized params."""
    params = module_sd["params"]
    paths = iter_norm_scale_paths(params)
    sizes = []
    for p in paths:
        node = params
        for k in p:
            node = node[k]
        sizes.append(int(np.asarray(node).shape[0]))
    nparams = sum(sizes)
    nflip = int(nparams * percent / 100)
    flip_mask = np.ones(nparams, np.float32)
    flip_mask[rng.permutation(nparams)[:nflip]] = -1.0

    offset = 0
    for p, n in zip(paths, sizes):
        node = params
        for k in p[:-1]:
            node = node[k]
        arr = np.asarray(node[p[-1]])
        node[p[-1]] = (arr * flip_mask[offset:offset + n]).astype(arr.dtype)
        offset += n
    return nparams, nflip


def main(config, args):
    import jax

    if not config.resource.gpu:
        # reference hides CUDA devices for --cpu (sign_flip.py:27-28);
        # the jax equivalent is pinning the cpu platform
        jax.config.update("jax_platforms", "cpu")

    from iprgan_tpu.experiments import get_experiment
    from iprgan_tpu.utils import checkpoint as ckpt

    with tempfile.TemporaryDirectory() as tmp_dir:
        log = config.log.path
        os.makedirs(os.path.join(log, "sign"), exist_ok=True)
        config.log.path = tmp_dir

        base_sample_dir = config.get("sample_dir", None)
        rng = np.random.default_rng(config.seed)

        for percent in range(10, 101, 10):
            exp_state_dict = ckpt.load(os.path.join(log, ckpt.CKPT_NAME))
            keys_g = [k for k in exp_state_dict if re.match(r"G", k)]

            fpath = os.path.join(log, "sign", f"{percent:02d}.json")

            for key in keys_g:
                flip_signs(exp_state_dict[key], percent, rng)

            if os.path.exists(fpath):
                # resumable sweep: a pct whose JSON already exists is
                # done — but flip_signs above must still run so the
                # sequential rng stream stays identical for the
                # remaining percents
                print(f"SIGN-{percent}: {fpath} exists, skipping")
                continue

            # fresh config per pct: experiment constructors rescale
            # hparam in place (epoch->step conversion, weak scaling),
            # so reusing one object compounds the rescale every pct
            cfg = config.copy()
            if base_sample_dir:
                cfg.sample_dir = os.path.join(base_sample_dir,
                                              f"{percent:02d}")
                os.makedirs(cfg.sample_dir, exist_ok=True)

            cfg.attack_mode = f"SIGN-{percent}"
            experiment = get_experiment(cfg.experiment)(cfg)
            experiment.load_state_dict(exp_state_dict, strict=True)
            experiment.evaluate(fpath)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="IPR-GAN ambiguity attack")
    parser.add_argument("-l", "--log", required=True, metavar="PATH")
    parser.add_argument("-s", "--sample", default=None, metavar="PATH")
    parser.add_argument("--cpu", action="store_true", default=False)
    args = parser.parse_args()

    config_fpath = os.path.join(args.log, "config.yaml")
    assert os.path.exists(config_fpath), f"Invalid experiment log: {args.log}"
    config = Config.parse(config_fpath)
    config.resource.gpu = not args.cpu

    if args.sample:
        config.sample_dir = os.path.join(
            args.sample,
            os.path.basename(os.path.normpath(config.log.path)) + "-SIGN")
        os.makedirs(config.sample_dir, exist_ok=True)

    random.seed(config.seed)
    np.random.seed(config.seed)

    main(config, args)
