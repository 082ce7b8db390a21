#!/usr/bin/env python
"""Pruning-attack CLI (reference prune.py).

For percent in 10..90 step 10: reload the checkpoint, compute the global
magnitude percentile over every tensor of each ^G module, zero weights
below the threshold, evaluate -> log/prune/{pct}.json.
"""

import argparse
import os
import random
import re
import tempfile

import numpy as np

from iprgan_tpu.config import Config


def _leaves(tree):
    """Flat list of (container, key) for every array leaf in a nested
    dict — the serialized checkpoint form."""
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            if isinstance(v, np.ndarray) and np.issubdtype(
                    v.dtype, np.floating):
                out.append((tree, k))
            else:
                out += _leaves(v)
    return out


def prune_module(module_sd, percent: float):
    """Zero all weights with |w| below the module-global percentile
    (reference prune.py:41-57 — the threshold pools every tensor of the
    module's state dict, running stats included)."""
    leaves = _leaves(module_sd)
    flat = np.concatenate(
        [np.abs(np.asarray(c[k], np.float64)).ravel() for c, k in leaves])
    threshold = np.percentile(flat, percent)
    for c, k in leaves:
        arr = np.asarray(c[k])
        c[k] = np.where(np.abs(arr) < threshold, 0, arr).astype(arr.dtype)
    return module_sd


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
        os.makedirs(os.path.join(log, "prune"), exist_ok=True)
        config.log.path = tmp_dir

        base_sample_dir = config.get("sample_dir", None)

        for percent in range(10, 100, 10):
            fpath = os.path.join(log, "prune", f"{percent:02d}.json")
            if os.path.exists(fpath):
                # resumable sweep: budget-scale evals can straddle a
                # host/segment boundary — a pct whose JSON already
                # exists is done (pruning is deterministic per pct)
                print(f"PRUNE-{percent}: {fpath} exists, skipping")
                continue
            exp_state_dict = ckpt.load(os.path.join(log, ckpt.CKPT_NAME))
            keys_g = [k for k in exp_state_dict if re.match(r"G", k)]
            for key in keys_g:
                prune_module(exp_state_dict[key], percent)

            # fresh config per pct: experiment constructors rescale
            # hparam in place (epoch->step conversion, weak scaling),
            # so reusing one object compounds the rescale every pct
            cfg = config.copy()
            if base_sample_dir:
                cfg.sample_dir = os.path.join(base_sample_dir,
                                              f"{percent:02d}")
                os.makedirs(cfg.sample_dir, exist_ok=True)

            cfg.attack_mode = f"PRUNE-{percent}"
            experiment = get_experiment(cfg.experiment)(cfg)
            experiment.load_state_dict(exp_state_dict, strict=True)
            experiment.evaluate(fpath)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="IPR-GAN pruning attack")
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
            os.path.basename(os.path.normpath(config.log.path)) + "-PRUNE")
        os.makedirs(config.sample_dir, exist_ok=True)

    random.seed(config.seed)
    np.random.seed(config.seed)

    main(config, args)
