#!/usr/bin/env python
"""IPR-GAN evaluation CLI (reference eval.py).

Usage: python eval.py -l log/DCGAN-COMP-CIFAR10-A [-s samples/] [--cpu]

Loads config.yaml + checkpoint from a log directory, evaluates, and
writes metrics.json back into the log dir. Uses a temp log path so no new
event files pollute the original run.
"""

import argparse
import os
import random
import tempfile

import numpy as np

from iprgan_tpu.config import Config


def main(config, log):
    import jax

    if not config.resource.gpu:
        jax.config.update("jax_platforms", "cpu")

    from iprgan_tpu.experiments import get_experiment
    from iprgan_tpu.utils import checkpoint as ckpt

    with tempfile.TemporaryDirectory() as tmp_dir:
        config.log.path = tmp_dir
        sd = ckpt.load(os.path.join(log, ckpt.CKPT_NAME))
        experiment = get_experiment(config.experiment)(config)
        experiment.load_state_dict(sd, strict=True)
        fpath = os.path.join(log, "metrics.json")
        experiment.evaluate(fpath)
        print(f"Result saved to: {fpath}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="IPR-GAN evaluation script")
    parser.add_argument("-l", "--log", required=True, metavar="PATH",
                        help="Path to experiment log directory")
    parser.add_argument("-s", "--sample", default=None, metavar="PATH",
                        help="Save sample images to PATH/ if provided")
    parser.add_argument("--cpu", action="store_true", default=False,
                        help="Run on CPU")
    args = parser.parse_args()

    config_fpath = os.path.join(args.log, "config.yaml")
    assert os.path.exists(config_fpath), f"Invalid experiment log: {args.log}"
    config = Config.parse(config_fpath)
    config.resource.gpu = not args.cpu

    if args.sample:
        config.sample_dir = os.path.join(
            args.sample, os.path.basename(os.path.normpath(config.log.path)))
        os.makedirs(config.sample_dir, exist_ok=True)

    random.seed(config.seed)
    np.random.seed(config.seed)

    main(config, args.log)
