#!/usr/bin/env python
"""IPR-GAN training CLI (reference train.py).

Usage: python train.py -c configs/DCGAN/complete/dcgan-cifar10-a.yaml

Parses the YAML config, seeds all RNG, instantiates the experiment by
name, auto-resumes from <log.path>/checkpoint.msgpack if present, trains,
then evaluates into metrics.json.
"""

import argparse
import os
import random

import numpy as np

from iprgan_tpu.config import Config


def main(config):
    import jax

    if not config.resource.gpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("IPRGAN_JAX_CACHE", "/tmp/iprgan_jax_cache"))

    from iprgan_tpu.experiments import get_experiment
    from iprgan_tpu.utils import checkpoint as ckpt

    experiment = get_experiment(config.experiment)(config)

    ckpt_path = os.path.join(config.log.path, ckpt.CKPT_NAME)
    if os.path.exists(ckpt_path):
        print("*** LOAD CHECKPOINT ***")
        experiment.load_state_dict(ckpt.load(ckpt_path))
        print(f"From Step: {experiment.init_step}\n")

    if not experiment.start():
        # preempted (SIGTERM): checkpoint is on disk; skip evaluation —
        # the resumed run evaluates once it reaches the full budget
        return

    fpath = os.path.join(config.log.path, "metrics.json")
    experiment.evaluate(fpath)
    print(f"Result saved to: {fpath}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="IPR-GAN training script")
    parser.add_argument("-c", "--config", required=True, metavar="PATH",
                        help="Path to YAML config file")
    args = parser.parse_args()
    config = Config.parse(args.config)

    random.seed(config.seed)
    np.random.seed(config.seed)

    main(config)
