"""ipr-gan-tpu: TPU-native (JAX/XLA/Pallas) framework for protecting the
intellectual property of GANs against ambiguity attacks (CVPR 2021).

A from-scratch rebuild of the capabilities of `dingsheng-ong/ipr-gan`
(reference layout documented in /root/repo/SURVEY.md), designed TPU-first:

* every model family (DCGAN / VAE / SRGAN / CycleGAN) is a pure
  ``train_step(state, batch, rng) -> (state, metrics)`` compiled with
  ``jax.jit`` over a data-parallel ``jax.sharding.Mesh``;
* black-box (trigger watermark) and white-box (normalization sign
  signature) protection are loss terms composed into the same compiled
  step rather than runtime object wrappers;
* all state (params, optimizer moments, BN stats, spectral-norm power
  iteration vectors, image pools, trigger buffers, sign buffers) lives in
  one checkpointable pytree whose top-level key schema matches the
  reference checkpoints (``G``/``D``/``optG``/``optD``/``fn_inp``/
  ``fn_out``/``sign``/...), so the attack tooling (finetune / overwrite /
  prune / sign-flip) can do the same key surgery.
"""

__version__ = "0.1.0"

from iprgan_tpu.config import Config  # noqa: F401
