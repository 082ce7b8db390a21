"""Model registry (reference models/__init__.py)."""

import iprgan_tpu.networks  # noqa: F401  (populate NETWORKS registry)
from iprgan_tpu.registry import MODELS
from iprgan_tpu.models.dcgan import DCGAN  # noqa: F401
from iprgan_tpu.models.vae import VAE  # noqa: F401
from iprgan_tpu.models.srgan import SRGAN  # noqa: F401
from iprgan_tpu.models.cyclegan import CycleGAN  # noqa: F401

__all__ = ["MODELS", "DCGAN", "VAE", "SRGAN", "CycleGAN"]
