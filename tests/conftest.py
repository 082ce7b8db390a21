"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX idiom for exercising distributed (data-parallel) code
without real multi-chip hardware — the same sharded programs then run
unchanged on a TPU pod slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force off any TPU/axon platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported (and JAX_PLATFORMS captured) by the
# environment's sitecustomize, so set the config knob directly too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
