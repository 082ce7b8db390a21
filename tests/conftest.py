"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX idiom for exercising distributed (data-parallel) code
without real multi-chip hardware — the same sharded programs then run
unchanged on a TPU pod slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
