"""Pallas fused normalize+paste kernel vs the jnp reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iprgan_tpu.ops.pallas_kernels import (
    fused_normalize_paste,
    normalize_paste_reference,
)


@pytest.mark.parametrize("position", ["tl", "br"])
@pytest.mark.parametrize("normalized", [True, False])
def test_fused_normalize_paste_matches_reference(position, normalized):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8))
    fg = jnp.asarray(rng.uniform(0, 1, (4, 4, 3)), jnp.float32)
    bg = jnp.asarray((rng.uniform(0, 1, (4, 4, 1)) > 0.5), jnp.float32)

    out = fused_normalize_paste(x, fg, bg, position=position,
                                normalized=normalized)
    ref = normalize_paste_reference(x, fg, bg, position=position,
                                    normalized=normalized)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)
    assert out.dtype == jnp.float32
