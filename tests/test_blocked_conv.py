"""Space-to-depth blocked conv == plain SAME conv (ops/blocked_conv.py).

Fast tier: tiny shapes on CPU. The blocked path is a pure layout
transform of the SRResNet tail conv (3 output channels -> 3/128 MXU
lane occupancy), so exact-tap equality with lax's SAME convolution is
the whole contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iprgan_tpu.ops.blocked_conv import blocked_conv_s2d


def _plain(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


@pytest.mark.parametrize("k,block,h,w_", [
    (9, 4, 8, 8),     # the SRResNet tail geometry (k=9, B=4)
    (9, 4, 16, 8),
    (9, 2, 8, 6),
    (3, 4, 8, 8),     # kernel smaller than the block
    (5, 4, 12, 8),
    (7, 2, 6, 10),
])
def test_matches_plain_same_conv(rng, k, block, h, w_):
    x = jnp.asarray(rng.normal(size=(2, h, w_, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, 5, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    got = blocked_conv_s2d(x, w, b, block=block)
    want = _plain(x, w, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(9, 9, 4, 3)), jnp.float32)

    g1 = jax.grad(lambda w: jnp.sum(blocked_conv_s2d(x, w, block=4) ** 2))(w)
    g2 = jax.grad(lambda w: jnp.sum(_plain(x, w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)

    gx1 = jax.grad(lambda x: jnp.sum(blocked_conv_s2d(x, w, block=4)))(x)
    gx2 = jax.grad(lambda x: jnp.sum(_plain(x, w)))(x)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-4, rtol=1e-4)


def test_rejects_nondivisible():
    x = jnp.zeros((1, 10, 8, 4))
    w = jnp.zeros((9, 9, 4, 3))
    with pytest.raises(AssertionError):
        blocked_conv_s2d(x, w, block=4)


def test_convgenerator_head_paths_identical(rng):
    """ConvGenerator(head_s2d=True) — the DCGAN 64->3 head computed
    space-to-depth blocked: same param tree, bit-identical init (scope
    twin head/convt/kernel), same output up to fp reordering. (A
    stride-1 k3 p1 ConvTranspose is a SAME conv with the kernel as-is —
    flax conv_transpose does not mirror the kernel.)"""
    from iprgan_tpu.networks.conv_generator import ConvGenerator

    z = jnp.asarray(rng.normal(size=(3, 128)), jnp.float32)
    fast = ConvGenerator(mg=4, head_s2d=True)
    slow = ConvGenerator(mg=4, head_s2d=False)
    vf = fast.init(jax.random.PRNGKey(5), z)
    vs = slow.init(jax.random.PRNGKey(5), z)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), vf, vs)
    yf, _ = fast.apply(vf, z, mutable=["batch_stats"])
    ys, _ = slow.apply(vs, z, mutable=["batch_stats"])
    assert yf.shape == ys.shape == (3, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               atol=2e-5, rtol=1e-5)


def test_srresnet_tail_paths_identical(rng):
    """SRResNet(tail_s2d=True) is the shipped default: same param tree,
    bit-identical init (same scope path -> same RNG folds), same output
    up to fp reordering as the plain-conv tail."""
    from iprgan_tpu.networks.sr_resnet import SRResNet

    lr = jnp.asarray(rng.uniform(size=(2, 6, 6, 3)), jnp.float32)
    fast = SRResNet(n_block=2, tail_s2d=True)
    slow = SRResNet(n_block=2, tail_s2d=False)
    vf = fast.init(jax.random.PRNGKey(3), lr, train=False)
    vs = slow.init(jax.random.PRNGKey(3), lr, train=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), vf, vs)
    yf = fast.apply(vf, lr, train=False)
    ys = slow.apply(vs, lr, train=False)
    assert yf.shape == ys.shape == (2, 24, 24, 3)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               atol=2e-5, rtol=1e-5)
