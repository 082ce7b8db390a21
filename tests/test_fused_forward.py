"""Fused multi-forward equivalence.

The train steps batch what the reference runs as separate generator /
discriminator calls (models/wrappers.py:115-125 runs the trigger branch
as its own G forward; models/cyclegan.py runs six generator calls):

* DCGAN / VAE: ONE vmapped G forward over the two latent groups
  [z; fn_inp(z)] — vmap keeps batch statistics per-group, so it must be
  numerically identical to two sequential applies, including the
  group-0 batch_stats mutation (models/dcgan.py, models/vae.py);
* CycleGAN: independent applies of the same per-sample net (conv +
  InstanceNorm) concatenated into one batched call
  (models/cyclegan.py g_loss / d_loss).

These tests pin the equivalences the fusions rely on.
"""

import jax
import jax.numpy as jnp
import numpy as np

import iprgan_tpu.networks  # noqa: F401  (populates the registry)
from iprgan_tpu.registry import NETWORKS


def test_vmap_two_group_equals_sequential_bn():
    """ConvGenerator32 (BatchNorm): vmapped [z; zwm] forward == two
    sequential train-mode applies; group-0 mutation == plain-z mutation."""
    G = NETWORKS("ConvGenerator32")()
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 128))
    zwm = jax.random.normal(jax.random.PRNGKey(2), (8, 128))
    gvars = G.init(jax.random.PRNGKey(0), z, train=False)

    def one(zi):
        return G.apply(gvars, zi, train=True, mutable=["batch_stats"])

    y0, m0 = jax.jit(one)(z)
    y1, _ = jax.jit(one)(zwm)
    both, muts = jax.jit(jax.vmap(one))(jnp.stack([z, zwm]))

    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(y0),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(both[1]), np.asarray(y1),
                               rtol=0, atol=1e-5)
    for (p0, a), (p1, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(m0["batch_stats"]),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(
                jax.tree.map(lambda x: x[0], muts["batch_stats"])),
                   key=lambda t: str(t[0]))):
        assert str(p0) == str(p1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6, err_msg=str(p0))


def test_vmap_two_group_equals_sequential_decoder():
    """Decoder32 (the VAE generator) under the same vmap fusion."""
    G = NETWORKS("Decoder32")()
    z = jax.random.normal(jax.random.PRNGKey(3), (8, 128))
    zwm = z * 0.5 + 1.0
    gvars = G.init(jax.random.PRNGKey(0), z, train=False)

    def one(zi):
        return G.apply(gvars, zi, train=True, mutable=["batch_stats"])[0]

    y0, y1 = jax.jit(one)(z), jax.jit(one)(zwm)
    both = jax.jit(jax.vmap(one))(jnp.stack([z, zwm]))
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(y0),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(both[1]), np.asarray(y1),
                               rtol=0, atol=1e-5)


def test_concat_batch_equals_separate_per_sample_nets():
    """ResnetGenerator / ConvDiscriminator are per-sample (conv +
    InstanceNorm): one concatenated call == separate applies."""
    for name, shape in (("Resnet6Blocks", (2, 32, 32, 3)),
                        ("ConvDiscriminator", (2, 32, 32, 3))):
        net = NETWORKS(name)()
        a = jax.random.uniform(jax.random.PRNGKey(4), shape) * 2 - 1
        b = jax.random.uniform(jax.random.PRNGKey(5), shape) * 2 - 1
        nvars = net.init(jax.random.PRNGKey(0), a)
        one = jax.jit(lambda x: net.apply(nvars, x))
        ya, yb = one(a), one(b)
        yab = jax.jit(lambda x: net.apply(nvars, x))(
            jnp.concatenate([a, b], axis=0))
        np.testing.assert_allclose(np.asarray(yab[:2]), np.asarray(ya),
                                   rtol=0, atol=1e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(yab[2:]), np.asarray(yb),
                                   rtol=0, atol=1e-5, err_msg=name)
