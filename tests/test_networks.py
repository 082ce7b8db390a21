"""Shape / parameter-count / numerics tests for the network zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iprgan_tpu import networks as N
from iprgan_tpu.nn import pixel_shuffle, spectral_sigma
from iprgan_tpu.nn.layers import InstanceNorm


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def test_conv_generator32_shape_and_params():
    net = N.NETWORKS("ConvGenerator32")()
    z = jnp.zeros((2, 128))
    variables = net.init(jax.random.PRNGKey(0), z, train=False)
    y = net.apply(variables, z, train=False)
    assert y.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0
    # torch reference: 3,811,904 params (fc + 3 ConvT/BN + head)
    assert n_params(variables["params"]) == 3_811_904


def test_conv_generator64_shape():
    net = N.NETWORKS("ConvGenerator64")()
    z = jnp.zeros((1, 128))
    variables = net.init(jax.random.PRNGKey(0), z, train=False)
    y = net.apply(variables, z, train=False)
    assert y.shape == (1, 64, 64, 3)


def test_sn_discriminator32_shape_and_params():
    net = N.NETWORKS("SNDiscriminator32")()
    x = jnp.zeros((2, 32, 32, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(variables, x)
    assert y.shape == (2,)
    assert n_params(variables["params"]) == 2_935_873
    # spectral state exists for every SN layer (7 convs + 1 dense)
    assert len(jax.tree_util.tree_leaves(variables["spectral"])) == 16


def test_sn_power_iteration_converges():
    key = jax.random.PRNGKey(0)
    mat = jax.random.normal(key, (16, 64))
    u = jnp.ones((16,)) / 4.0
    v = jnp.ones((64,)) / 8.0
    for _ in range(100):
        sigma, u, v = spectral_sigma(mat, u, v, update=True)
    top = np.linalg.svd(np.asarray(mat), compute_uv=False)[0]
    assert np.isclose(float(sigma), top, rtol=1e-4)


def test_sn_discriminator_updates_state():
    net = N.NETWORKS("SNDiscriminator32")()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    y1, mut = net.apply(variables, x, update_sn=True, mutable=["spectral"])
    u_old = variables["spectral"]["block0_a"]["u"]
    u_new = mut["spectral"]["block0_a"]["u"]
    assert not np.allclose(np.asarray(u_old), np.asarray(u_new))
    # eval does not mutate
    y2 = net.apply(variables, x, update_sn=False)
    assert y2.shape == (2,)


def test_vae_nets():
    enc = N.NETWORKS("Encoder32")()
    dec = N.NETWORKS("Decoder32")()
    x = jnp.zeros((2, 32, 32, 3))
    ev = enc.init({"params": jax.random.PRNGKey(0),
                   "reparam": jax.random.PRNGKey(1)}, x, train=False)
    (z, (mean, logvar)) = enc.apply(
        ev, x, train=False, rngs={"reparam": jax.random.PRNGKey(2)})
    assert z.shape == (2, 128) and mean.shape == (2, 128)
    assert n_params(ev["params"]) == 617_984

    dv = dec.init(jax.random.PRNGKey(0), z, train=False)
    y = dec.apply(dv, z, train=False)
    assert y.shape == (2, 32, 32, 3)
    assert float(jnp.min(y)) >= -1.0 and float(jnp.max(y)) <= 1.0
    assert n_params(dv["params"]) == 429_859


def test_sr_resnet_4x():
    net = N.NETWORKS("SRResNet")()
    x = jnp.zeros((1, 24, 24, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    y = net.apply(variables, x, train=False)
    assert y.shape == (1, 96, 96, 3)


def test_discriminator96():
    net = N.NETWORKS("Discriminator96")()
    x = jnp.zeros((2, 96, 96, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    y = net.apply(variables, x, train=False)
    assert y.shape == (2,)


def test_resnet_generator_and_patchgan():
    g = N.NETWORKS("Resnet9Blocks")()
    x = jnp.zeros((1, 64, 64, 3))
    gv = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(gv, x)
    assert y.shape == (1, 64, 64, 3)
    # 9 res blocks present
    assert "res08" in gv["params"] and "res09" not in gv["params"]

    d = N.NETWORKS("ConvDiscriminator")()
    dv = d.init(jax.random.PRNGKey(0), y)
    logits = d.apply(dv, y)
    # 64 -> 32 -> 16 -> 8 -> 7 -> 6 patch map
    assert logits.shape == (1, 6, 6, 1)
    # non-affine InstanceNorm has no params
    assert "norm1" not in dv["params"]


def test_vgg19_feature_shapes():
    net = N.NETWORKS("VGG19Feature")()
    x = jnp.zeros((1, 96, 96, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(variables, x)
    assert y.shape == (1, 6, 6, 512)  # relu5_4: 4 pools, 512ch
    # VGG19 has 16 convs; truncation at relu5_4 keeps all 16
    assert len(variables["params"]) == 16


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.rand(2, 4, 4, 16).astype(np.float32)
    ours = pixel_shuffle(jnp.asarray(x), 2)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.pixel_shuffle(xt, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6)


def test_instance_norm_numerics():
    x = np.random.rand(2, 8, 8, 4).astype(np.float32) * 3 + 1
    mod = InstanceNorm(affine=False)
    y = mod.apply({"params": {}}, jnp.asarray(x))
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=(1, 2)), 0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=(1, 2)), 1, atol=1e-3)
