"""TPU-native module layer (flax.linen, NHWC).

Re-implements the primitives the reference gets from torch.nn with
TPU-friendly semantics:

* **NHWC everywhere** — the TPU-preferred conv layout; the reference is
  NCHW (we convert at IO boundaries only).
* **Explicit torch-style padding** so spatial geometry matches the
  reference architectures exactly (e.g. Conv k=3,s=2,p=1 on 32px -> 16px).
* **Spectral norm as carried state** — torch's ``spectral_norm`` hook
  (reference networks/sn_discriminator.py:4-38) is a stateful power
  iteration updated on every train-mode forward. Here the ``u``/``v``
  vectors live in a ``spectral`` variable collection threaded through the
  jitted train step; one power iteration per forward when ``update_sn``.
* **InstanceNorm** (affine and non-affine) — flax has no InstanceNorm2d;
  CycleGAN's affine IN scales carry the white-box signature
  (reference networks/resnet_generator.py:3-59).
* **torch-default initializers** (kaiming_uniform(a=sqrt(5)) + fan-in
  uniform bias) so training dynamics match the reference from step 0.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Dtype = Any


# ---------------------------------------------------------------------------
# initializers (torch defaults)
# ---------------------------------------------------------------------------

def torch_kernel_init(in_features: int) -> Callable:
    """torch nn.Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) * sqrt(3) * sqrt(2/(1+5)) ... which
    reduces to U(-sqrt(1/fan_in), sqrt(1/fan_in))."""
    bound = math.sqrt(1.0 / in_features)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int) -> Callable:
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fan_in(a: float) -> Callable:
    """torch nn.init.kaiming_normal_(mode='fan_in', nonlinearity='leaky_relu')
    on an HWIO kernel: std = sqrt(2 / ((1 + a^2) * fan_in)).
    Used by SRResNet/Discriminator96 custom init
    (reference networks/sr_resnet.py:27-29)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, _ = shape
        fan_in = kh * kw * cin
        std = math.sqrt(2.0 / ((1.0 + a * a) * fan_in))
        return std * jax.random.normal(key, shape, dtype)

    return init


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


# ---------------------------------------------------------------------------
# core layers
# ---------------------------------------------------------------------------

class Conv(nn.Module):
    """2D conv, NHWC, torch-style integer padding and default init."""

    features: int
    kernel_size: int | Tuple[int, int]
    strides: int | Tuple[int, int] = 1
    padding: int | Tuple[int, int] = 0
    use_bias: bool = True
    kernel_init: Callable | None = None
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1]
        fan_in = cin * kh * kw
        kinit = self.kernel_init or torch_kernel_init(fan_in)
        ph, pw = _pair(self.padding)
        y = nn.Conv(
            features=self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.strides),
            padding=((ph, ph), (pw, pw)),
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)
        return y


class ConvTranspose(nn.Module):
    """2D transposed conv, NHWC, torch geometry.

    torch: out = (in-1)*s - 2p + k + output_padding. flax ConvTranspose
    explicit padding obeys out = (in-1)*s + k + p_lo + p_hi - 2(k-1), so
    torch geometry maps to p_lo = k-1-p, p_hi = k-1-p+output_padding
    (the extra output_padding row/col lands on the bottom/right like
    torch).
    """

    features: int
    kernel_size: int | Tuple[int, int]
    strides: int | Tuple[int, int] = 1
    padding: int | Tuple[int, int] = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1]
        fan_in = cin * kh * kw  # torch convT weight (in, out, kh, kw): fan_in of w
        ph, pw = _pair(self.padding)
        op = self.output_padding
        y = nn.ConvTranspose(
            features=self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.strides),
            padding=((kh - 1 - ph, kh - 1 - ph + op),
                     (kw - 1 - pw, kw - 1 - pw + op)),
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init(fan_in),
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="convt",
        )(x)
        return y


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init(fan_in),
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="dense",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm matching torch semantics: momentum 0.1 (flax 0.9),
    eps 1e-5. ``train`` selects batch statistics; running stats update
    only where the ``batch_stats`` collection is mutable — that is how the
    watermark branch freezes stats (the reference's DisableBatchNormStats,
    models/util.py:55-68): apply with ``mutable=[]`` on that branch."""

    use_running_average: bool | None = None
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool | None = None) -> Array:
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over H,W (torch
    InstanceNorm2d, eps 1e-5). ``affine=True`` adds scale/bias — the
    scale vector is a white-box signature carrier."""

    affine: bool = False
    epsilon: float = 1e-5
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y * scale + bias
        return y.astype(orig_dtype)


class PReLU(nn.Module):
    """PReLU with a single shared slope (torch default)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x: Array) -> Array:
        a = self.param("alpha", nn.initializers.constant(self.init), (),
                       jnp.float32)
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


# ---------------------------------------------------------------------------
# spectral normalization
# ---------------------------------------------------------------------------

def _l2norm(v: Array, eps: float = 1e-12) -> Array:
    return v / (jnp.linalg.norm(v) + eps)


def spectral_sigma(mat: Array, u: Array, v: Array,
                   update: bool) -> Tuple[Array, Array, Array]:
    """One power iteration (torch n_power_iterations=1).

    mat: (out, rest). Returns (sigma, new_u, new_v). When ``update`` is
    False, sigma comes from the stored vectors (torch eval behavior)."""
    if update:
        v = _l2norm(mat.T @ u)
        u = _l2norm(mat @ v)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (mat @ v)
    return sigma, u, v


class _SNMixin:
    """Shared spectral-norm machinery for conv/dense kernels."""

    def _sn_kernel(self, kernel: Array, out_features: int,
                   update_sn: bool) -> Array:
        mat = kernel.reshape(-1, out_features).T  # (out, rest)
        if self.is_initializing():
            key = self.make_rng("params")
            u0 = _l2norm(jax.random.normal(key, (out_features,), jnp.float32))
            v0 = _l2norm(jnp.ones((mat.shape[1],), jnp.float32))
        else:
            u0 = v0 = None
        u_var = self.variable("spectral", "u", lambda: u0)
        v_var = self.variable("spectral", "v", lambda: v0)
        sigma, new_u, new_v = spectral_sigma(
            mat.astype(jnp.float32), u_var.value, v_var.value, update_sn
        )
        if update_sn and not self.is_initializing():
            u_var.value = new_u
            v_var.value = new_v
        return kernel / sigma.astype(kernel.dtype)


class SNConv(nn.Module, _SNMixin):
    """Spectral-normalized conv (reference networks/sn_discriminator.py:9)."""

    features: int
    kernel_size: int | Tuple[int, int]
    strides: int | Tuple[int, int] = 1
    padding: int | Tuple[int, int] = 0
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array, update_sn: bool = False) -> Array:
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1]
        fan_in = cin * kh * kw
        kernel = self.param("kernel", torch_kernel_init(fan_in),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", torch_bias_init(fan_in),
                          (self.features,), jnp.float32)
        kbar = self._sn_kernel(kernel, self.features, update_sn)
        dtype = self.dtype or x.dtype
        ph, pw = _pair(self.padding)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kbar.astype(dtype),
            window_strides=_pair(self.strides),
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(dtype)


class SNDense(nn.Module, _SNMixin):
    features: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array, update_sn: bool = False) -> Array:
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init(fan_in),
                            (fan_in, self.features), jnp.float32)
        bias = self.param("bias", torch_bias_init(fan_in),
                          (self.features,), jnp.float32)
        kbar = self._sn_kernel(kernel, self.features, update_sn)
        dtype = self.dtype or x.dtype
        return x.astype(dtype) @ kbar.astype(dtype) + bias.astype(dtype)


# ---------------------------------------------------------------------------
# functional helpers
# ---------------------------------------------------------------------------

def pixel_shuffle(x: Array, r: int) -> Array:
    """Depth-to-space, torch PixelShuffle channel ordering, NHWC."""
    b, h, w, c = x.shape
    assert c % (r * r) == 0
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, co
    return x.reshape(b, h * r, w * r, co)


def reflect_pad(x: Array, pad: int) -> Array:
    """ReflectionPad2d on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
