"""TF-FID InceptionV3 in flax (feature extractor for FID / IS).

Architecture follows the FID-specific InceptionV3 variant the reference
uses (reference networks/inception.py:16-342, itself the
mseitzer/pytorch-fid port of the original TF 2015-12-05 graph): the
FID patches are (a) InceptionA/C/E avg-pool branches with
count_include_pad=False, (b) the last InceptionE using max pooling in
its pool branch, (c) a 1008-way fc head. Input is NHWC in [-1, 1]
(normalize_input=False in the reference InceptionActivations,
networks/inception.py:330), bilinearly resized to 299x299.

Weights: this environment has no network egress, so pretrained FID
weights must be supplied as a file — either the upstream
``pt_inception-2015-12-05-*.pth`` (converted on the fly with
scripts/convert_torch_weights.py machinery) or a pre-converted ``.npz``.
Resolution order: ``evaluation.inception_weights`` in the config, then
``$IPRGAN_INCEPTION_WEIGHTS``. Without weights a deterministic random
init is used and a warning printed — metric *machinery* still runs, but
FID/IS values are not comparable with published numbers.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _avg_pool3_nocountpad(x):
    """3x3 stride-1 avg pool, pad 1, count_include_pad=False."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


def _max_pool(x, k, s, p=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (p, p), (p, p), (0, 0)))


class BasicConv2d(nn.Module):
    """conv(no bias) + BN(eps 1e-3, inference stats) + relu."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        x = nn.Conv(self.features, self.kernel, strides=(self.stride,) * 2,
                    padding=((ph, ph), (pw, pw)), use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool3_nocountpad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool3_nocountpad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str  # 'avg' (7b) or 'max' (7c — the FID patch)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "max":
            bp = _max_pool(x, 3, 1, p=1)
        else:
            bp = _avg_pool3_nocountpad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Full FID InceptionV3: returns (pool3 2048-d features, 1008 logits)."""

    @nn.compact
    def __call__(self, x):
        # x: NHWC in [-1, 1], any spatial size -> bilinear resize to 299
        n = x.shape[0]
        x = jax.image.resize(x, (n, 299, 299, 3), method="bilinear")
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)
        logits = nn.Dense(1008, name="fc")(feats)
        return feats, logits


# ---------------------------------------------------------------------------
# weight loading / conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(sd) -> dict:
    """Map the pytorch-fid checkpoint onto our flax variable tree.

    Strict: every state-dict key must either be consumed or match a
    known-ignorable pattern (BN step counters, the aux classifier the
    FID path never runs) — a silently dropped weight would leave a
    default-initialized leaf and corrupt every FID/IS number downstream
    (tests/test_converter_coverage.py pins the full key inventory)."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, val):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(val)

    unconsumed = []
    for key, val in sd.items():
        val = np.asarray(val)
        parts = key.split(".")
        if key.endswith(".num_batches_tracked") or \
                parts[0] == "AuxLogits":
            continue  # torch bookkeeping / train-only aux head
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(params, ("fc", "kernel"), val.T)
            elif parts[1] == "bias":
                put(params, ("fc", "bias"), val)
            else:
                unconsumed.append(key)
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight / .bn.{weight,bias,
        # running_mean,running_var}
        module_path = parts[:-2] if len(parts) > 2 else parts[:1]
        layer, leaf = parts[-2], parts[-1]
        if layer == "conv" and leaf == "weight":
            put(params, tuple(module_path) + ("conv", "kernel"),
                val.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        elif layer == "bn" and leaf in ("weight", "bias", "running_mean",
                                        "running_var"):
            tree, name = {
                "weight": (params, "scale"),
                "bias": (params, "bias"),
                "running_mean": (batch_stats, "mean"),
                "running_var": (batch_stats, "var"),
            }[leaf]
            put(tree, tuple(module_path) + ("bn", name), val)
        else:
            unconsumed.append(key)
    if unconsumed:
        raise ValueError(
            "inception converter did not consume "
            f"{len(unconsumed)} state-dict keys (first few: "
            f"{unconsumed[:5]}) — refusing to emit a partially-mapped "
            "tree")
    return {"params": params, "batch_stats": batch_stats}


def _resolve_weights(config) -> str | None:
    if config is not None:
        ev = config.get("evaluation", None)
        if ev is not None:
            p = ev.get("inception_weights", None)
            if p:
                return p
    return os.environ.get("IPRGAN_INCEPTION_WEIGHTS") or None


class InceptionActivations:
    """Callable: NHWC [-1,1] batch -> (2048-d activations, softmax probs).

    Mirrors the reference InceptionActivations
    (networks/inception.py:327-342). Use ``build(config)``.
    """

    def __init__(self, variables):
        net = InceptionV3FID()

        @jax.jit
        def fwd(v, x):
            feats, logits = net.apply(v, x)
            return feats, jax.nn.softmax(logits, axis=1)

        self._fwd = fwd
        self._vars = variables

    def __call__(self, x):
        return self._fwd(self._vars, jnp.asarray(x))

    @classmethod
    def build(cls, config=None) -> "InceptionActivations":
        path = _resolve_weights(config)
        net = InceptionV3FID()
        if path and os.path.exists(path):
            if path.endswith(".npz"):
                import pickle

                with np.load(path, allow_pickle=True) as data:
                    variables = pickle.loads(data["variables"].tobytes())
                variables = jax.tree_util.tree_map(jnp.asarray, variables)
            else:  # torch .pth
                import torch

                sd = torch.load(path, map_location="cpu")
                sd = {k: v.numpy() for k, v in sd.items()}
                variables = convert_torch_state_dict(sd)
        else:
            print("WARNING: no FID Inception weights found "
                  "(set evaluation.inception_weights or "
                  "$IPRGAN_INCEPTION_WEIGHTS); using deterministic random "
                  "init — FID/IS values will NOT match published numbers.")
            variables = net.init(jax.random.PRNGKey(42),
                                 jnp.zeros((1, 32, 32, 3)))
        return cls(variables)
