"""White-box protection: normalization-scale sign signatures.

Re-implements the reference SignLossModel (tools/sign_model.py) as pure
functions over param pytrees:

* ``BitGenerator`` — signature string + '\\t' -> cyclic 8-bit/char
  bitstream (tools/sign_model.py:6-24);
* ``embed_signs`` — for every norm-scale leaf of the target params, draw
  c_out bits, force the scale weights to |w| * sign at construction time
  (tools/sign_model.py:33-40), and return the sign buffers (checkpointed
  under the ``sign`` key);
* ``sign_loss`` — hinge sign loss sum(mean(relu(gamma_0 - w * sign)))
  (tools/sign_model.py:42-49), added to the generator loss inside the
  compiled step;
* ``compute_ber`` — fraction of scale weights whose sign disagrees
  (tools/sign_model.py:51-59).

Norm-scale leaves are identified structurally: any param leaf whose path
ends in ``scale`` (our BatchNorm and affine InstanceNorm params — convs
use ``kernel``, PReLU uses ``alpha``). Enumeration order is the sorted
flattened-path order, which is deterministic and stable across save/load;
all four consumers (embed / loss / BER / the sign-flip attack) share it.
"""

from __future__ import annotations

import random as _pyrandom
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util


class BitGenerator:
    """Cyclic bitstream from a signature string (random bits if None)."""

    def __init__(self, string: str | None = None):
        self.random = string is None
        if string is not None:
            assert isinstance(string, str)
            bits = "".join(f"{ord(c):08b}" for c in (string + "\t"))
            self.string = list(map(int, bits))
        self.index = 0

    def __next__(self) -> int:
        if self.random:
            return _pyrandom.randint(0, 1)
        bit = self.string[self.index % len(self.string)]
        self.index += 1
        return bit

    def get(self, n: int) -> List[int]:
        return [next(self) for _ in range(n)]


def iter_norm_scale_paths(params) -> List[Tuple[str, ...]]:
    """Sorted paths of all norm-scale leaves in a params pytree."""
    flat = traverse_util.flatten_dict(params)
    return sorted(p for p in flat if p[-1] == "scale")


def _safe_name(path: Tuple[str, ...]) -> str:
    return "_".join(path)


def embed_signs(params, string: str | None, gamma_0: float = 0.1):
    """Force norm scales to |w|*sign and return (new_params, signs)."""
    flat = traverse_util.flatten_dict(params)
    signs: Dict[str, jax.Array] = {}
    gen = BitGenerator(string)
    for path in iter_norm_scale_paths(params):
        w = flat[path]
        bits = jnp.asarray(gen.get(w.shape[0]), jnp.float32)
        sign = bits * 2.0 - 1.0
        flat[path] = jnp.abs(w) * sign
        signs[_safe_name(path)] = sign
    return traverse_util.unflatten_dict(flat), signs


def sign_loss(params, signs: Dict[str, jax.Array], gamma_0: float):
    """sum over layers of mean(relu(gamma_0 - w * sign))."""
    flat = traverse_util.flatten_dict(params)
    loss = jnp.asarray(0.0, jnp.float32)
    for path in iter_norm_scale_paths(params):
        sign = signs[_safe_name(path)]
        w = flat[path].astype(jnp.float32)
        loss = loss + jnp.mean(jax.nn.relu(gamma_0 - w * sign))
    return loss


def compute_ber(params, signs: Dict[str, jax.Array]):
    """Bit error rate of scale signs vs the embedded signature."""
    flat = traverse_util.flatten_dict(params)
    err = jnp.asarray(0.0, jnp.float32)
    total = 0
    for path in iter_norm_scale_paths(params):
        sign = signs[_safe_name(path)]
        w = flat[path].astype(jnp.float32)
        err = err + jnp.sum(jnp.sign(w) != sign)
        total += int(sign.shape[0])
    return err / total
