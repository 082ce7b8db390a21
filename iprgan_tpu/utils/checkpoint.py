"""Checkpointing with the reference's key schema.

The reference saves a flat ``{module_name: module.state_dict(), 'step':
int|'END'}`` dict via torch.save (reference models/base.py:34-38,
experiments/image_generation.py:103-139). The attack tooling does regex
surgery on the *top-level keys* of that dict (attack.py:50-61,
prune.py:41-57), so the schema is a public contract.

Here the same contract holds: a checkpoint is a dict whose top-level keys
are module names (``G``/``D``/``GA``/``optG``/``fn_inp``/``sign``/...)
mapping to pytrees of numpy arrays, plus a ``step`` entry that is either
an int or the string ``'END'``. Serialized as msgpack (single rolling
file ``checkpoint.msgpack``, plus SRGAN's ``pretrain.msgpack``).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

CKPT_NAME = "checkpoint.msgpack"
PRETRAIN_NAME = "pretrain.msgpack"
END_SENTINEL = "END"


def _to_host(tree: Any) -> Any:
    """Device arrays -> numpy, leave scalars/strings alone."""
    def conv(x):
        if isinstance(x, jax.Array):
            return np.asarray(jax.device_get(x))
        return x

    return jax.tree_util.tree_map(conv, tree)


def save(path: str, state_dict: Dict[str, Any]) -> None:
    data = serialization.msgpack_serialize(_to_host(state_dict))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def exists(log_path: str) -> bool:
    return os.path.exists(os.path.join(log_path, CKPT_NAME))
