"""Shared machinery for the functional model layer.

The reference's Model ABC + wrapper decorators (models/base.py,
models/wrappers.py) become pure functions here: each model family
provides ``init_state(rng) -> state`` and ``train_step(state, batch,
rng) -> (state, metrics)``, compiled with jax.jit. Protection is loss
composition inside the same compiled step — the reference already funnels
everything into one optG.step() (models/wrappers.py:121-125), so the
semantics carry over exactly, minus torch's stateful autograd graph.

State is a flat dict whose top-level keys mirror the reference checkpoint
schema (G/D/optG/optD/fn_inp/fn_out/sign/... see utils/checkpoint.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from iprgan_tpu.protection import make_loss, make_transform
from iprgan_tpu.protection.sign import compute_ber, embed_signs, sign_loss
from iprgan_tpu.registry import MODELS  # noqa: F401  (re-export)

State = Dict[str, Any]


# ---------------------------------------------------------------------------
# optimizers
# ---------------------------------------------------------------------------

def make_optimizer(opt_name: str, opt_param) -> optax.GradientTransformation:
    """Build an optax optimizer from the YAML ``model.opt``/``opt_param``
    (reference models/dcgan.py:21-24 uses getattr(torch.optim, name)).

    The learning rate is exposed as an injectable hyperparameter
    (``opt_state.hyperparams['learning_rate']``) so schedules — SRGAN's
    halfway lr*0.1 drop, CycleGAN's linear decay — run *inside* the
    compiled step by rewriting it from the carried step counter.
    torch.optim.Adam's ``weight_decay`` is L2 added to the gradient
    before the moment updates, i.e. optax.add_decayed_weights placed
    before scale_by_adam.
    """
    p = opt_param.to_dict() if hasattr(opt_param, "to_dict") else dict(opt_param)
    lr = p.pop("lr")
    wd = p.pop("weight_decay", 0.0)

    if opt_name == "Adam":
        b1, b2 = p.pop("betas", (0.9, 0.999))
        eps = p.pop("eps", 1e-8)

        def inner(learning_rate):
            chain = []
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
            chain.append(optax.scale(-learning_rate))
            return optax.chain(*chain)

    elif opt_name == "SGD":
        momentum = p.pop("momentum", 0.0)

        def inner(learning_rate):
            chain = []
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            if momentum:
                chain.append(optax.trace(decay=momentum))
            chain.append(optax.scale(-learning_rate))
            return optax.chain(*chain)

    elif opt_name == "RMSprop":
        alpha = p.pop("alpha", 0.99)
        eps = p.pop("eps", 1e-8)

        def inner(learning_rate):
            chain = [optax.scale_by_rms(decay=alpha, eps=eps)]
            if wd:
                chain.insert(0, optax.add_decayed_weights(wd))
            chain.append(optax.scale(-learning_rate))
            return optax.chain(*chain)

    else:
        raise KeyError(f"unsupported optimizer '{opt_name}'")

    return optax.inject_hyperparams(inner)(learning_rate=lr)


def set_lr(opt_state, lr):
    """Rewrite the injected learning rate inside a compiled step."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, jnp.asarray(opt_state.hyperparams["learning_rate"]).dtype)
    return opt_state


def get_lr(opt_state):
    return opt_state.hyperparams["learning_rate"]


# ---------------------------------------------------------------------------
# protection glue
# ---------------------------------------------------------------------------

class Protection:
    """Static protection configuration resolved from YAML.

    Mirrors what the experiment drivers inject before wrapping
    (reference experiments/image_generation.py:52-84): the bbox transforms
    and loss, lambda, and the wbox gamma_0/signature. The model-specific
    variable wiring (input_var/output_var/target) lives in each model's
    train step.
    """

    def __init__(self, config, normalized: bool):
        self.bbox = None
        self.wbox = None
        if config is None:
            return
        bbox = config.get("bbox", None)
        wbox = config.get("wbox", None)
        if bbox:
            self.bbox = bbox
            self.fn_inp = make_transform(bbox.fn_inp, normalized=normalized)
            self.fn_out = make_transform(bbox.fn_out, normalized=normalized)
            self.lam = bbox["lambda"]
            self.loss_name = bbox.loss_fn
            self.loss_fn = make_loss(bbox.loss_fn, normalized=normalized)
        if wbox:
            self.wbox = wbox
            self.gamma_0 = wbox.gamma_0
            self.string = wbox.get("string", None)

    # -- state ------------------------------------------------------------
    def init_buffers(self, state: State, rng) -> None:
        """Add fn_inp / fn_out buffer entries to the model state."""
        if self.bbox:
            k1, k2 = jax.random.split(rng)
            state["fn_inp"] = self.fn_inp.init_buffers(k1)
            state["fn_out"] = self.fn_out.init_buffers(k2)

    def embed(self, target_params):
        """Init-time white-box sign embedding (tools/sign_model.py:33-40)."""
        if not self.wbox:
            return target_params, None
        return embed_signs(target_params, self.string, self.gamma_0)

    # -- loss terms -------------------------------------------------------
    def wbox_loss(self, state: State, target_params):
        if not self.wbox:
            return jnp.float32(0.0)
        return sign_loss(target_params, state["sign"], self.gamma_0)

    def ber(self, state: State, target_params):
        if not self.wbox:
            return float("nan")
        return float(compute_ber(target_params, state["sign"]))


def tree_cast(tree, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)
