"""Optimizer parity: our optax chains must match torch.optim semantics
(the reference resolves optimizers by name from torch.optim,
models/dcgan.py:21-24), including weight_decay-as-L2-in-grad ordering
and the injectable learning rate."""

import jax.numpy as jnp
import numpy as np
import pytest

from iprgan_tpu.models.base import get_lr, make_optimizer, set_lr


class _P(dict):
    def to_dict(self):
        return dict(self)


def _torch_adam_steps(w0, grads, lr, betas, wd, n):
    import torch

    w = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([w], lr=lr, betas=betas, weight_decay=wd)
    for g in grads[:n]:
        opt.zero_grad()
        w.grad = torch.tensor(g)
        opt.step()
    return w.detach().numpy()


@pytest.mark.parametrize("wd", [0.0, 1e-2])
def test_adam_matches_torch(wd):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(4)]

    opt = make_optimizer("Adam", _P(lr=1e-3, betas=[0.5, 0.999],
                                    weight_decay=wd))
    state = opt.init(jnp.asarray(w0))
    w = jnp.asarray(w0)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, w)
        w = w + updates

    ref = _torch_adam_steps(w0, grads, 1e-3, (0.5, 0.999), wd, 4)
    np.testing.assert_allclose(np.asarray(w), ref, rtol=1e-5, atol=1e-7)


def test_lr_injection():
    opt = make_optimizer("Adam", _P(lr=1e-3))
    w = jnp.ones((4,))
    state = opt.init(w)
    assert float(get_lr(state)) == pytest.approx(1e-3)

    g = jnp.ones((4,))
    updates_full, _ = opt.update(g, state, w)
    state = set_lr(state, 1e-4)
    updates_small, _ = opt.update(g, state, w)
    # first adam step moves by exactly -lr * sign-ish magnitude
    ratio = float(updates_full[0] / updates_small[0])
    assert ratio == pytest.approx(10.0, rel=1e-3)


def test_sgd_and_rmsprop_exist():
    for name in ("SGD", "RMSprop"):
        opt = make_optimizer(name, _P(lr=0.1))
        w = jnp.ones((3,))
        state = opt.init(w)
        updates, _ = opt.update(jnp.ones((3,)), state, w)
        assert np.all(np.isfinite(np.asarray(updates)))
    with pytest.raises(KeyError):
        make_optimizer("AdamW2", _P(lr=0.1))
