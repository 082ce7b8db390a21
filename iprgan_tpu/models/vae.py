"""VAE: encoder ("D") + decoder ("G") with one joint optimizer.

Functional re-design of reference models/vae.py: KL + per-sample-summed
BCE reconstruction on [0,1]-rescaled images, a single Adam over both
parameter sets (checkpoint key ``opt``, models/vae.py:32), and the
black-box trigger applied to the *encoder output* (input_var='latent',
experiments/image_generation.py:65-67) so the watermark works through
the decoder alone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from iprgan_tpu.models.base import Protection, State, make_optimizer
from iprgan_tpu.registry import MODELS, NETWORKS


def _bce_sum(pred01, target01):
    """torch F.binary_cross_entropy(reduction='sum') with the same -100
    log clamp (torch clamps log terms at -100)."""
    logp = jnp.maximum(jnp.log(pred01), -100.0)
    log1mp = jnp.maximum(jnp.log1p(-pred01), -100.0)
    return -jnp.sum(target01 * logp + (1.0 - target01) * log1mp)


@MODELS.register("VAE")
class VAE:
    Z_DIM = 128
    normalized = True
    state_keys = ("G", "D", "opt")

    def __init__(self, config, protection_config=None, hparam=None,
                 image_size: int = 32, dtype=None):
        self.config = config
        self.G = NETWORKS(config.G)(dtype=dtype)  # Decoder32
        self.D = NETWORKS(config.D)(dtype=dtype)  # Encoder32
        self.opt = make_optimizer(config.opt, config.opt_param)
        self.protection = Protection(protection_config, self.normalized)
        self.image_size = image_size
        hparam = hparam or {}
        self.d_iter = 1
        self.g_iter = 1

    def init_state(self, rng) -> State:
        kg, kd, kr, kp = jax.random.split(rng, 4)
        x = jnp.zeros((2, self.image_size, self.image_size, 3), jnp.float32)
        z = jnp.zeros((2, self.Z_DIM), jnp.float32)
        dvars = self.D.init({"params": kd, "reparam": kr}, x, train=False)
        gvars = self.G.init(kg, z, train=False)

        gparams, signs = self.protection.embed(gvars["params"])
        gvars = dict(gvars, params=gparams)

        state: State = {
            "G": dict(gvars),
            "D": dict(dvars),
            "opt": self.opt.init({"G": gvars["params"], "D": dvars["params"]}),
            "step": jnp.int32(0),
        }
        if signs is not None:
            state["sign"] = signs
        self.protection.init_buffers(state, kp)
        return state

    # -- eval -------------------------------------------------------------
    def generate(self, state: State, z, train: bool = False):
        return self.G.apply(
            {"params": state["G"]["params"],
             "batch_stats": state["G"]["batch_stats"]},
            z, train=False)

    def encode(self, state: State, x, rng):
        return self.D.apply(
            {"params": state["D"]["params"],
             "batch_stats": state["D"]["batch_stats"]},
            x, train=False, rngs={"reparam": rng})

    def transform_latent(self, state: State, z):
        return self.protection.fn_inp(state["fn_inp"], z)

    def transform_output(self, state: State, y):
        return self.protection.fn_out(state["fn_out"], y)

    # -- train ------------------------------------------------------------
    def train_step(self, state: State, batch, rng):
        """``batch['real']``: (1, B, H, W, C) float32 in [-1, 1]."""
        P = self.protection
        real = batch["real"][0]
        n = real.shape[0]
        rng, krep = jax.random.split(rng)

        gbs = state["G"]["batch_stats"]
        dbs = state["D"]["batch_stats"]

        def loss_fn(params):
            gp, dp = params["G"], params["D"]
            (z, (mean, logvar)), dmut = self.D.apply(
                {"params": dp, "batch_stats": dbs}, real, train=True,
                mutable=["batch_stats"], rngs={"reparam": krep})
            if P.bbox:
                # one fused decoder forward over [z; trigger(z)] via
                # vmap: BN statistics stay per-group (instance 0's
                # mutation equals the plain-z mutation; instance 1's
                # is discarded = reference DisableBatchNormStats), while
                # XLA sees one conv stack at batch 2B — this model is
                # HBM-/overhead-bound, so halving the decoder kernel
                # count is the win (README VAE limiter section).
                xwm = P.fn_inp(state["fn_inp"], jax.lax.stop_gradient(z))
                outs, gmuts = jax.vmap(
                    lambda zi: self.G.apply(
                        {"params": gp, "batch_stats": gbs}, zi,
                        train=True, mutable=["batch_stats"])
                )(jnp.stack([z, xwm]))
                fake, gxwm = outs[0], outs[1]
                gmut = {"batch_stats": jax.tree.map(
                    lambda a: a[0], gmuts["batch_stats"])}
            else:
                fake, gmut = self.G.apply(
                    {"params": gp, "batch_stats": gbs}, z, train=True,
                    mutable=["batch_stats"])
                gxwm = None

            kl = jnp.sum((mean ** 2 + jnp.exp(logvar) - 1.0 - logvar) / 2.0) / n
            rec = _bce_sum((fake + 1.0) / 2.0, (real + 1.0) / 2.0) / n
            loss_g = kl + rec
            total = loss_g
            aux = {"G/KL": kl, "G/R": rec,
                   "_gbs": gmut["batch_stats"], "_dbs": dmut["batch_stats"]}
            if P.bbox:
                ywm = jax.lax.stop_gradient(
                    P.fn_out(state["fn_out"], jax.lax.stop_gradient(fake)))
                loss_w = P.loss_fn(gxwm, ywm)
                total = total + P.lam * loss_w
                aux[f"P/{P.loss_name.upper()}"] = loss_w
            if P.wbox:
                loss_s = P.wbox_loss(state, gp)
                total = total + loss_s
                aux["P/SignLoss"] = loss_s
            return total, aux

        params = {"G": state["G"]["params"], "D": state["D"]["params"]}
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = self.opt.update(grads, state["opt"], params)
        new_params = optax.apply_updates(params, updates)

        gbs_new = aux.pop("_gbs")
        dbs_new = aux.pop("_dbs")
        metrics = dict(aux)
        metrics["G/Sum"] = total

        state = dict(
            state,
            G={"params": new_params["G"], "batch_stats": gbs_new},
            D={"params": new_params["D"], "batch_stats": dbs_new},
            opt=new_opt,
            step=state["step"] + 1,
        )
        return state, metrics
