"""DCGAN: hinge-loss GAN with composed protection losses.

Functional re-design of the reference DCGAN + wrapper stack
(models/dcgan.py, models/wrappers.py): one jitted train step performs
``d_iter`` discriminator updates (hinge loss, spectral-norm power
iteration advanced per D forward) followed by ``g_iter`` generator
updates whose loss composes

    LossG = -E[D(G(z))] + lambda * LossW + LossS

exactly like the reference's single combined backward
(models/wrappers.py:115-125):

* LossW — black-box watermark consistency: ``loss_fn(G(fn_inp(z)),
  fn_out(G(z)))`` with the trigger/watermark pastes fused into the step
  and BN running stats frozen on the watermark branch (the reference's
  DisableBatchNormStats becomes "discard the batch_stats mutation");
* LossS — white-box hinge sign loss over G's norm scales.

The generator forward from the D phase is recomputed inside the G loss
(same z, same params, same batch statistics -> bitwise-identical values)
instead of keeping torch's retained graph. XLA common-subexpression-
eliminates that recompute against the D-phase forward inside the fused
chunk: an explicit-vjp variant that hand-shared the forward measured
IDENTICAL cost-analysis FLOPs (162.79G) and steps/s on the chip, so the
simpler recompute form is kept.

With bbox protection both phases run ONE vmapped G forward over the two
latent groups [z; fn_inp(z)] instead of two batch-B applies: vmap keeps
the batch statistics per-group (so the math equals the sequential
form — verified in tests/test_fused_forward.py), XLA sees a single conv
stack at batch 2B, and because the D-phase and G-phase fused forwards
are structurally identical they still CSE (cost-analysis FLOPs stay at
162.8G). Measured on chip: 436 -> 506 steps/s f32 (36% -> 42% MFU),
478 -> 531 bf16 (README round-3 perf section).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from iprgan_tpu.models.base import (
    Protection,
    State,
    make_optimizer,
)
from iprgan_tpu.registry import MODELS, NETWORKS


@MODELS.register("DCGAN")
class DCGAN:
    Z_DIM = 128
    normalized = True  # data in [-1, 1] (experiments/image_generation.py:63)
    state_keys = ("G", "D", "optG", "optD")

    def __init__(self, config, protection_config=None, hparam=None,
                 image_size: int = 32, dtype=None):
        self.config = config
        self.G = NETWORKS(config.G)(dtype=dtype)
        self.D = NETWORKS(config.D)(dtype=dtype)
        self.optG = make_optimizer(config.opt, config.opt_param)
        self.optD = make_optimizer(config.opt, config.opt_param)
        self.protection = Protection(protection_config, self.normalized)
        hparam = hparam or {}
        self.d_iter = hparam.get("d_iter", 1) or 1
        self.g_iter = hparam.get("g_iter", 1) or 1
        self.image_size = image_size

    # -- state ------------------------------------------------------------
    def init_state(self, rng) -> State:
        kg, kd, kp = jax.random.split(rng, 3)
        z = jnp.zeros((2, self.Z_DIM), jnp.float32)
        x = jnp.zeros((2, self.image_size, self.image_size, 3), jnp.float32)
        gvars = self.G.init(kg, z, train=False)
        dvars = self.D.init(kd, x)

        gparams, signs = self.protection.embed(gvars["params"])
        gvars = dict(gvars, params=gparams)

        state: State = {
            "G": dict(gvars),
            "D": dict(dvars),
            "optG": self.optG.init(gvars["params"]),
            "optD": self.optD.init(dvars["params"]),
            "step": jnp.int32(0),
        }
        if signs is not None:
            state["sign"] = signs
        self.protection.init_buffers(state, kp)
        return state

    # -- forward (eval) ---------------------------------------------------
    def generate(self, state: State, z, train: bool = False):
        """G in eval mode (running BN stats), reference G.eval() sampling."""
        if train:
            y, _ = self.G.apply(
                {"params": state["G"]["params"],
                 "batch_stats": state["G"]["batch_stats"]},
                z, train=True, mutable=["batch_stats"])
            return y
        return self.G.apply(
            {"params": state["G"]["params"],
             "batch_stats": state["G"]["batch_stats"]},
            z, train=False)

    def transform_latent(self, state: State, z):
        return self.protection.fn_inp(state["fn_inp"], z)

    def transform_output(self, state: State, y):
        return self.protection.fn_out(state["fn_out"], y)

    # -- train ------------------------------------------------------------
    def train_step(self, state: State, batch, rng):
        """One optimization step. ``batch['real']``: (d_iter, B, H, W, C)
        float32 in [-1, 1]. Mirrors reference
        experiments/image_generation.py:86-101."""
        P = self.protection
        gvars = dict(state["G"])
        dvars = dict(state["D"])
        metrics = {}
        real = batch["real"]
        z = None

        for i in range(self.d_iter):
            rng, zk = jax.random.split(rng)
            z = jax.random.normal(zk, (real.shape[1], self.Z_DIM), jnp.float32)

            # G forward in train mode — the only place BN stats update.
            # With bbox protection this is the SAME vmapped two-group
            # forward the G phase uses (z and the triggered latents;
            # group-0 stats mutation kept == the plain-z mutation), so
            # XLA common-subexpression-eliminates the G-phase primal
            # forward against this one inside the fused chunk — the
            # trigger-branch forward is computed once per step.
            if P.bbox:
                zwm = P.fn_inp(state["fn_inp"], z)
                both, gmuts = jax.vmap(
                    lambda zi: self.G.apply(
                        {"params": gvars["params"],
                         "batch_stats": gvars["batch_stats"]},
                        zi, train=True, mutable=["batch_stats"])
                )(jnp.stack([z, zwm]))
                fake = both[0]
                gvars["batch_stats"] = jax.tree.map(
                    lambda a: a[0], gmuts["batch_stats"])
            else:
                fake, gmut = self.G.apply(
                    {"params": gvars["params"],
                     "batch_stats": gvars["batch_stats"]},
                    z, train=True, mutable=["batch_stats"])
                gvars["batch_stats"] = gmut["batch_stats"]
            fake_sg = jax.lax.stop_gradient(fake)

            def d_loss_fn(dp, spectral, real_i, fake_i):
                # one fused D forward over [real; fake] — D has no batch
                # statistics (spectral-norm convs only), so this is
                # value-identical to two separate forwards and halves the
                # kernel count of the D phase
                b = real_i.shape[0]
                both = jnp.concatenate([real_i, fake_i], axis=0)
                logits, m1 = self.D.apply(
                    {"params": dp, "spectral": spectral}, both,
                    update_sn=True, mutable=["spectral"])
                loss_r = jnp.mean(jax.nn.relu(1.0 - logits[:b]))
                loss_f = jnp.mean(jax.nn.relu(1.0 + logits[b:]))
                return loss_r + loss_f, (loss_r, loss_f, m1["spectral"])

            (loss_d, (loss_r, loss_f, new_sp)), dgrads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(
                    dvars["params"], dvars["spectral"], real[i], fake_sg)
            updates, new_opt_d = self.optD.update(
                dgrads, state["optD"], dvars["params"])
            dvars["params"] = optax.apply_updates(dvars["params"], updates)
            dvars["spectral"] = new_sp
            state = dict(state, optD=new_opt_d)
            metrics.update({"D/Sum": loss_d, "D/Real": loss_r,
                            "D/Fake": loss_f})

        for _ in range(self.g_iter):
            def g_loss_fn(gp):
                if P.bbox:
                    # one fused G forward over BOTH latent groups via
                    # vmap: batch statistics stay per-group (each vmap
                    # instance normalizes over its own 64 samples, so
                    # the math is identical to two separate applies —
                    # the reference's DisableBatchNormStats semantics
                    # hold: both groups read frozen running stats and
                    # the mutations are discarded), while XLA sees one
                    # conv stack at batch 2B instead of two at B.
                    zwm = P.fn_inp(state["fn_inp"],
                                   jax.lax.stop_gradient(z))
                    both = jax.vmap(
                        lambda zi: self.G.apply(
                            {"params": gp,
                             "batch_stats": gvars["batch_stats"]},
                            zi, train=True, mutable=["batch_stats"])[0]
                    )(jnp.stack([z, zwm]))
                    fake2, gxwm = both[0], both[1]
                else:
                    fake2, _ = self.G.apply(
                        {"params": gp, "batch_stats": gvars["batch_stats"]},
                        z, train=True, mutable=["batch_stats"])  # discarded
                gen_logits, spmut = self.D.apply(
                    {"params": dvars["params"], "spectral": dvars["spectral"]},
                    fake2, update_sn=True, mutable=["spectral"])
                loss_a = -jnp.mean(gen_logits)
                total = loss_a
                aux = {"G/Adv": loss_a}
                if P.bbox:
                    ywm = jax.lax.stop_gradient(
                        P.fn_out(state["fn_out"], jax.lax.stop_gradient(fake2)))
                    loss_w = P.loss_fn(gxwm, ywm)
                    total = total + P.lam * loss_w
                    aux[f"P/{P.loss_name.upper()}"] = loss_w
                if P.wbox:
                    loss_s = P.wbox_loss(state, gp)
                    total = total + loss_s
                    aux["P/SignLoss"] = loss_s
                return total, (aux, spmut["spectral"])

            (loss_total, (aux, new_sp)), ggrads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(gvars["params"])
            updates, new_opt_g = self.optG.update(
                ggrads, state["optG"], gvars["params"])
            gvars["params"] = optax.apply_updates(gvars["params"], updates)
            dvars["spectral"] = new_sp
            state = dict(state, optG=new_opt_g)
            metrics["G/Sum"] = loss_total
            metrics.update(aux)

        state = dict(state, G=gvars, D=dvars, step=state["step"] + 1)
        return state, metrics
