"""SRGAN: two-phase super-resolution GAN with composed protection.

Functional re-design of reference models/srgan.py +
experiments/image_super_resolution.py:84-113 semantics:

* **pretrain phase** (step <= pretrain_iter): G loss = pixel MSE(sr, hr);
  black-box inhibited, white-box sign loss active;
* **GAN phase**: G loss = VGG-feature MSE + 1e-3 * BCE adversarial
  (+ lambda*LossW + LossS), then D updates (BCE real/fake) on the same
  hr/sr pair;
* **halfway lr drop**: both optimizers x0.1 from global step
  pretrain + iteration/2 onward (only when pretrain_iter > 0) — here a
  pure function of the carried step counter, so it is resume-safe and
  compiles into the step.

The frozen VGG19 feature extractor is *not* part of the checkpoint
(the reference registers only G/D/optG/optD, models/srgan.py:30-33);
its variables are held by the model object and passed into the jitted
step as a constant argument. Data (lr, hr) arrives in [0,1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from iprgan_tpu.models.base import Protection, State, make_optimizer
from iprgan_tpu.registry import MODELS, NETWORKS


def _bce_logits(logits, target: float):
    """F.binary_cross_entropy_with_logits against a constant target."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target +
        jnp.log1p(jnp.exp(-jnp.abs(logits))))


@MODELS.register("SRGAN")
class SRGAN:
    normalized = False  # SR data lives in [0,1] (image_super_resolution.py:63)
    state_keys = ("G", "D", "optG", "optD")

    def __init__(self, config, protection_config=None, hparam=None,
                 image_size: int = 96, dtype=None):
        self.config = config
        self.G = NETWORKS(config.G)(dtype=dtype)
        self.D = NETWORKS(config.D)(dtype=dtype)
        self.V = NETWORKS(config.V)(dtype=dtype)
        self.optG = make_optimizer(config.opt, config.opt_param)
        self.optD = make_optimizer(config.opt, config.opt_param)
        self.base_lr = float(config.opt_param.lr)
        self.protection = Protection(protection_config, self.normalized)
        hparam = hparam or {}
        self.d_iter = hparam.get("d_iter", 1) or 1
        self.g_iter = hparam.get("g_iter", 1) or 1
        self.pretrain_iter = hparam.get("pretrain_iter", 0) or 0
        self.iteration = hparam.get("iteration", 0) or 0
        self.halfway = self.pretrain_iter + self.iteration // 2
        self.image_size = image_size
        self.v_variables = self._init_vgg(config)

    def _init_vgg(self, config):
        """Frozen perceptual network; pretrained weights from
        ``model.V_weights`` / $IPRGAN_VGG19_WEIGHTS if provided."""
        import os

        from iprgan_tpu.networks.vgg import load_vgg19_features

        path = None
        if hasattr(config, "get"):
            path = config.get("V_weights", None)
        path = path or os.environ.get("IPRGAN_VGG19_WEIGHTS")
        if path and os.path.exists(path):
            return load_vgg19_features(path, self.V)
        print("WARNING: no VGG19 weights found (set model.V_weights or "
              "$IPRGAN_VGG19_WEIGHTS); perceptual loss uses a fixed "
              "random init.")
        dummy = jnp.zeros((1, self.image_size, self.image_size, 3))
        return self.V.init(jax.random.PRNGKey(19), dummy)

    # -- state ------------------------------------------------------------
    def init_state(self, rng) -> State:
        kg, kd, kp = jax.random.split(rng, 3)
        s = self.image_size
        lr_img = jnp.zeros((2, s // 4, s // 4, 3), jnp.float32)
        hr_img = jnp.zeros((2, s, s, 3), jnp.float32)
        gvars = self.G.init(kg, lr_img, train=False)
        dvars = self.D.init(kd, hr_img, train=False)

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

    # -- eval -------------------------------------------------------------
    def generate(self, state: State, lr_img, train: bool = False):
        return self.G.apply(
            {"params": state["G"]["params"],
             "batch_stats": state["G"]["batch_stats"]},
            lr_img, train=False)

    def transform_latent(self, state: State, lr_img):
        """Input trigger on the low-res image (input_var='low_res')."""
        return self.protection.fn_inp(state["fn_inp"], lr_img)

    def transform_output(self, state: State, sr_img):
        return self.protection.fn_out(state["fn_out"], sr_img)

    # -- lr schedule -------------------------------------------------------
    def _lr_at(self, step):
        if self.pretrain_iter > 0:
            factor = jnp.where(step >= self.halfway, 0.1, 1.0)
        else:
            factor = 1.0
        return self.base_lr * factor

    def _set_lr(self, opt_state, step):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            self._lr_at(step), jnp.float32)
        return opt_state

    # -- train ------------------------------------------------------------
    def train_step_pretrain(self, state: State, batch, rng):
        """Pixel-MSE pretrain; bbox inhibited, wbox active
        (reference image_super_resolution.py:92-97)."""
        P = self.protection
        lr_img, hr_img = batch["lr"][0], batch["hr"][0]
        gbs = state["G"]["batch_stats"]

        def loss_fn(gp):
            sr, gmut = self.G.apply(
                {"params": gp, "batch_stats": gbs}, lr_img, train=True,
                mutable=["batch_stats"])
            loss = jnp.mean((sr - hr_img) ** 2)
            aux = {"G/MSE": loss, "_gbs": gmut["batch_stats"]}
            total = loss
            if P.wbox:
                loss_s = P.wbox_loss(state, gp)
                total = total + loss_s
                aux["P/SignLoss"] = loss_s
            return total, aux

        opt_state = self._set_lr(state["optG"], state["step"] + 1)
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["G"]["params"])
        updates, new_opt = self.optG.update(grads, opt_state,
                                            state["G"]["params"])
        new_gp = optax.apply_updates(state["G"]["params"], updates)
        gbs_new = aux.pop("_gbs")
        metrics = dict(aux)
        metrics["G/Sum"] = total
        state = dict(state, G={"params": new_gp, "batch_stats": gbs_new},
                     optG=new_opt, step=state["step"] + 1)
        return state, metrics

    def train_step_gan(self, state: State, batch, rng):
        """GAN phase: g updates (perceptual + adversarial + protection),
        then d updates on the last (hr, sr)."""
        P = self.protection
        gvars = dict(state["G"])
        dvars = dict(state["D"])
        metrics = {}
        sr_last = hr_last = None

        for g in range(self.g_iter):
            lr_img, hr_img = batch["lr"][g], batch["hr"][g]

            def g_loss(gp):
                # NOTE: the vmapped fused-forward used by DCGAN/VAE/
                # CycleGAN was measured on chip for this step and
                # REJECTED: f32 47.6 vs 57.5 steps/s (-17%), bf16 flat —
                # batching SRResNet's 24px convs to 2B costs more in
                # layout than it wins in occupancy. Two applies kept.
                sr, gmut = self.G.apply(
                    {"params": gp, "batch_stats": gvars["batch_stats"]},
                    lr_img, train=True, mutable=["batch_stats"])
                logits, dmut = self.D.apply(
                    {"params": dvars["params"],
                     "batch_stats": dvars["batch_stats"]},
                    sr, train=True, mutable=["batch_stats"])
                loss_a = _bce_logits(logits, 1.0)
                sr_feat = self.V.apply(self.v_variables, sr)
                hr_feat = jax.lax.stop_gradient(
                    self.V.apply(self.v_variables, hr_img))
                loss_x = jnp.mean((sr_feat - hr_feat) ** 2)
                total = loss_x + 1e-3 * loss_a
                aux = {"G/Adv": loss_a, "G/Con": loss_x, "_sr": sr,
                       "_gbs": gmut["batch_stats"],
                       "_dbs": dmut["batch_stats"]}
                if P.bbox:
                    xwm = P.fn_inp(state["fn_inp"],
                                   jax.lax.stop_gradient(lr_img))
                    ywm = jax.lax.stop_gradient(
                        P.fn_out(state["fn_out"], jax.lax.stop_gradient(sr)))
                    gxwm, _ = self.G.apply(
                        {"params": gp, "batch_stats": gvars["batch_stats"]},
                        xwm, train=True, mutable=["batch_stats"])  # frozen
                    loss_w = P.loss_fn(gxwm, ywm)
                    total = total + P.lam * loss_w
                    aux[f"P/{P.loss_name.upper()}"] = loss_w
                if P.wbox:
                    loss_s = P.wbox_loss(state, gp)
                    total = total + loss_s
                    aux["P/SignLoss"] = loss_s
                return total, aux

            opt_g = self._set_lr(state["optG"], state["step"] + 1)
            (total, aux), grads = jax.value_and_grad(g_loss, has_aux=True)(
                gvars["params"])
            updates, new_opt_g = self.optG.update(grads, opt_g,
                                                  gvars["params"])
            gvars["params"] = optax.apply_updates(gvars["params"], updates)
            gvars["batch_stats"] = aux.pop("_gbs")
            dvars["batch_stats"] = aux.pop("_dbs")
            sr_last = jax.lax.stop_gradient(aux.pop("_sr"))
            hr_last = hr_img
            state = dict(state, optG=new_opt_g)
            metrics["G/Sum"] = total
            metrics.update(aux)

        for _ in range(self.d_iter):
            def d_loss(dp):
                logits_r, m1 = self.D.apply(
                    {"params": dp, "batch_stats": dvars["batch_stats"]},
                    hr_last, train=True, mutable=["batch_stats"])
                logits_f, m2 = self.D.apply(
                    {"params": dp, "batch_stats": m1["batch_stats"]},
                    sr_last, train=True, mutable=["batch_stats"])
                loss_r = _bce_logits(logits_r, 1.0)
                loss_f = _bce_logits(logits_f, 0.0)
                return loss_r + loss_f, (loss_r, loss_f, m2["batch_stats"])

            opt_d = self._set_lr(state["optD"], state["step"] + 1)
            (loss_d, (loss_r, loss_f, dbs_new)), dgrads = jax.value_and_grad(
                d_loss, has_aux=True)(dvars["params"])
            updates, new_opt_d = self.optD.update(dgrads, opt_d,
                                                  dvars["params"])
            dvars["params"] = optax.apply_updates(dvars["params"], updates)
            dvars["batch_stats"] = dbs_new
            state = dict(state, optD=new_opt_d)
            metrics.update({"D/Sum": loss_d, "D/Real": loss_r,
                            "D/Fake": loss_f})

        state = dict(state, G=gvars, D=dvars, step=state["step"] + 1)
        return state, metrics
