"""CycleGAN: unpaired translation with history pools and LR decay.

Functional re-design of reference models/cyclegan.py:

* GA/GB ResNet generators (affine InstanceNorm — the white-box signature
  carrier) and DA/DB PatchGAN discriminators; joint Adam over both Gs
  and both Ds (checkpoint keys GA/GB/DA/DB/optG/optD);
* LSGAN MSE adversarial + lambda_A/lambda_B L1 cycle + lambda_idt
  identity losses;
* 50-image **history pools** (reference models/util.py:5-35) as carried
  state with fixed-shape buffers: fill phase appends, full phase swaps a
  random subset with probability 1/2 per incoming image (scatter with
  mode='drop' handles the no-op lanes), checkpointed under poolA/poolB;
* **linear LR decay** to 0 over the second half of the epoch schedule
  (reference LambdaLR, models/cyclegan.py:50-57) — computed inside the
  compiled step from the carried step counter (epoch = step // freq),
  with scheduler bookkeeping checkpointed under schG/schD for schema
  parity; frozen under attack_mode (image_translation.py:95-98).

Black-box wiring (image_translation.py:70-74): input_var=real_B,
output_var=fake_A, target=GB; data in [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from iprgan_tpu.models.base import Protection, State, make_optimizer
from iprgan_tpu.registry import MODELS, NETWORKS


def pool_query(pool, images, rng, pool_size: int):
    """History-pool query: returns (images_for_D, new_pool).

    Fill phase (counts < pool_size): append incoming, return incoming.
    Full phase: with p=1/2 per image, return a random pool entry and
    replace it with the incoming image; otherwise return the incoming.
    """
    b = images.shape[0]
    if b > pool_size:
        raise ValueError(
            f"pool_size {pool_size} must be >= the (global) batch {b}: "
            "each incoming image needs a distinct candidate slot")
    counts = pool["counts"]
    k1, k2 = jax.random.split(rng)
    swap_coin = jax.random.uniform(k1, (b,)) > 0.5
    rand_idx = jax.random.permutation(k2, pool_size)[:b]

    fill_idx = counts + jnp.arange(b)
    filling = fill_idx < pool_size
    swapping = jnp.logical_and(~filling, swap_coin)

    pool_imgs = pool["images"]
    returned = jnp.where(swapping[:, None, None, None],
                         pool_imgs[rand_idx], images)
    # scatter destinations: fill slot, swap slot, or dropped (OOB)
    dst = jnp.where(filling, fill_idx,
                    jnp.where(swapping, rand_idx, pool_size))
    new_imgs = pool_imgs.at[dst].set(images, mode="drop")
    new_counts = counts + jnp.sum(filling.astype(counts.dtype))
    return returned, {"images": new_imgs, "counts": new_counts}


@MODELS.register("CycleGAN")
class CycleGAN:
    normalized = True
    state_keys = ("GA", "GB", "DA", "DB", "optG", "optD",
                  "schG", "schD", "poolA", "poolB")

    def __init__(self, config, protection_config=None, hparam=None,
                 image_size: int = 128, dtype=None):
        self.config = config
        fn_g = NETWORKS(config.G)
        fn_d = NETWORKS(config.D)
        self.GA = fn_g(dtype=dtype)
        self.GB = fn_g(dtype=dtype)
        self.DA = fn_d(dtype=dtype)
        self.DB = fn_d(dtype=dtype)
        self.pool_size = config.get("pool_size", 50)
        self.lambda_A = config.lambda_A
        self.lambda_B = config.lambda_B
        self.lambda_idt = config.lambda_idt
        self.optG = make_optimizer(config.opt, config.opt_param)
        self.optD = make_optimizer(config.opt, config.opt_param)
        self.base_lr = float(config.opt_param.lr)
        # epoch count for the decay schedule (set by the experiment:
        # model.epoch = iteration // log.freq, image_translation.py:44)
        self.epoch = config.get("epoch", 0) or 0
        self.steps_per_epoch = config.get("steps_per_epoch", 0) or 0
        self.schedule_on = bool(config.get("schedule_on", True))
        self.protection = Protection(protection_config, self.normalized)
        hparam = hparam or {}
        self.d_iter = hparam.get("d_iter", 1) or 1
        self.g_iter = hparam.get("g_iter", 1) or 1
        self.image_size = image_size
        self.wbox_target = "GB"

    # -- state ------------------------------------------------------------
    def init_state(self, rng) -> State:
        ka, kb, kda, kdb, kp = jax.random.split(rng, 5)
        s = self.image_size
        x = jnp.zeros((2, s, s, 3), jnp.float32)
        ga = self.GA.init(ka, x)
        gb = self.GB.init(kb, x)
        da = self.DA.init(kda, x)
        db = self.DB.init(kdb, x)

        gb_params, signs = self.protection.embed(gb["params"])
        gb = dict(gb, params=gb_params)

        g_params = {"GA": ga["params"], "GB": gb["params"]}
        d_params = {"DA": da["params"], "DB": db["params"]}
        empty_pool = {
            "images": jnp.zeros((self.pool_size, s, s, 3), jnp.float32),
            "counts": jnp.int32(0),
        }
        state: State = {
            "GA": dict(ga), "GB": dict(gb),
            "DA": dict(da), "DB": dict(db),
            "optG": self.optG.init(g_params),
            "optD": self.optD.init(d_params),
            "schG": {"last_epoch": jnp.int32(0)},
            "schD": {"last_epoch": jnp.int32(0)},
            "poolA": dict(empty_pool),
            "poolB": dict(empty_pool),
            "step": jnp.int32(0),
        }
        if signs is not None:
            state["sign"] = signs
        self.protection.init_buffers(state, kp)
        return state

    # -- eval -------------------------------------------------------------
    def generate(self, state: State, real_b, train: bool = False):
        """B -> A translation (the protected generator GB)."""
        return self.GB.apply({"params": state["GB"]["params"]}, real_b)

    def generate_ab(self, state: State, real_a):
        return self.GA.apply({"params": state["GA"]["params"]}, real_a)

    def transform_latent(self, state: State, real_b):
        return self.protection.fn_inp(state["fn_inp"], real_b)

    def transform_output(self, state: State, fake_a):
        return self.protection.fn_out(state["fn_out"], fake_a)

    # -- lr schedule -------------------------------------------------------
    def _lr_at(self, step):
        """LambdaLR linear decay: factor(e) = 1 - max(0, e - half)/half,
        stepped once per epoch (first step() lands at epoch boundary 2)."""
        if not self.schedule_on or self.epoch == 0 or \
                self.steps_per_epoch == 0:
            return self.base_lr, jnp.int32(0)
        half = self.epoch // 2
        epochs_done = jnp.maximum((step - 1) // self.steps_per_epoch, 0)
        factor = 1.0 - jnp.maximum(0, epochs_done - half) / half
        return self.base_lr * factor, epochs_done.astype(jnp.int32)

    def _set_lr(self, opt_state, lr):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state

    # -- train ------------------------------------------------------------
    def train_step(self, state: State, batch, rng):
        """``batch['real_A']/['real_B']``: (g_iter, B, H, W, C) in [-1,1].
        G update then pool-mediated D update
        (reference image_translation.py:100-112)."""
        P = self.protection
        mse = lambda x, t: jnp.mean((x - t) ** 2)  # noqa: E731
        l1 = lambda x, y: jnp.mean(jnp.abs(x - y))  # noqa: E731

        lr, epochs_done = self._lr_at(state["step"] + 1)
        metrics = {"LR": jnp.asarray(lr, jnp.float32)}
        fake_a = fake_b = real_a = real_b = None

        for g in range(self.g_iter):
            real_a = batch["real_A"][g]
            real_b = batch["real_B"][g]

            def g_loss(params):
                # Both nets are purely per-sample (conv + InstanceNorm),
                # so independent applies of the same net batch exactly:
                # at the reference's bsz-1 workload this turns 6-7
                # batch-1 generator calls into 4 calls at batch 2-3,
                # which is the difference between half-empty and fuller
                # MXU tiles (measured on chip; README perf section).
                ga, gb = params["GA"], params["GB"]
                b = real_a.shape[0]
                if P.bbox:
                    xwm = P.fn_inp(state["fn_inp"],
                                   jax.lax.stop_gradient(real_b))
                # round 1 — inputs independent of any generator output
                if self.lambda_idt > 0:
                    out_a = self.GA.apply(
                        {"params": ga},
                        jnp.concatenate([real_a, real_b], axis=0))
                    fb, idt_a = out_a[:b], out_a[b:]
                    gb_in = [real_b, real_a] + ([xwm] if P.bbox else [])
                    out_b = self.GB.apply(
                        {"params": gb}, jnp.concatenate(gb_in, axis=0))
                    fa, idt_b = out_b[:b], out_b[b:2 * b]
                    gxwm = out_b[2 * b:] if P.bbox else None
                else:
                    fb = self.GA.apply({"params": ga}, real_a)
                    gb_in = [real_b] + ([xwm] if P.bbox else [])
                    out_b = self.GB.apply(
                        {"params": gb}, jnp.concatenate(gb_in, axis=0))
                    fa = out_b[:b]
                    gxwm = out_b[b:] if P.bbox else None
                    idt_a = idt_b = None
                # round 2 — cycle reconstructions depend on round 1
                rec_a = self.GB.apply({"params": gb}, fb)
                rec_b = self.GA.apply({"params": ga}, fa)
                ga_logits = self.DA.apply(
                    {"params": state["DA"]["params"]}, fb)
                gb_logits = self.DB.apply(
                    {"params": state["DB"]["params"]}, fa)

                loss_ga = mse(ga_logits, 1.0)
                loss_gb = mse(gb_logits, 1.0)
                loss_cyc_a = l1(rec_a, real_a) * self.lambda_A
                loss_cyc_b = l1(rec_b, real_b) * self.lambda_B
                total = loss_ga + loss_gb + loss_cyc_a + loss_cyc_b
                if self.lambda_idt > 0:
                    loss_idt_a = l1(idt_a, real_b) * self.lambda_B
                    loss_idt_b = l1(idt_b, real_a) * self.lambda_A
                    total = total + self.lambda_idt * (loss_idt_a +
                                                       loss_idt_b)
                else:
                    loss_idt_a = loss_idt_b = jnp.float32(0.0)

                aux = {"G/A": loss_ga, "G/B": loss_gb,
                       "G/CycA": loss_cyc_a, "G/CycB": loss_cyc_b,
                       "G/IdtA": loss_idt_a, "G/IdtB": loss_idt_b,
                       "_fa": fa, "_fb": fb}
                if P.bbox:
                    ywm = jax.lax.stop_gradient(
                        P.fn_out(state["fn_out"], jax.lax.stop_gradient(fa)))
                    loss_w = P.loss_fn(gxwm, ywm)
                    total = total + P.lam * loss_w
                    aux[f"P/{P.loss_name.upper()}"] = loss_w
                if P.wbox:
                    loss_s = P.wbox_loss(state, gb)
                    total = total + loss_s
                    aux["P/SignLoss"] = loss_s
                return total, aux

            g_params = {"GA": state["GA"]["params"],
                        "GB": state["GB"]["params"]}
            opt_g = self._set_lr(state["optG"], lr)
            (total, aux), grads = jax.value_and_grad(g_loss, has_aux=True)(
                g_params)
            updates, new_opt_g = self.optG.update(grads, opt_g, g_params)
            new_g = optax.apply_updates(g_params, updates)
            fake_a = jax.lax.stop_gradient(aux.pop("_fa"))
            fake_b = jax.lax.stop_gradient(aux.pop("_fb"))
            state = dict(state,
                         GA={"params": new_g["GA"]},
                         GB={"params": new_g["GB"]},
                         optG=new_opt_g)
            metrics["G/Sum"] = total
            metrics.update(aux)

        for _ in range(self.d_iter):
            rng, kpa, kpb = jax.random.split(rng, 3)
            fa_pool, new_pool_a = pool_query(
                state["poolA"], fake_a, kpa, self.pool_size)
            fb_pool, new_pool_b = pool_query(
                state["poolB"], fake_b, kpb, self.pool_size)
            state = dict(state, poolA=new_pool_a, poolB=new_pool_b)

            def d_loss(params):
                # one fused forward per discriminator over [real; pool]
                # (PatchGAN is per-sample: conv + non-affine InstanceNorm)
                da, db = params["DA"], params["DB"]
                b = real_a.shape[0]
                db_out = self.DB.apply(
                    {"params": db},
                    jnp.concatenate([real_a, fa_pool], axis=0))
                ra_logits, fa_logits = db_out[:b], db_out[b:]
                da_out = self.DA.apply(
                    {"params": da},
                    jnp.concatenate([real_b, fb_pool], axis=0))
                rb_logits, fb_logits = da_out[:b], da_out[b:]
                loss_dra = mse(rb_logits, 1.0)
                loss_dfa = mse(fb_logits, 0.0)
                loss_da = (loss_dra + loss_dfa) * 0.5
                loss_drb = mse(ra_logits, 1.0)
                loss_dfb = mse(fa_logits, 0.0)
                loss_db = (loss_drb + loss_dfb) * 0.5
                aux = {"D/RealA": loss_dra, "D/FakeA": loss_dfa,
                       "D/SumA": loss_da, "D/RealB": loss_drb,
                       "D/FakeB": loss_dfb, "D/SumB": loss_db}
                return loss_da + loss_db, aux

            d_params = {"DA": state["DA"]["params"],
                        "DB": state["DB"]["params"]}
            opt_d = self._set_lr(state["optD"], lr)
            (_, daux), dgrads = jax.value_and_grad(d_loss, has_aux=True)(
                d_params)
            updates, new_opt_d = self.optD.update(dgrads, opt_d, d_params)
            new_d = optax.apply_updates(d_params, updates)
            state = dict(state,
                         DA={"params": new_d["DA"]},
                         DB={"params": new_d["DB"]},
                         optD=new_opt_d)
            metrics.update(daux)

        state = dict(state,
                     schG={"last_epoch": epochs_done},
                     schD={"last_epoch": epochs_done},
                     step=state["step"] + 1)
        return state, metrics
