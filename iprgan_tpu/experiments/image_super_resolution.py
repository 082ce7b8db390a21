"""Super-resolution experiment (SRGAN driver).

Reference: experiments/image_super_resolution.py. Two-phase training
(pixel-MSE pretrain, then perceptual GAN), pretrain snapshot at the
phase boundary, halfway lr drop inside the compiled step, and evaluation
with Y-channel PSNR/SSIM (4-px crop) plus black-box/white-box metrics.

Data is host-streamed (decode + random crop on host, with a background
prefetch thread producing the next chunk while the device trains on the
current one); the bicubic 1/4 downscale runs ON DEVICE inside the
compiled chunk (ops/resize.bicubic_down4, PIL-matching numerics) so the
1-core host ships only HR uint8 crops. Evaluation keeps the reference's
host PIL bicubic for metric parity.

``dataset.park: true`` switches to the fully device-resident path for
corpora that fit HBM (uniform image shape required): the uint8 stack is
parked once, random crops are sampled inside the chunk
(data/parked.py), and the host ships nothing per step.
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from iprgan_tpu.config import Config
from iprgan_tpu.data import get_dataset
from iprgan_tpu.data.stream import PrefetchLoader
from iprgan_tpu.experiments.base import Experiment, dtype_of
from iprgan_tpu.ops.pdq import compute_matching_prob
from iprgan_tpu.ops.quality import psnr_uint8, rgb_to_luma_uint8, ssim_uint8
from iprgan_tpu.ops.ssim import ssim as ssim_fn
from iprgan_tpu.protection import make_transform
import iprgan_tpu.models  # noqa: F401
from iprgan_tpu.registry import EXPERIMENTS, MODELS
from iprgan_tpu.utils import ImageWriter
from iprgan_tpu.utils.checkpoint import PRETRAIN_NAME


@EXPERIMENTS.register("ImageSuperResolution")
class ImageSuperResolution(Experiment):

    def __init__(self, config):
        print("IMAGE SUPER-RESOLUTION EXPERIMENT\n")
        super().__init__(config)
        self.configure_dataset()
        self.configure_model()

    # -- configuration -----------------------------------------------------
    def configure_dataset(self):
        print("*** DATASET ***")
        name = self.config.dataset.name
        kwargs = {k: v for k, v in self.config.dataset.to_dict().items()
                  if k not in ("name", "park")}
        self.dataset = get_dataset(name, **kwargs)
        self._data_rng = np.random.default_rng(self.config.seed)
        self._loader = None  # built lazily once hparams are known
        # dataset.park: true -> decode once, park the uint8 stack in HBM,
        # sample crops on device inside the chunk (data/parked.py) —
        # zero host->device traffic during training.
        self._parked = bool(self.config.dataset.get("park", False))
        if self._parked:
            self.data_device = self.pctx.replicate(
                jnp.asarray(self.dataset.park_images()))
        print(f"Name: {name.upper()}")
        print(f"# samples: {len(self.dataset)}"
              + ("  [parked in HBM]" if self._parked else "") + "\n")

    def configure_model(self):
        model_conf = self.config.model
        protection = self.config.get("protection", None)
        self.model = MODELS(model_conf.type)(
            model_conf,
            protection_config=protection,
            hparam=self.config.hparam.to_dict(),
            image_size=self.config.dataset.size,
            dtype=dtype_of(self.config),
        )
        self.bbox = self.model.protection.bbox is not None
        self.wbox = self.model.protection.wbox is not None

        self.rng = jax.random.PRNGKey(self.config.seed)
        self.rng, k = jax.random.split(self.rng)
        self.state = self.pctx.replicate(
            jax.device_get(self.model.init_state(k)))
        self._chunk_fns = {}
        self._gen_eval = jax.jit(self.model.generate)

        print("*** MODEL ***")
        print(f"G: {model_conf.G}  D: {model_conf.D}  V: {model_conf.V}")
        if self.bbox:
            print(f"BBOX lambda={self.model.protection.lam} "
                  f"loss={self.model.protection.loss_name}")
        if self.wbox:
            print(f"WBOX gamma0={self.model.protection.gamma_0} "
                  f"sig={self.model.protection.string!r}")
        print()

    # -- training ----------------------------------------------------------
    def _produce(self, n: int):
        # hr_only: the bicubic 1/4 runs on device inside the chunk
        # (ops/resize.bicubic_down4); host does decode + crop only.
        _, hr = self.dataset.sample_batches(
            self._data_rng, n, self.model.g_iter, self.config.hparam.bsz,
            workers=self.config.resource.get("worker", 0), hr_only=True)
        return hr

    def _get_loader(self):
        if self._loader is None:
            self._loader = PrefetchLoader(self._produce)
        return self._loader

    def _fetch(self, n: int):
        """Get an n-step chunk, keeping one same-size chunk in flight so
        the host data pipeline overlaps device compute."""
        loader = self._get_loader()
        if getattr(self, "_pending", None) is None:
            loader.request(n)
        elif self._pending != n:
            loader.get()  # drain a stale speculative chunk
            loader.request(n)
        data = loader.get()
        loader.request(n)  # speculate the next chunk
        self._pending = n
        return data

    def _chunk_fn(self, n: int, phase: str):
        key = (n, phase)
        if key in self._chunk_fns:
            return self._chunk_fns[key]
        model = self.model
        pctx = self.pctx
        step_fn = (model.train_step_pretrain if phase == "pre"
                   else model.train_step_gan)

        from iprgan_tpu.ops.resize import bicubic_down4

        if self._parked:
            from iprgan_tpu.data.parked import crop_batch

            g_iter = model.g_iter
            bsz = self.config.hparam.bsz
            s = self.config.dataset.size

            @partial(jax.jit, donate_argnums=(0,))
            def chunk(state, data_u8, rng):
                def body(state, key):
                    kc, kstep = jax.random.split(key)
                    crops = crop_batch(data_u8, kc, g_iter * bsz, s)
                    hr_f = pctx.constrain_batch(
                        crops.reshape(g_iter, bsz, s, s, 3),
                        axis=1).astype(jnp.float32) / 255.0
                    batch = {"lr": bicubic_down4(hr_f), "hr": hr_f}
                    return step_fn(state, batch, kstep)

                keys = jax.random.split(rng, n)
                return jax.lax.scan(body, state, keys)
        else:
            @partial(jax.jit, donate_argnums=(0,))
            def chunk(state, hr_u8, rng):
                def body(state, xs):
                    hr_i, k = xs
                    hr_f = pctx.constrain_batch(
                        hr_i, axis=1).astype(jnp.float32) / 255.0
                    batch = {"lr": bicubic_down4(hr_f), "hr": hr_f}
                    return step_fn(state, batch, k)

                keys = jax.random.split(rng, n)
                return jax.lax.scan(body, state, (hr_u8, keys))

        self._chunk_fns[key] = chunk
        return chunk

    def train_chunk(self, n: int):
        # never straddle the pretrain/GAN boundary or the halfway lr drop
        step = int(self.state["step"]) + 1
        pre = self.model.pretrain_iter
        for boundary in (pre, self.model.halfway):
            if step <= boundary:
                n = min(n, boundary - step + 1)
        phase = "pre" if step <= pre else "gan"

        self.rng, k = jax.random.split(self.rng)
        if self._parked:
            self.state, metrics = self._chunk_fn(n, phase)(
                self.state, self.data_device, k)
        else:
            hr = self._fetch(n)
            self.state, metrics = self._chunk_fn(n, phase)(
                self.state, self.pctx.shard_batch(hr, axis=2), k)
        out = {key: np.asarray(v) for key, v in metrics.items()}

        if step <= pre <= step + n - 1:
            # snapshot at the phase boundary (reference :153-155)
            self.save_checkpoint(pre, fname=PRETRAIN_NAME)
        return out

    # -- checkpointing -----------------------------------------------------
    def periodic_checkpoint(self, step: int):
        if not hasattr(self, "fixed_lr"):
            lr, _ = self.dataset.sample_batches(
                self._data_rng, 1, 1, self.config.hparam.bsz)
            lr = jnp.asarray(lr[0, 0], jnp.float32) / 255.0
            if self.bbox:
                half = lr[: self.config.hparam.bsz // 2]
                xwm = self.model.transform_latent(self.state, half)
                lr = jnp.concatenate([half, xwm], axis=0)
            self.fixed_lr = lr
        sr = np.clip(np.asarray(
            self._gen_eval(self.state, self.fixed_lr)), 0, 1)
        self.logger.save_images(sr, step)
        self.save_checkpoint(step)

    # -- evaluation --------------------------------------------------------
    def _masker(self):
        conf = Config(self.model.protection.bbox.fn_out.to_dict())
        conf["opaque"] = True
        t = make_transform(conf, normalized=True)
        buf = t.init_buffers(jax.random.PRNGKey(0))
        return lambda x: np.asarray(t.apply_mask(buf, jnp.asarray(x)))

    def evaluate(self, fpath: str):
        cfg = self.config
        apply_mask = self._masker() if self.bbox else None

        print("*** EVALUATION ***")
        if self.wbox:
            ber = self.model.protection.ber(
                self.state, self.state["G"]["params"])
        else:
            ber = float("nan")

        sample_dir = cfg.get("sample_dir", None)
        writer = ImageWriter(sample_dir) if sample_dir else None

        metrics = {}
        for data in cfg.evaluation.data:
            kwargs = {k: v for k, v in data.items() if k != "name"}
            kwargs.pop("bsz", None)
            kwargs.setdefault("size", -1)
            ds = get_dataset(data["name"], **kwargs)
            stats = {"psnr": [], "ssim": []}
            if self.bbox:
                stats.update(q=[], p=[], m=[])
            for lr_u8, hr_u8 in ds.iter_eval():
                lr_img = jnp.asarray(lr_u8, jnp.float32) / 255.0
                sr = np.clip(np.asarray(
                    self.model.generate(self.state, lr_img)), 0, 1)
                hr = np.asarray(hr_u8, np.float32) / 255.0

                if writer:
                    for img in sr:
                        writer(img, suffix="gen")

                if self.bbox:
                    zwm = self.model.transform_latent(self.state, lr_img)
                    xwm = np.clip(np.asarray(
                        self.model.generate(self.state, zwm)), 0, 1)
                    ywm = np.asarray(self.model.transform_output(
                        self.state, jnp.asarray(sr)))
                    if writer:
                        for img in np.clip(np.asarray(zwm), 0, 1):
                            writer(img, suffix="z")
                        for img in xwm:
                            writer(img, suffix="wm")
                    wm_x = apply_mask(xwm)
                    wm_y = apply_mask(ywm)
                    q = ssim_fn(jnp.asarray(wm_x), jnp.asarray(wm_y),
                                data_range=1.0, size_average=False)
                    p = compute_matching_prob(wm_x, wm_y)
                    stats["q"].append(np.asarray(q))
                    stats["p"].append(p)
                    stats["m"].append(p < cfg.evaluation.p_thres)

                # Y-channel, 4-px crop (reference :237-244)
                sr_y = rgb_to_luma_uint8(sr[0])[4:-4, 4:-4]
                hr_y = rgb_to_luma_uint8(hr[0])[4:-4, 4:-4]
                stats["psnr"].append(psnr_uint8(hr_y, sr_y))
                stats["ssim"].append(ssim_uint8(hr_y, sr_y))

            psnr = float(np.mean(stats["psnr"]))
            ssim_v = float(np.mean(stats["ssim"]))
            entry = {"PSNR": f"{psnr:.2f}", "SSIM": f"{ssim_v:.4f}"}

            if self.bbox:
                q_wm = float(np.mean(np.concatenate(stats["q"])))
                p_value = float(np.mean(np.concatenate(stats["p"])))
                match = int(np.sum(np.concatenate(stats["m"])))
            if self.wbox:
                entry["WBOX"] = f"{ber:.4f}"
            if self.bbox:
                entry["BBOX"] = {
                    "Q_WM": f"{q_wm:.4f}",
                    "P": f"{p_value:.3e}",
                    "MATCH": f"{match:d}/{len(ds):d}",
                }
            metrics[data["name"]] = entry
            print(f"Dataset: {data['name']}  PSNR {psnr:.2f} "
                  f"SSIM {ssim_v:.4f}  WBOX {ber:.4f}")

        # atomic: prune/sign_flip resume sweeps treat an existing per-pct
        # JSON as done, so a kill mid-write must not leave a truncated file
        with open(fpath + ".tmp", "w") as f:
            json.dump(metrics, f, indent=2, sort_keys=True)
        os.replace(fpath + ".tmp", fpath)
        return metrics
