"""Image-translation experiment (CycleGAN driver).

Reference: experiments/image_translation.py. Converts the
epoch-denominated config to steps (iteration *= steps_per_epoch,
log.freq *= steps_per_epoch, model.epoch = iteration // log.freq), runs
per-epoch LR decay inside the compiled step, and evaluates by dumping
translated B->A frames for the external FCN scorer plus the
black-box/white-box ownership metrics (no FID here).
"""

from __future__ import annotations

import json
import math
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
from iprgan_tpu.ops.ssim import ssim as ssim_fn
from iprgan_tpu.protection import make_transform
import iprgan_tpu.models  # noqa: F401
from iprgan_tpu.registry import EXPERIMENTS, MODELS
from iprgan_tpu.utils import ImageWriter
from iprgan_tpu.utils.tb_writer import to_uint8


def _post(x):
    return (np.clip(np.asarray(x), -1.0, 1.0) + 1.0) / 2.0


@EXPERIMENTS.register("ImageTranslation")
class ImageTranslation(Experiment):

    def __init__(self, config):
        print("IMAGE TRANSLATION EXPERIMENT\n")
        super().__init__(config)
        self.configure_dataset()
        self.configure_model()

    # -- configuration -----------------------------------------------------
    def configure_dataset(self):
        print("*** DATASET ***")
        name = self.config.dataset.name
        kwargs = {k: v for k, v in self.config.dataset.to_dict().items()
                  if k not in ("name", "park")}
        self.dataset = get_dataset(name, test=False, **kwargs)
        self._data_rng = np.random.default_rng(self.config.seed)
        self._loader = None
        # dataset.park: true -> decode+resize once, park both sides'
        # uint8 stacks in HBM, sample crop+flip on device inside the
        # chunk (data/parked.py) — zero host->device traffic while
        # training. Cityscapes at load=143 parks in ~365 MB.
        self._parked = bool(self.config.dataset.get("park", False))
        if self._parked:
            a, b = self.dataset.park_images()
            self.data_a = self.pctx.replicate(jnp.asarray(a))
            self.data_b = self.pctx.replicate(jnp.asarray(b))
        print(f"Name: {name.upper()}")
        print(f"# samples: {len(self.dataset)}"
              + ("  [parked in HBM]" if self._parked else "") + "\n")

        # epoch -> step conversion (reference :38-40)
        n = math.ceil(len(self.dataset) / self.config.hparam.bsz)
        self.config.hparam.iteration *= n
        self.config.log.freq *= n
        self._steps_per_epoch = n

    def configure_model(self):
        model_conf = self.config.model
        # LR schedule denominations (reference :44)
        model_conf.epoch = (self.config.hparam.iteration //
                            self.config.log.freq)
        model_conf.steps_per_epoch = self.config.log.freq
        model_conf.schedule_on = self.config.get("attack_mode", None) is None

        protection = self.config.get("protection", None)
        self.model = MODELS(model_conf.type)(
            model_conf,
            protection_config=protection,
            hparam=self.config.hparam.to_dict(),
            image_size=self.config.dataset.crop,
            dtype=dtype_of(self.config),
        )
        self.bbox = self.model.protection.bbox is not None
        self.wbox = self.model.protection.wbox is not None

        self.rng = jax.random.PRNGKey(self.config.seed)
        self.rng, k = jax.random.split(self.rng)
        self.state = self.pctx.replicate(
            jax.device_get(self.model.init_state(k)))
        self._chunk_fns = {}
        self._gen_ba = jax.jit(self.model.generate)     # B -> A (GB)
        self._gen_ab = jax.jit(self.model.generate_ab)  # A -> B (GA)

        print("*** MODEL ***")
        print(f"G: {model_conf.G}  D: {model_conf.D}  "
              f"epochs: {model_conf.epoch}")
        if self.bbox:
            print(f"BBOX lambda={self.model.protection.lam}")
        if self.wbox:
            print(f"WBOX sig={self.model.protection.string!r}")
        print()

    # -- training ----------------------------------------------------------
    def _produce(self, n: int):
        return self.dataset.sample_batches(
            self._data_rng, n, self.model.g_iter, self.config.hparam.bsz)

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

    def _chunk_fn(self, n: int):
        if n in self._chunk_fns:
            return self._chunk_fns[n]
        model = self.model
        pctx = self.pctx

        if self._parked:
            from iprgan_tpu.data.parked import crop_batch

            g_iter = model.g_iter
            bsz = self.config.hparam.bsz
            c = self.config.dataset.crop

            @partial(jax.jit, donate_argnums=(0,))
            def chunk(state, a_stack, b_stack, rng):
                def sample(stack, key):
                    crops = crop_batch(stack, key, g_iter * bsz, c,
                                       flip=True)
                    crops = pctx.constrain_batch(
                        crops.reshape(g_iter, bsz, c, c, 3), axis=1)
                    return crops.astype(jnp.float32) / 127.5 - 1.0

                def body(state, key):
                    ka, kb, kstep = jax.random.split(key, 3)
                    batch = {"real_A": sample(a_stack, ka),
                             "real_B": sample(b_stack, kb)}
                    return model.train_step(state, batch, kstep)

                keys = jax.random.split(rng, n)
                return jax.lax.scan(body, state, keys)
        else:
            @partial(jax.jit, donate_argnums=(0,))
            def chunk(state, a_u8, b_u8, rng):
                def body(state, xs):
                    a_i, b_i, k = xs
                    batch = {
                        "real_A": pctx.constrain_batch(
                            a_i, axis=1).astype(jnp.float32) / 127.5 - 1.0,
                        "real_B": pctx.constrain_batch(
                            b_i, axis=1).astype(jnp.float32) / 127.5 - 1.0,
                    }
                    return model.train_step(state, batch, k)

                keys = jax.random.split(rng, n)
                return jax.lax.scan(body, state, (a_u8, b_u8, keys))

        self._chunk_fns[n] = chunk
        return chunk

    def train_chunk(self, n: int):
        self.rng, k = jax.random.split(self.rng)
        if self._parked:
            self.state, metrics = self._chunk_fn(n)(
                self.state, self.data_a, self.data_b, k)
        else:
            a, b = self._fetch(n)
            self.state, metrics = self._chunk_fn(n)(
                self.state, self.pctx.shard_batch(a, axis=2),
                self.pctx.shard_batch(b, axis=2), k)
        return {key: np.asarray(v) for key, v in metrics.items()}

    # -- checkpointing -----------------------------------------------------
    def periodic_checkpoint(self, step: int):
        if not hasattr(self, "fixed_A"):
            a, b = self.dataset.sample_batches(
                self._data_rng, 1, 1, self.config.hparam.bsz)
            a = jnp.asarray(a[0, 0], jnp.float32) / 127.5 - 1.0
            b = jnp.asarray(b[0, 0], jnp.float32) / 127.5 - 1.0
            if self.bbox:
                xwm = self.model.transform_latent(self.state, b)
                b = jnp.concatenate([b, xwm], axis=0)
            self.fixed_A, self.fixed_B = a, b
        fake_b = _post(self._gen_ab(self.state, self.fixed_A))
        fake_a = _post(self._gen_ba(self.state, self.fixed_B))
        n = min(len(fake_a), len(fake_b))
        samples = np.concatenate([fake_a[:n], fake_b[:n]], axis=0)
        self.logger.save_images(samples, step // self.config.log.freq)
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
                self.state, self.state["GB"]["params"])
        else:
            ber = float("nan")

        dirname = cfg.get("attack_mode", None) or "samples"
        img_dir_root = os.path.join(os.path.dirname(fpath) or ".", dirname)
        os.makedirs(img_dir_root, exist_ok=True)

        sample_dir = cfg.get("sample_dir", None)
        writer = ImageWriter(sample_dir) if sample_dir else None

        metrics = {}
        for data in cfg.evaluation.data:
            kwargs = {k: v for k, v in data.items() if k != "name"}
            kwargs.pop("bsz", None)
            ds = get_dataset(data["name"], test=True, **kwargs)
            img_dir = os.path.join(img_dir_root, data["name"])
            os.makedirs(img_dir, exist_ok=True)

            stats = {"q": [], "p": [], "m": []} if self.bbox else None
            count = 0
            for _, b_u8 in ds.iter_eval():
                real_b = jnp.asarray(b_u8, jnp.float32) / 127.5 - 1.0
                fake_a = _post(self._gen_ba(self.state, real_b))

                if writer:
                    for img in fake_a:
                        writer(img, suffix="gen")

                if self.bbox:
                    zwm = self.model.transform_latent(self.state, real_b)
                    xwm = _post(self._gen_ba(self.state, zwm))
                    ywm = _post(self.model.transform_output(
                        self.state, jnp.asarray(fake_a * 2.0 - 1.0)))
                    if writer:
                        for img in _post(zwm):
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

                # PNG dump for the external FCN scorer (reference :237)
                from PIL import Image

                Image.fromarray(to_uint8(fake_a[0])).save(
                    os.path.join(img_dir, f"{count}.png"))
                count += 1

            entry = {}
            if self.wbox:
                entry["WBOX"] = f"{ber:.4f}"
            if self.bbox:
                q_wm = float(np.mean(np.concatenate(stats["q"])))
                p_value = float(np.mean(np.concatenate(stats["p"])))
                match = int(np.sum(np.concatenate(stats["m"])))
                entry["BBOX"] = {
                    "Q_WM": f"{q_wm:.4f}",
                    "P": f"{p_value:.3e}",
                    "MATCH": f"{match:d}/{len(ds):d}",
                }
            metrics[data["name"]] = entry
            print(f"Dataset: {data['name']}  WBOX {ber:.4f}  "
                  f"BBOX {entry.get('BBOX')}")

        # atomic: prune/sign_flip resume sweeps treat an existing per-pct
        # JSON as done, so a kill mid-write must not leave a truncated file
        with open(fpath + ".tmp", "w") as f:
            json.dump(metrics, f, indent=2, sort_keys=True)
        os.replace(fpath + ".tmp", fpath)
        return metrics
