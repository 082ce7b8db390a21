"""Image-generation experiment (DCGAN & VAE driver).

Reference: experiments/image_generation.py. Train loop, periodic
sample-grid + checkpoint, and the evaluation pipeline (FID + IS against
the eval dataset, black-box Q_WM/PDQ p-value/match count, white-box BER).

TPU-first training path: the whole (small) image dataset lives in device
HBM as uint8; each compiled chunk scans ``n`` train steps, sampling batch
indices and latents from the threaded PRNG and normalizing on device —
zero host->device traffic during training.
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
from iprgan_tpu.experiments.base import Experiment, dtype_of
from iprgan_tpu.ops.pdq import compute_matching_prob
from iprgan_tpu.ops.ssim import ssim as ssim_fn
from iprgan_tpu.protection import make_transform
import iprgan_tpu.models  # noqa: F401  (populate MODELS registry)
from iprgan_tpu.registry import EXPERIMENTS, MODELS
from iprgan_tpu.utils import (
    ImageWriter,
    calculate_frechet_distance,
    calculate_inception_score,
)


def _postproc(x):
    return (np.clip(np.asarray(x), -1.0, 1.0) + 1.0) / 2.0


@EXPERIMENTS.register("ImageGeneration")
class ImageGeneration(Experiment):

    def __init__(self, config):
        print("IMAGE GENERATION EXPERIMENT\n")
        super().__init__(config)
        self.configure_dataset()
        self.configure_model()

    # -- configuration -----------------------------------------------------
    def configure_dataset(self):
        print("*** DATASET ***")
        name = self.config.dataset.name
        kwargs = {k: v for k, v in self.config.dataset.to_dict().items()
                  if k != "name"}
        self.dataset = get_dataset(name, **kwargs)
        # park the dataset in device HBM (uint8), replicated over the mesh
        self.data_device = self.pctx.replicate(
            jnp.asarray(self.dataset.images))
        print(f"Name: {name.upper()}")
        print(f"# samples: {len(self.dataset)}\n")

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

        n_g = sum(x.size for x in jax.tree_util.tree_leaves(
            self.state["G"]["params"]))
        n_d = sum(x.size for x in jax.tree_util.tree_leaves(
            self.state["D"]["params"]))
        print("*** MODEL ***")
        print(f"G: {model_conf.G}\n# params: {n_g}")
        print(f"D: {model_conf.D}\n# params: {n_d}\n")
        if self.bbox:
            print("*** BLACK-BOX ***")
            print(f"lambda: {self.model.protection.lam}")
            print(f"Loss: {self.model.protection.loss_name}\n")
        if self.wbox:
            print("*** WHITE-BOX ***")
            print(f"Gamma0: {self.model.protection.gamma_0}")
            print(f"Signature: {self.model.protection.string}\n")

    # -- training ----------------------------------------------------------
    def _chunk_fn(self, n: int):
        if n in self._chunk_fns:
            return self._chunk_fns[n]
        model = self.model
        pctx = self.pctx
        bsz = self.config.hparam.bsz
        d_iter = model.d_iter

        @partial(jax.jit, donate_argnums=(0,))
        def chunk(state, data_u8, rng):
            def body(state, key):
                kidx, kstep = jax.random.split(key)
                idx = jax.random.randint(
                    kidx, (d_iter, bsz), 0, data_u8.shape[0])
                real = jnp.take(data_u8, idx, axis=0)
                real = pctx.constrain_batch(real, axis=1)
                real = real.astype(jnp.float32) / 127.5 - 1.0
                return model.train_step(state, {"real": real}, kstep)

            keys = jax.random.split(rng, n)
            return jax.lax.scan(body, state, keys)

        self._chunk_fns[n] = chunk
        return chunk

    def train_chunk(self, n: int):
        self.rng, k = jax.random.split(self.rng)
        self.state, metrics = self._chunk_fn(n)(
            self.state, self.data_device, k)
        return {key: np.asarray(v) for key, v in metrics.items()}

    # -- checkpointing -----------------------------------------------------
    def periodic_checkpoint(self, step: int):
        bsz = self.config.hparam.bsz
        if not hasattr(self, "fixed_z"):
            self.rng, k = jax.random.split(self.rng)
            if self.bbox:
                # half plain, half the same latents triggered
                # (reference image_generation.py:117-125)
                z = jax.random.normal(k, (bsz // 2, self.model.Z_DIM))
                zwm = self.model.transform_latent(self.state, z)
                z = jnp.concatenate([z, zwm], axis=0)
            else:
                z = jax.random.normal(k, (bsz, self.model.Z_DIM))
            self.fixed_z = z
        img = _postproc(self._gen_eval(self.state, self.fixed_z))
        self.logger.save_images(img, step)
        self.save_checkpoint(step)

    # -- evaluation --------------------------------------------------------
    def _masker(self):
        """Eval comparator: fn_out rebuilt with opaque=True, whose
        apply_mask crops the watermark corner
        (reference experiments/image_generation.py:144-149)."""
        conf = Config(self.model.protection.bbox.fn_out.to_dict())
        conf["opaque"] = True
        t = make_transform(conf, normalized=True)
        buf = t.init_buffers(jax.random.PRNGKey(0))
        return lambda x: t.apply_mask(buf, x)  # stays on device

    def _feature_fn(self):
        """InceptionV3 (TF-FID variant) activations + softmax probs.

        $IPRGAN_FAKE_INCEPTION=1 swaps in a trivially cheap extractor so
        smoke tests / CI can exercise the full evaluate() pipeline
        without the 2048-d Inception forward."""
        if os.environ.get("IPRGAN_FAKE_INCEPTION"):
            def stub(x):
                x = np.asarray(x, np.float64)
                n = x.shape[0]
                feats = x.reshape(n, -1)[:, :16]
                probs = np.full((n, 10), 0.1)
                return feats, probs

            return stub
        from iprgan_tpu.networks.inception import InceptionActivations

        return InceptionActivations.build(self.config)

    def _pad_shard(self, a):
        """Batch-shard an eval array over the mesh, padding to a multiple
        of the device count (the reference wraps eval Inception in
        DataParallel, experiments/image_generation.py:155-158 — this is
        the mesh equivalent: generated/real batches scatter over the
        data axis, each chip runs 1/n of the forward). Padding rows
        duplicate row 0 and are sliced off at every host boundary."""
        n = self.pctx.n
        pad = (-a.shape[0]) % n
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
        return self.pctx.shard_batch(a)

    def evaluate(self, fpath: str):
        cfg = self.config
        apply_mask = self._masker() if self.bbox else None
        # distinct stream from the init-time split of PRNGKey(seed)
        # (single-use key hygiene; the reference reseeds torch here,
        # reference image_generation.py:151)
        eval_rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 0xE7A1)

        print("*** EVALUATION ***")
        inception = self._feature_fn()

        if self.wbox:
            target = getattr(self.model, "wbox_target", "G")
            ber = self.model.protection.ber(
                self.state, self.state[target]["params"])
        else:
            ber = float("nan")

        sample_dir = cfg.get("sample_dir", None)
        writer = ImageWriter(sample_dir) if sample_dir else None

        metrics = {}
        for data in cfg.evaluation.data:
            kwargs = {k: v for k, v in data.items() if k != "name"}
            kwargs.pop("bsz", None)
            ds = get_dataset(data["name"], **kwargs)
            stats = {"fx": [], "fy": [], "prob": []}
            if self.bbox:
                stats.update(q=[], p=[], m=[])
            for y_u8 in ds.iter_eval(data["bsz"]):
                b = int(np.shape(y_u8)[0])  # real rows; the rest is padding
                y = self._pad_shard(
                    jnp.asarray(y_u8, jnp.float32) / 127.5 - 1.0)
                eval_rng, zk = jax.random.split(eval_rng)
                z = self._pad_shard(
                    jax.random.normal(zk, (b, self.model.Z_DIM)))
                x = self._gen_eval(self.state, z)

                if writer:
                    for img in _postproc(x)[:b]:
                        writer(img, suffix="gen")

                if self.bbox:
                    zwm = self.model.transform_latent(self.state, z)
                    xwm = self._gen_eval(self.state, zwm)
                    ywm = self.model.transform_output(self.state, x)
                    if writer:
                        for img in _postproc(xwm)[:b]:
                            writer(img, suffix="wm")
                    # mask + rescale + SSIM all on device; pull each
                    # masked crop to host ONCE (PDQ runs on host) —
                    # avoids a device->host->device bounce per batch,
                    # which costs ~28 ms/fetch on the axon tunnel
                    xm = jnp.clip(apply_mask(xwm), -1.0, 1.0) * 0.5 + 0.5
                    ym = jnp.clip(apply_mask(ywm), -1.0, 1.0) * 0.5 + 0.5
                    q = np.asarray(ssim_fn(xm, ym, data_range=1.0,
                                           size_average=False))[:b]
                    wm_x = np.asarray(xm)[:b]
                    wm_y = np.asarray(ym)[:b]
                    p = compute_matching_prob(wm_x, wm_y)
                    stats["q"].append(q)
                    stats["p"].append(p)
                    stats["m"].append(p < cfg.evaluation.p_thres)

                # one fused Inception pass over [generated; real]
                # (inference-mode BN, so concatenation is value-identical
                # to two calls and halves the dispatch round-trips);
                # inputs stay batch-sharded over the mesh
                bp = x.shape[0]
                feats, probs = inception(jnp.concatenate([x, y], axis=0))
                feats = np.asarray(feats)
                stats["fx"].append(feats[:bp][:b])
                stats["fy"].append(feats[bp:][:b])
                stats["prob"].append(np.asarray(probs)[:bp][:b])

            for k in stats:
                stats[k] = np.concatenate(stats[k], axis=0)

            mu1, mu2 = stats["fx"].mean(0), stats["fy"].mean(0)
            sig1 = np.cov(stats["fx"], rowvar=False)
            sig2 = np.cov(stats["fy"], rowvar=False)
            fid = calculate_frechet_distance(mu1, sig1, mu2, sig2)
            is_mean, is_std = calculate_inception_score(stats["prob"])
            ssim_wm = float(np.mean(stats["q"])) if self.bbox else float("nan")
            p_value = float(np.mean(stats["p"])) if self.bbox else float("nan")
            match = int(np.sum(stats["m"])) if self.bbox else 0
            sample_size = len(ds)

            entry = {
                "FID": f"{fid:.4f}",
                "IS_MEAN": f"{is_mean:.4f}",
                "IS_STD": f"{is_std:.4f}",
            }
            if self.wbox:
                entry["WBOX"] = f"{ber:.4f}"
            if self.bbox:
                entry["BBOX"] = {
                    "Q_WM": f"{ssim_wm:.4f}",
                    "P": f"{p_value:.3e}",
                    "MATCH": f"{match:d}/{sample_size:d}",
                }
            metrics[data["name"]] = entry

            print(f"Dataset: {data['name']}"
                  f"\n\tFID: {fid:.2f}"
                  f"\n\tIS: {is_mean:.4f} +/- {is_std:.4f}"
                  f"\n\tWBOX: {ber:.4f}"
                  f"\n\tBBOX: Q_WM {ssim_wm:.4f}  P {p_value:.3e}"
                  f"  MATCH {match}/{sample_size}")

        # atomic: prune/sign_flip resume sweeps treat an existing per-pct
        # JSON as done, so a kill mid-write must not leave a truncated file
        with open(fpath + ".tmp", "w") as f:
            json.dump(metrics, f, indent=2, sort_keys=True)
        os.replace(fpath + ".tmp", fpath)
        return metrics

