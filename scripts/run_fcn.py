#!/usr/bin/env python
"""External Cityscapes FCN-8s segmentation scorer.

Standalone post-hoc evaluator for CycleGAN translations (reference
scripts/run.py + scripts/Dockerfile, which run Caffe FCN-8s in Docker):
segments the translated frames dumped by the ImageTranslation
evaluation, compares against ground-truth label maps with a 19-class
confusion histogram, and writes PIXEL_ACC / CLASS_ACC / CLASS_IOU back
into the run's metrics.json.

The FCN-8s network is implemented here in flax (VGG16 backbone + skip
fusion from pool3/pool4 with learned upsampling). Weights must be
supplied offline (--weights, a .npz produced by
scripts/convert_torch_weights.py from any published FCN-8s-Cityscapes
checkpoint); without weights the script refuses to score (random
segmentation numbers would be meaningless) unless --allow-random is
passed for smoke testing.

Usage:
  python scripts/run_fcn.py --log log/CycleGAN-COMP-CITY-A \
      --gt data/cityscapes/gtFine/val --weights fcn8s.npz
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.labels import N_TRAIN_CLASSES, id_to_train_id  # noqa: E402


def build_fcn8s():
    import jax.numpy as jnp
    from flax import linen as nn

    class FCN8s(nn.Module):
        n_class: int = N_TRAIN_CLASSES

        @nn.compact
        def __call__(self, x):
            # VGG16 conv stack; channel plan per block
            pools = {}
            plan = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
            h = x
            for b, (reps, ch) in enumerate(plan, start=1):
                for r in range(reps):
                    h = nn.Conv(ch, (3, 3), padding=1,
                                name=f"conv{b}_{r + 1}")(h)
                    h = nn.relu(h)
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                pools[b] = h
            h = nn.Conv(4096, (7, 7), padding=3, name="fc6")(h)
            h = nn.relu(h)
            h = nn.Conv(4096, (1, 1), name="fc7")(h)
            h = nn.relu(h)
            score = nn.Conv(self.n_class, (1, 1), name="score_fr")(h)

            up2 = nn.ConvTranspose(self.n_class, (4, 4), strides=(2, 2),
                                   padding="SAME", use_bias=False,
                                   name="upscore2")(score)
            s4 = nn.Conv(self.n_class, (1, 1), name="score_pool4")(pools[4])
            up2 = up2 + s4
            up4 = nn.ConvTranspose(self.n_class, (4, 4), strides=(2, 2),
                                   padding="SAME", use_bias=False,
                                   name="upscore_pool4")(up2)
            s3 = nn.Conv(self.n_class, (1, 1), name="score_pool3")(pools[3])
            up4 = up4 + s3
            out = nn.ConvTranspose(self.n_class, (16, 16), strides=(8, 8),
                                   padding="SAME", use_bias=False,
                                   name="upscore8")(up4)
            return out

    return FCN8s()


def segment_batch(net, variables, imgs_u8):
    import jax
    import jax.numpy as jnp

    # Caffe FCN preprocessing: BGR, mean-subtracted
    mean = jnp.asarray([72.39, 82.91, 73.16])  # Cityscapes BGR mean
    x = jnp.asarray(imgs_u8, jnp.float32)[..., ::-1] - mean
    logits = jax.jit(net.apply)(variables, x)
    return np.asarray(jnp.argmax(logits, axis=-1), np.uint8)


def score(pred, gt_train_ids, hist):
    mask = gt_train_ids != 255
    idx = N_TRAIN_CLASSES * gt_train_ids[mask].astype(int) + pred[mask]
    hist += np.bincount(idx, minlength=N_TRAIN_CLASSES ** 2).reshape(
        N_TRAIN_CLASSES, N_TRAIN_CLASSES)
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True,
                    help="run log dir containing samples/cityscapes/")
    ap.add_argument("--gt", required=True,
                    help="directory of ground-truth *labelIds.png maps "
                         "(sorted order must match frame order)")
    ap.add_argument("--weights", default=None, help="FCN-8s .npz weights")
    ap.add_argument("--subdir", default="samples",
                    help="samples subdir (or an attack_mode name)")
    ap.add_argument("--allow-random", action="store_true")
    args = ap.parse_args()

    from PIL import Image

    frames = sorted(
        glob.glob(os.path.join(args.log, args.subdir, "cityscapes",
                               "*.png")),
        key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
    gts = sorted(glob.glob(os.path.join(args.gt, "**", "*labelIds.png"),
                           recursive=True))
    assert frames, f"no frames under {args.log}/{args.subdir}/cityscapes"
    assert gts, f"no ground truth under {args.gt}"

    net = build_fcn8s()
    if args.weights and os.path.exists(args.weights):
        import pickle

        with np.load(args.weights, allow_pickle=True) as data:
            variables = pickle.loads(data["variables"].tobytes())
    else:
        if not args.allow_random:
            sys.exit("no --weights given; refusing to produce meaningless "
                     "scores (use --allow-random for smoke tests)")
        import jax

        variables = net.init(jax.random.PRNGKey(0),
                             np.zeros((1, 64, 64, 3), np.float32))

    table = id_to_train_id()
    hist = np.zeros((N_TRAIN_CLASSES, N_TRAIN_CLASSES), np.int64)
    for frame, gt_path in zip(frames, gts):
        img = np.asarray(Image.open(frame).convert("RGB"), np.uint8)
        gt = table[np.asarray(Image.open(gt_path), np.uint8)]
        if gt.shape != img.shape[:2]:
            gt = np.asarray(Image.fromarray(gt).resize(
                (img.shape[1], img.shape[0]), Image.NEAREST))
        pred = segment_batch(net, variables, img[None])[0]
        hist = score(pred, gt, hist)

    tp = np.diag(hist).astype(float)
    pixel_acc = tp.sum() / max(hist.sum(), 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        class_acc = np.nanmean(tp / hist.sum(1))
        iou = np.nanmean(tp / (hist.sum(1) + hist.sum(0) - tp))

    metrics_path = os.path.join(args.log, "metrics.json")
    metrics = {}
    if os.path.exists(metrics_path):
        metrics = json.load(open(metrics_path))
    metrics.setdefault("cityscapes", {}).update({
        "PIXEL_ACC": f"{pixel_acc:.4f}",
        "CLASS_ACC": f"{class_acc:.4f}",
        "CLASS_IOU": f"{iou:.4f}",
    })
    json.dump(metrics, open(metrics_path, "w"), indent=2, sort_keys=True)
    print(f"PIXEL_ACC {pixel_acc:.4f}  CLASS_ACC {class_acc:.4f}  "
          f"CLASS_IOU {iou:.4f} -> {metrics_path}")


if __name__ == "__main__":
    main()
