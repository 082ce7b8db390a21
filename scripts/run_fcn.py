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
supplied offline via --weights, either the published
``fcn-8s-cityscapes.caffemodel`` directly (parsed without the Caffe
runtime by iprgan_tpu/utils/caffemodel.py) or a .npz produced by
scripts/convert_torch_weights.py from a torch FCN-8s checkpoint;
without weights the script refuses to score (random segmentation
numbers would be meaningless) unless --allow-random is passed for
smoke testing.

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


def build_fcn8s(n_class: int = N_TRAIN_CLASSES,
                widths=(64, 128, 256, 512, 512), fc_dim: int = 4096):
    """Caffe-geometry FCN-8s (reference scripts/caffemodel/deploy.prototxt):
    conv1_1 pads the input by 100, pools are ceil-mode, fc6 is a VALID
    7x7, the three bias-free upscores are k4s2 / k4s2 / k16s8 with
    skip-score crops at offsets 5 / 9 and a final crop at offset 31 back
    to the input frame. ``widths``/``fc_dim`` are parametric so tests
    can run a scaled-down copy; published checkpoints use the defaults.
    """
    import jax.numpy as jnp
    from flax import linen as nn

    def ceil_pool(h):
        """Caffe/torch ceil_mode=True 2x2/2 max pool: pad odd edges
        with -inf so the last window survives."""
        ph, pw = h.shape[1] % 2, h.shape[2] % 2
        if ph or pw:
            h = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        constant_values=-jnp.inf)
        return nn.max_pool(h, (2, 2), strides=(2, 2))

    class FCN8s(nn.Module):
        @nn.compact
        def __call__(self, x):
            in_h, in_w = x.shape[1], x.shape[2]
            pools = {}
            reps_plan = (2, 2, 3, 3, 3)
            h = x
            for b, (reps, ch) in enumerate(zip(reps_plan, widths), start=1):
                for r in range(reps):
                    pad = 100 if (b == 1 and r == 0) else 1
                    h = nn.Conv(ch, (3, 3), padding=pad,
                                name=f"conv{b}_{r + 1}")(h)
                    h = nn.relu(h)
                h = ceil_pool(h)
                pools[b] = h
            h = nn.Conv(fc_dim, (7, 7), padding="VALID", name="fc6")(h)
            h = nn.relu(h)
            h = nn.Conv(fc_dim, (1, 1), name="fc7")(h)
            h = nn.relu(h)
            score = nn.Conv(n_class, (1, 1), name="score_fr")(h)

            up2 = nn.ConvTranspose(n_class, (4, 4), strides=(2, 2),
                                   padding="VALID", use_bias=False,
                                   name="upscore2")(score)
            s4 = nn.Conv(n_class, (1, 1), name="score_pool4")(pools[4])
            uh, uw = up2.shape[1], up2.shape[2]
            up2 = up2 + s4[:, 5:5 + uh, 5:5 + uw]
            up4 = nn.ConvTranspose(n_class, (4, 4), strides=(2, 2),
                                   padding="VALID", use_bias=False,
                                   name="upscore_pool4")(up2)
            s3 = nn.Conv(n_class, (1, 1), name="score_pool3")(pools[3])
            uh, uw = up4.shape[1], up4.shape[2]
            up4 = up4 + s3[:, 9:9 + uh, 9:9 + uw]
            out = nn.ConvTranspose(n_class, (16, 16), strides=(8, 8),
                                   padding="VALID", use_bias=False,
                                   name="upscore8")(up4)
            return out[:, 31:31 + in_h, 31:31 + in_w]

    return FCN8s()


def arch_of(variables):
    """(n_class, widths, fc_dim) inferred from converted parameters, so
    any published FCN-8s layout (20-class Cityscapes caffemodel, 21-class
    VOC torch ports) drives the right module shape."""
    p = variables["params"]
    widths = tuple(p[f"conv{b}_1"]["kernel"].shape[-1] for b in range(1, 6))
    return p["score_fr"]["kernel"].shape[-1], widths, \
        p["fc6"]["kernel"].shape[-1]


def segment_batch(net, variables, imgs_u8):
    import jax
    import jax.numpy as jnp

    # Caffe FCN preprocessing: BGR, mean-subtracted
    # (reference scripts/run.py:79-84 mean values)
    mean = jnp.asarray([72.78044, 83.21195, 73.45286])
    x = jnp.asarray(imgs_u8, jnp.float32)[..., ::-1] - mean
    logits = jax.jit(net.apply)(variables, x)
    return np.asarray(jnp.argmax(logits, axis=-1), np.uint8)


def score(pred, gt_train_ids, hist):
    """19 x (19+1) confusion histogram: rows = GT train ids, cols =
    prediction, with every out-of-range prediction (a >=19-class net's
    extra classes) folded into a trailing never-correct bin. Matches the
    reference fast_hist semantics (scripts/run.py:92-96) without its
    silent frame drop when a prediction lands out of range."""
    n = N_TRAIN_CLASSES
    mask = (gt_train_ids >= 0) & (gt_train_ids < n)
    p = np.minimum(pred[mask].astype(int), n)
    idx = (n + 1) * gt_train_ids[mask].astype(int) + p
    hist += np.bincount(idx, minlength=n * (n + 1)).reshape(n, n + 1)
    return hist


def main():
    import jax

    # persistent compile cache: the FCN-8s forward otherwise recompiles
    # on every invocation (minutes on a contended 1-core host)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("IPRGAN_JAX_CACHE", "/tmp/iprgan_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True,
                    help="run log dir containing samples/cityscapes/")
    ap.add_argument("--gt", required=True,
                    help="directory of ground-truth *labelIds.png maps "
                         "(sorted order must match frame order)")
    ap.add_argument("--weights", default=None, help="FCN-8s weights: .caffemodel or .npz")
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

    if args.weights and os.path.exists(args.weights):
        if args.weights.endswith(".caffemodel"):
            # the published artifact, read directly (reference
            # scripts/run.py:16-20 loads it through the Caffe runtime)
            from iprgan_tpu.utils.caffemodel import fcn8s_variables

            variables = fcn8s_variables(args.weights)
        else:
            import pickle

            with np.load(args.weights, allow_pickle=True) as data:
                variables = pickle.loads(data["variables"].tobytes())
        net = build_fcn8s(*arch_of(variables))
    else:
        if not args.allow_random:
            sys.exit("no --weights given; refusing to produce meaningless "
                     "scores (use --allow-random for smoke tests)")
        import jax

        net = build_fcn8s()
        variables = net.init(jax.random.PRNGKey(0),
                             np.zeros((1, 64, 64, 3), np.float32))

    table = id_to_train_id()
    n = N_TRAIN_CLASSES
    hist = np.zeros((n, n + 1), np.int64)
    for frame, gt_path in zip(frames, gts):
        img = np.asarray(Image.open(frame).convert("RGB"), np.uint8)
        gt = table[np.asarray(Image.open(gt_path), np.uint8)]
        if gt.shape != img.shape[:2]:
            # reference resizes the frame to the GT grid (run.py:47)
            img = np.asarray(Image.open(frame).convert("RGB").resize(
                (gt.shape[1], gt.shape[0]), Image.BILINEAR), np.uint8)
        pred = segment_batch(net, variables, img[None])[0]
        hist = score(pred, gt, hist)

    tp = np.diag(hist[:, :n]).astype(float)
    pixel_acc = tp.sum() / max(hist.sum(), 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        class_acc = np.nanmean(tp / hist.sum(1))
        iou = np.nanmean(tp / (hist.sum(1) + hist[:, :n].sum(0) - tp))

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
