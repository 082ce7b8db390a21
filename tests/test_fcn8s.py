"""FCN-8s scorer: Caffe-geometry parity vs torch, converter round-trip,
and the end-to-end score pipeline on converter-produced weights.

Mirrors the reference's external Cityscapes evaluation
(reference scripts/run.py + scripts/caffemodel/deploy.prototxt) with a
scaled-down network so the 1-core host can run it.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.convert_torch_weights import (  # noqa: E402
    convert_fcn8s_state_dict,
    save_npz,
)
from scripts.run_fcn import arch_of, build_fcn8s, score  # noqa: E402

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")

N_CLASS, WIDTHS, FC_DIM = 5, (4, 8, 16, 24, 24), 16


class TorchFCN8s(torch.nn.Module):
    """Scaled-down wkentaro/pytorch-fcn FCN8s: pad-100 first conv,
    ceil-mode pools, VALID fc6, bias-free upscores, crops 5/9/31 —
    the published-checkpoint layout the converter targets."""

    def __init__(self, n_class=N_CLASS, widths=WIDTHS, fc_dim=FC_DIM):
        super().__init__()
        c = torch.nn.Conv2d
        reps_plan = (2, 2, 3, 3, 3)
        cin = 3
        for b, (reps, ch) in enumerate(zip(reps_plan, widths), start=1):
            for r in range(reps):
                pad = 100 if (b == 1 and r == 0) else 1
                setattr(self, f"conv{b}_{r + 1}", c(cin, ch, 3, padding=pad))
                cin = ch
        self.pool = torch.nn.MaxPool2d(2, 2, ceil_mode=True)
        self.fc6 = c(widths[4], fc_dim, 7)
        self.fc7 = c(fc_dim, fc_dim, 1)
        self.score_fr = c(fc_dim, n_class, 1)
        self.score_pool3 = c(widths[2], n_class, 1)
        self.score_pool4 = c(widths[3], n_class, 1)
        ct = torch.nn.ConvTranspose2d
        self.upscore2 = ct(n_class, n_class, 4, stride=2, bias=False)
        self.upscore_pool4 = ct(n_class, n_class, 4, stride=2, bias=False)
        self.upscore8 = ct(n_class, n_class, 16, stride=8, bias=False)

    def forward(self, x):
        relu = torch.relu
        h = x
        pools = {}
        for b, reps in enumerate((2, 2, 3, 3, 3), start=1):
            for r in range(reps):
                h = relu(getattr(self, f"conv{b}_{r + 1}")(h))
            h = self.pool(h)
            pools[b] = h
        h = relu(self.fc6(h))
        h = relu(self.fc7(h))
        h = self.score_fr(h)
        h = self.upscore2(h)
        s4 = self.score_pool4(pools[4])
        h = h + s4[:, :, 5:5 + h.size(2), 5:5 + h.size(3)]
        h = self.upscore_pool4(h)
        s3 = self.score_pool3(pools[3])
        h = h + s3[:, :, 9:9 + h.size(2), 9:9 + h.size(3)]
        h = self.upscore8(h)
        return h[:, :, 31:31 + x.size(2), 31:31 + x.size(3)]


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(7)
    return TorchFCN8s().eval()


def test_converted_forward_matches_torch(torch_net):
    import jax.numpy as jnp

    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()}
    variables = convert_fcn8s_state_dict(sd)
    assert arch_of(variables) == (N_CLASS, WIDTHS, FC_DIM)
    net = build_fcn8s(*arch_of(variables))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(net.apply(variables, jnp.asarray(x)))
    assert out.shape == ref.shape == (1, 64, 48, N_CLASS)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_score_histogram_out_of_range_preds():
    # a 20-class net may predict class 19; it must count as an error,
    # not crash or drop the frame (reference fast_hist quirk)
    gt = np.array([[0, 1], [18, 255]], np.uint8)
    pred = np.array([[0, 19], [2, 0]], np.uint8)
    hist = score(pred, gt, np.zeros((19, 20), np.int64))
    assert hist.sum() == 3  # the 255 pixel is ignored
    assert hist[0, 0] == 1 and hist[1, 19] == 1 and hist[18, 2] == 1


def _fabricate_caffemodel(torch_net, path, v1=True):
    """Serialize the torch net as a reference-layout caffemodel: caffe
    Convolution blobs are (out, in, kh, kw) and Deconvolution blobs
    (in, out, kh, kw) — both bit-identical to the torch layouts — with
    the deploy.prototxt's fc6_cs/fc7_cs layer names and interleaved
    blob-free ReLU/Pooling layers."""
    from iprgan_tpu.utils.caffemodel import write_caffemodel

    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()}
    upscores = {"upscore2", "upscore_pool4", "upscore8"}
    aliases = {"fc6": "fc6_cs", "fc7": "fc7_cs"}
    layers = {}
    for key in sd:
        if not key.endswith(".weight"):
            continue
        name = key[:-len(".weight")]
        blobs = [sd[key]]
        if f"{name}.bias" in sd:
            blobs.append(sd[f"{name}.bias"])
        layers[aliases.get(name, name)] = {
            "type": ("Deconvolution" if name in upscores
                     else "Convolution"),
            "blobs": blobs,
        }
        layers[f"relu_{name}"] = {"type": "ReLU", "blobs": []}
    write_caffemodel(path, layers, v1=v1)


def test_caffemodel_forward_matches_torch(tmp_path, torch_net):
    """The reference's published artifact path: .caffemodel bytes ->
    fcn8s_variables -> flax forward == the torch forward."""
    import jax.numpy as jnp

    from iprgan_tpu.utils.caffemodel import fcn8s_variables

    path = str(tmp_path / "fcn8s.caffemodel")
    _fabricate_caffemodel(torch_net, path, v1=True)
    variables = fcn8s_variables(path)
    assert arch_of(variables) == (N_CLASS, WIDTHS, FC_DIM)
    net = build_fcn8s(*arch_of(variables))

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 48, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(net.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_run_fcn_e2e_with_converted_weights(tmp_path, torch_net):
    from PIL import Image

    # converter-produced weights file
    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()}
    weights = str(tmp_path / "fcn8s.npz")
    save_npz(weights, convert_fcn8s_state_dict(sd))

    # synthetic translated frames + GT label maps (raw cityscapes ids)
    frame_dir = tmp_path / "log" / "samples" / "cityscapes"
    gt_dir = tmp_path / "gt"
    frame_dir.mkdir(parents=True)
    gt_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        img = rng.integers(0, 256, (64, 64, 3), np.uint8)
        Image.fromarray(img).save(frame_dir / f"{i}.png")
        gt = rng.choice([7, 8, 11, 26, 0], size=(64, 64)).astype(np.uint8)
        Image.fromarray(gt).save(gt_dir / f"{i}_labelIds.png")
    json.dump({}, open(tmp_path / "log" / "metrics.json", "w"))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_fcn.py"),
         "--log", str(tmp_path / "log"), "--gt", str(gt_dir),
         "--weights", weights],
        # generous: the FCN-8s forward compiles in the subprocess and
        # this 1-core host is often contended — 300 s flaked twice in
        # full-suite runs while the test passes standalone in ~60 s
        env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr

    metrics = json.load(open(tmp_path / "log" / "metrics.json"))
    cs = metrics["cityscapes"]
    for key in ("PIXEL_ACC", "CLASS_ACC", "CLASS_IOU"):
        assert 0.0 <= float(cs[key]) <= 1.0

    # same smoke set scored straight off the published artifact format
    # (reference scripts/run.py:16-20) — identical weights, so identical
    # numbers; the forward is already in the shared compile cache
    caffemodel = str(tmp_path / "fcn8s.caffemodel")
    _fabricate_caffemodel(torch_net, caffemodel, v1=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_fcn.py"),
         "--log", str(tmp_path / "log"), "--gt", str(gt_dir),
         "--weights", caffemodel],
        env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr
    cs2 = json.load(open(tmp_path / "log" / "metrics.json"))["cityscapes"]
    assert cs2 == cs
