"""VGG19 feature extractor for the SRGAN perceptual loss
(reference networks/vgg.py:5-40).

The reference truncates torchvision's pretrained VGG19 at a named layer
(default relu5_4) and freezes it. Here the architecture is implemented in
flax; pretrained weights are loaded from a converted torchvision
state-dict when available (see scripts/convert_torch_weights.py) — this
environment has no network egress, so without a provided weight file the
extractor falls back to a fixed-seed random init (features are then only
self-consistent, not ImageNet-pretrained; a warning is printed once).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from iprgan_tpu.nn import Conv

# channels per conv layer, 'M' = 2x2 maxpool (VGG19 "features" stack)
_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

LAYER_NAMES: list[str] = []
_conv_i, _block, _in_block = 0, 1, 1
for _c in _VGG19_CFG:
    if _c == "M":
        LAYER_NAMES.append(f"pool{_block}")
        _block += 1
        _in_block = 1
    else:
        LAYER_NAMES.append(f"conv{_block}_{_in_block}")
        LAYER_NAMES.append(f"relu{_block}_{_in_block}")
        _in_block += 1


def convert_vgg19_state_dict(sd) -> dict:
    """torchvision vgg19 state dict -> this module's variables.
    torchvision stores convs at
    features.{0,2,5,7,10,12,14,16,19,21,23,25,28,30,32,34}; we map them
    in order onto conv0..conv15 (OIHW -> HWIO).

    Strict: exactly 16 conv layers, each with weight+bias, and no other
    ``features.*`` keys — a dropped conv would silently leave a
    default-initialized layer in the perceptual loss. ``classifier.*``
    keys are ignored by design (the extractor truncates before them)."""
    import numpy as np

    conv_ids = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("features.")})
    n_convs = sum(1 for c in _VGG19_CFG if c != "M")
    if len(conv_ids) != n_convs:
        raise ValueError(
            f"expected {n_convs} conv layers under features.*, found "
            f"{len(conv_ids)} (ids {conv_ids})")
    leftover = [k for k in sd
                if k.startswith("features.")
                and not (k.split(".")[2] in ("weight", "bias"))]
    if leftover:
        raise ValueError(f"unrecognized features.* keys: {leftover[:5]}")
    params = {}
    for i, idx in enumerate(conv_ids):
        w = np.asarray(sd[f"features.{idx}.weight"])
        b = np.asarray(sd[f"features.{idx}.bias"])
        params[f"conv{i}"] = {"conv": {
            "kernel": w.transpose(2, 3, 1, 0), "bias": b}}
    return {"params": params}


def load_vgg19_features(path: str, net: "VGG19Feature"):
    """Load a torchvision vgg19 state dict (.pth) or a pre-converted
    .npz as this module's variables."""
    import numpy as np

    if path.endswith(".npz"):
        import pickle

        with np.load(path, allow_pickle=True) as data:
            import jax

            return jax.tree_util.tree_map(
                np.asarray, pickle.loads(data["variables"].tobytes()))

    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_vgg19_state_dict(sd)


class VGG19Feature(nn.Module):
    layer: str = "relu5_4"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        stop = LAYER_NAMES.index(self.layer)
        i = 0  # index into LAYER_NAMES as layers are emitted
        conv_idx = 0
        for c in _VGG19_CFG:
            if c == "M":
                if i > stop:
                    break
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                i += 1
            else:
                if i > stop:
                    break
                x = Conv(c, 3, 1, padding=1, dtype=self.dtype,
                         name=f"conv{conv_idx}")(x)
                conv_idx += 1
                i += 1
                if i > stop:
                    break
                x = nn.relu(x)
                i += 1
        return x
