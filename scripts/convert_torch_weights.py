#!/usr/bin/env python
"""Convert published torch checkpoints into this framework's .npz format.

Supported:
  inception  — mseitzer/pytorch-fid ``pt_inception-2015-12-05-*.pth``
               -> FID InceptionV3 variables (for evaluation.inception_weights)
  vgg19      — torchvision ``vgg19-*.pth`` -> VGG19Feature variables
               (for model.V_weights / $IPRGAN_VGG19_WEIGHTS)
  fcn8s      — published torch FCN-8s checkpoints in the
               wkentaro/pytorch-fcn layout (conv1_1..conv5_3 / fc6 / fc7 /
               score_fr / score_pool3 / score_pool4 / upscore2 /
               upscore_pool4 / upscore8) -> scripts/run_fcn.py --weights.
               Replaces the reference's Caffe FCN-8s download
               (reference scripts/run.py:16-20); the target flax module
               mirrors the deploy.prototxt geometry.

The .npz holds a pickled variables pytree under key 'variables'.

Usage: python scripts/convert_torch_weights.py inception in.pth out.npz
"""

import pickle
import sys

import numpy as np


def save_npz(path, variables):
    blob = np.frombuffer(pickle.dumps(variables), dtype=np.uint8)
    np.savez_compressed(path, variables=blob)


def convert_fcn8s_state_dict(sd):
    """wkentaro/pytorch-fcn FCN8s state dict -> flax variables for
    scripts/run_fcn.build_fcn8s. Plain convs map via ``conv_w``; the
    bias-free transposed convs use ``convt_w`` (spatial flip: torch's
    ConvTranspose2d is the conv gradient while flax's ConvTranspose
    correlates the kernel over the dilated input — verified numerically
    in tests/test_fcn8s.py)."""
    from iprgan_tpu.utils.torch_convert import conv_w, convt_w

    upscores = {"upscore2", "upscore_pool4", "upscore8"}
    params = {}
    for key in sd:
        name, leaf = key.rsplit(".", 1)
        if leaf not in ("weight", "bias"):
            continue  # fcn variants carry no buffers; ignore extras
        entry = params.setdefault(name, {})
        if leaf == "bias":
            entry["bias"] = sd[key]
        else:
            entry["kernel"] = (convt_w if name in upscores
                               else conv_w)(sd[key])
    return {"params": params}


def main():
    if len(sys.argv) != 4 or sys.argv[1] not in ("inception", "vgg19",
                                                 "fcn8s"):
        sys.exit(__doc__)
    kind, src, dst = sys.argv[1:]

    import torch

    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}

    if kind == "inception":
        from iprgan_tpu.networks.inception import convert_torch_state_dict

        variables = convert_torch_state_dict(sd)
    elif kind == "fcn8s":
        variables = convert_fcn8s_state_dict(sd)
    else:
        from iprgan_tpu.networks.vgg import convert_vgg19_state_dict

        variables = convert_vgg19_state_dict(sd)

    variables = {k: v for k, v in variables.items()}
    save_npz(dst, variables)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
