#!/usr/bin/env python
"""Convert published torch checkpoints into this framework's .npz format.

Supported:
  inception  — mseitzer/pytorch-fid ``pt_inception-2015-12-05-*.pth``
               -> FID InceptionV3 variables (for evaluation.inception_weights)
  vgg19      — torchvision ``vgg19-*.pth`` -> VGG19Feature variables
               (for model.V_weights / $IPRGAN_VGG19_WEIGHTS)

The .npz holds a pickled variables pytree under key 'variables'.

Usage: python scripts/convert_torch_weights.py inception in.pth out.npz
"""

import pickle
import sys

import numpy as np


def save_npz(path, variables):
    blob = np.frombuffer(pickle.dumps(variables), dtype=np.uint8)
    np.savez_compressed(path, variables=blob)


def main():
    if len(sys.argv) != 4 or sys.argv[1] not in ("inception", "vgg19"):
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
    else:
        conv_ids = sorted(
            {int(k.split(".")[1]) for k in sd if k.startswith("features.")})
        params = {}
        for i, idx in enumerate(conv_ids):
            params[f"conv{i}"] = {"conv": {
                "kernel": sd[f"features.{idx}.weight"].transpose(2, 3, 1, 0),
                "bias": sd[f"features.{idx}.bias"],
            }}
        variables = {"params": params}

    variables = {k: v for k, v in variables.items()}
    save_npz(dst, variables)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
