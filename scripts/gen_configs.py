#!/usr/bin/env python
"""Generate the full experiment config tree.

Emits the same 45-config matrix as the reference (4 families x
{baselines, black-box, complete} x watermark variants A/B/C, with two
DCGAN datasets), same YAML schema and hyperparameters
(SURVEY.md section 2.2). Also renders default watermark PNGs A/B/C
(the reference expects user-supplied ./data/watermarks/*.png; this
environment has no network egress, so we draw simple letter glyphs).

Run from the repo root: python scripts/gen_configs.py
"""

import copy
import os
import sys

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_watermarks():
    from PIL import Image, ImageDraw

    wm_dir = os.path.join(ROOT, "data", "watermarks")
    os.makedirs(wm_dir, exist_ok=True)
    colors = {"A": (220, 40, 40, 255), "B": (40, 120, 220, 255),
              "C": (40, 180, 80, 255)}
    for letter, color in colors.items():
        img = Image.new("RGBA", (64, 64), (0, 0, 0, 0))
        draw = ImageDraw.Draw(img)
        draw.ellipse([4, 4, 60, 60], fill=(255, 255, 255, 255),
                     outline=color, width=4)
        # big block letter (default font scaled via textbbox centering)
        draw.text((22, 14), letter, fill=color, font_size=36)
        img.save(os.path.join(wm_dir, f"{letter}.png"))


def base_config(family: str, dataset: str):
    if family == "DCGAN":
        size = 32 if dataset == "cifar10" else 64
        return {
            "dataset": {"name": dataset, "path": f"./data/{dataset}",
                        "size": size},
            "evaluation": {"data": [{"bsz": 50, "name": dataset,
                                     "path": f"./data/{dataset}",
                                     "size": size}]},
            "experiment": "ImageGeneration",
            "model": {"G": f"ConvGenerator{size}",
                      "D": f"SNDiscriminator{size}",
                      "opt": "Adam",
                      "opt_param": {"lr": 2.0e-4, "betas": [0.5, 0.999]},
                      "type": "DCGAN"},
            "hparam": {"bsz": 64, "iteration": 100000},
            "log": {"freq": 1000},
            "resource": {"gpu": True, "ngpu": 1, "worker": 4},
            "seed": 1234,
        }
    if family == "VAE":
        return {
            "dataset": {"name": "cifar10", "path": "./data/cifar10",
                        "size": 32},
            "evaluation": {"data": [{"bsz": 50, "name": "cifar10",
                                     "path": "./data/cifar10",
                                     "size": 32}]},
            "experiment": "ImageGeneration",
            "model": {"G": "Decoder32", "D": "Encoder32", "opt": "Adam",
                      "opt_param": {"lr": 3.0e-5, "weight_decay": 1.0e-6},
                      "type": "VAE"},
            "hparam": {"bsz": 64, "iteration": 187500},
            "log": {"freq": 1875},
            "resource": {"gpu": True, "ngpu": 1, "worker": 4},
            "seed": 1234,
        }
    if family == "SRGAN":
        return {
            "dataset": {"name": "imagenet", "path": "./data/imagenet",
                        "size": 96},
            "evaluation": {"data": [
                {"bsz": 1, "name": "set5", "path": "./data/Set5",
                 "size": -1},
                {"bsz": 1, "name": "set14", "path": "./data/Set14",
                 "size": -1},
                {"bsz": 1, "name": "bsd100", "path": "./data/BSD100",
                 "size": -1}]},
            "experiment": "ImageSuperResolution",
            "model": {"G": "SRResNet", "D": "Discriminator96",
                      "V": "VGG19Feature", "opt": "Adam",
                      "opt_param": {"lr": 1.0e-4}, "type": "SRGAN"},
            "hparam": {"bsz": 16, "pretrain_iter": 1000000,
                       "iteration": 200000},
            "log": {"freq": 2000},
            "resource": {"gpu": True, "ngpu": 2, "worker": 8},
            "seed": 1234,
        }
    if family == "CycleGAN":
        return {
            "dataset": {"name": "cityscapes", "path": "./data/cityscapes",
                        "load": 143, "crop": 128},
            "evaluation": {"data": [{"bsz": 1, "name": "cityscapes",
                                     "path": "./data/cityscapes",
                                     "load": 256, "crop": 256}]},
            "experiment": "ImageTranslation",
            "model": {"G": "Resnet9Blocks", "D": "ConvDiscriminator",
                      "lambda_A": 10.0, "lambda_B": 10.0,
                      "lambda_idt": 0.5, "opt": "Adam",
                      "opt_param": {"lr": 2.0e-4, "betas": [0.5, 0.999]},
                      "pool_size": 50, "type": "CycleGAN"},
            "hparam": {"bsz": 1, "iteration": 200},
            "log": {"freq": 1},
            "resource": {"gpu": True, "ngpu": 1, "worker": 4},
            "seed": 1234,
        }
    raise KeyError(family)


def protection_for(family: str, dataset: str, variant: str):
    wm = f"./data/watermarks/{variant}.png"
    if family in ("DCGAN", "VAE"):
        fn_inp = {"type": "TransformDist"}
        size = 16 if (family == "VAE" or dataset == "cifar10") else 32
        lam = 50.0 if family == "VAE" else 1.0
    elif family == "SRGAN":
        fn_inp = {"size": 12, "type": "RandomNoisePatch"}
        size = 48
        lam = 1.0
    else:  # CycleGAN
        fn_inp = {"size": 64, "type": "RandomNoisePatch"}
        size = 64
        lam = 1.0
    return {
        "bbox": {"fn_inp": fn_inp,
                 "fn_out": {"size": size, "opaque": True,
                            "type": "PasteWatermark", "watermark": wm},
                 "lambda": lam, "loss_fn": "ssim"},
        "wbox": {"gamma_0": 0.1, "string": f"EXAMPLE {variant}"},
    }


TIER_TAG = {"baselines": "BASE", "black-box": "BBOX", "complete": "COMP"}
DATASET_TAG = {"cifar10": "CIFAR10", "cub200": "CUB200",
               "imagenet": "IMAGENET", "cityscapes": "CITY"}
P_THRES = {"DCGAN": 0.01, "VAE": 0.05, "SRGAN": 0.05, "CycleGAN": 0.05}


def main():
    make_watermarks()
    families = {"DCGAN": ["cifar10", "cub200"], "VAE": ["cifar10"],
                "SRGAN": ["imagenet"], "CycleGAN": ["cityscapes"]}
    count = 0
    for family, datasets in families.items():
        for dataset in datasets:
            for tier in ("baselines", "black-box", "complete"):
                for variant in ("A", "B", "C"):
                    cfg = copy.deepcopy(base_config(family, dataset))
                    tag = (f"{family}-{TIER_TAG[tier]}-"
                           f"{DATASET_TAG[dataset]}-{variant}")
                    cfg["log"]["path"] = f"./log/{tag}"
                    if tier == "baselines":
                        cfg["protection"] = None
                    else:
                        cfg["evaluation"]["p_thres"] = P_THRES[family]
                        prot = protection_for(family, dataset, variant)
                        if tier == "black-box":
                            prot["wbox"] = None
                        cfg["protection"] = prot

                    stem = {"DCGAN": f"dcgan-{dataset}",
                            "VAE": "vae-cifar10",
                            "SRGAN": "srgan-imagenet",
                            "CycleGAN": "cyclegan-city"}[family]
                    out = os.path.join(ROOT, "configs", family, tier,
                                       f"{stem}-{variant.lower()}.yaml")
                    os.makedirs(os.path.dirname(out), exist_ok=True)
                    with open(out, "w") as f:
                        yaml.safe_dump(cfg, f, sort_keys=True)
                    count += 1
    print(f"wrote {count} configs")


if __name__ == "__main__":
    sys.exit(main())
