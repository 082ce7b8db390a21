#!/usr/bin/env python
"""Convert a reference ``checkpoint.pt`` into this framework's format.

Migration path for users of the reference PyTorch implementation
(dingsheng-ong/ipr-gan): take the ``checkpoint.pt`` their training run
produced (reference models/base.py:34-38 ``{module: state_dict, 'step':
int|'END'}``, every net wrapped in DataParallel so keys carry a
``module.`` prefix) plus the run's ``config.yaml``, and emit a log dir
that this framework's ``eval.py`` / ``attack.py`` / ``prune.py`` /
``sign_flip.py`` consume directly:

    python scripts/convert_reference_checkpoint.py \
        -c config.yaml -i checkpoint.pt -o log/MY-RUN

What is converted (all four families):

* network weights (``G``/``D``/``GA``/``GB``/``DA``/``DB``): NCHW torch
  tensors -> NHWC flax pytrees, including BatchNorm running stats,
  spectral-norm power-iteration vectors (u as-is, v reordered for the
  (kh, kw, cin) flatten), and the flatten/reshape boundary permutations
  (torch views channel-major, this framework views HWC-major);
* black-box trigger buffers (``fn_inp``/``fn_out`` and their ``*_ov``
  overwrite-attack variants): paste fg/bg planes and bit-mask indices;
* white-box ``sign`` buffers, re-keyed per layer from the reference's
  ``module_``-prefixed torch module paths (tools/sign_model.py:33-40)
  to this framework's sorted-flattened-path keys — per-layer mapping,
  NOT order-based, because the two enumeration orders differ;
* CycleGAN history pools (``poolA``/``poolB``): variable-length NCHW
  image buffers -> fixed-shape NHWC + counts;
* the ``step`` counter / ``'END'`` sentinel.

NOT converted: optimizer moments (``optG``/``optD``/``opt``) and LR
scheduler internals (``schG``/``schD``) — optimizer state is re-created
fresh (Adam moments restart; schedules here are pure functions of the
step counter, so they resume correctly from the converted step). This
only matters when *continuing training* from a converted checkpoint;
evaluation and the attack battery are unaffected.

Numerical parity of every mapping is tested in
tests/test_reference_checkpoint.py against torch forwards.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from iprgan_tpu.config import Config  # noqa: E402
from iprgan_tpu.utils.torch_convert import (  # noqa: E402
    conv_w,
    convt_w,
    dense_in_chw,
    dense_out_chw,
)


def bn(sd, t):
    """torch BatchNorm2d -> ({'bn': params}, {'bn': stats})."""
    return ({"bn": {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}},
            {"bn": {"mean": sd[f"{t}.running_mean"],
                    "var": sd[f"{t}.running_var"]}})


def in_affine(sd, t):
    """torch InstanceNorm2d(affine=True) -> InstanceNorm params."""
    return {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}


def sn_conv(sd, t):
    """torch spectral_norm(Conv2d) -> (SNConv params, spectral vars).
    torch flattens the weight (out, in*kh*kw) with the rest ordered
    (in, kh, kw); here the kernel flattens (kh*kw*in, out), so v is
    re-ordered to match (sigma = u^T W v is invariant under consistent
    permutations of the rest axis)."""
    w = sd[f"{t}.weight_orig"]
    _, cin, kh, kw = w.shape
    v = sd[f"{t}.weight_v"].reshape(cin, kh, kw).transpose(1, 2, 0).reshape(-1)
    return ({"kernel": conv_w(w), "bias": sd[f"{t}.bias"]},
            {"u": sd[f"{t}.weight_u"], "v": np.ascontiguousarray(v)})


def sn_dense(sd, t, chw=None):
    """torch spectral_norm(Linear) -> (SNDense params, spectral vars);
    ``chw`` permutes the input axis when the linear sits on a flatten
    boundary."""
    w = sd[f"{t}.weight_orig"]
    v = sd[f"{t}.weight_v"]
    if chw is not None:
        c, h, ww = chw
        k = dense_in_chw(w, c, h, ww)
        v = np.ascontiguousarray(
            v.reshape(c, h, ww).transpose(1, 2, 0).reshape(-1))
    else:
        k = np.ascontiguousarray(w.T)
    return ({"kernel": k, "bias": sd[f"{t}.bias"]},
            {"u": sd[f"{t}.weight_u"], "v": v})


# ---------------------------------------------------------------------------
# per-network converters: torch state dict (module. prefix stripped) ->
# (flax variables, sign_map {torch norm-module path: our sign key})
# ---------------------------------------------------------------------------

def convert_conv_generator(sd):
    """Reference networks/conv_generator.py -> networks.ConvGenerator."""
    out = sd["fc.0.weight"].shape[0]
    mg = int(round((out // 512) ** 0.5))
    k, b = dense_out_chw(sd["fc.0.weight"], sd["fc.0.bias"], 512, mg, mg)
    params = {"fc": {"dense": {"kernel": k, "bias": b}}}
    stats = {}
    for i in range(3):
        params[f"up{i}"] = {"convt": {"kernel": convt_w(sd[f"convs.{i}.0.weight"])}}
        params[f"norm{i}"], stats[f"norm{i}"] = bn(sd, f"convs.{i}.1")
    params["head"] = {"convt": {"kernel": convt_w(sd["convs.3.weight"])}}
    sign_map = {f"convs.{i}.1": f"norm{i}_bn_scale" for i in range(3)}
    return {"params": params, "batch_stats": stats}, sign_map


def convert_sn_discriminator(sd):
    """Reference networks/sn_discriminator.py -> networks.SNDiscriminator."""
    params, spec = {}, {}
    for i in range(3):
        for slot, suffix in ((0, "a"), (2, "b")):
            p, s = sn_conv(sd, f"net.{i}.{slot}")
            params[f"block{i}_{suffix}"], spec[f"block{i}_{suffix}"] = p, s
    params["post"], spec["post"] = sn_conv(sd, "net.3")
    md = int(round((sd["net.6.weight_orig"].shape[1] // 512) ** 0.5))
    params["fc"], spec["fc"] = sn_dense(sd, "net.6", chw=(512, md, md))
    return {"params": params, "spectral": spec}, {}


def convert_decoder32(sd):
    """Reference networks/decoder.py -> networks.Decoder32."""
    k, b = dense_out_chw(sd["0.weight"], sd["0.bias"], 128, 4, 4)
    params = {"fc": {"dense": {"kernel": k, "bias": b}}}
    stats = {}
    for i, (tc, tn) in enumerate(((2, 3), (5, 6))):
        params[f"up{i}"] = {"convt": {"kernel": convt_w(sd[f"{tc}.weight"]),
                                      "bias": sd[f"{tc}.bias"]}}
        params[f"norm{i}"], stats[f"norm{i}"] = bn(sd, str(tn))
    params["head"] = {"convt": {"kernel": convt_w(sd["8.weight"]),
                                "bias": sd["8.bias"]}}
    sign_map = {"3": "norm0_bn_scale", "6": "norm1_bn_scale"}
    return {"params": params, "batch_stats": stats}, sign_map


def convert_encoder32(sd):
    """Reference networks/encoder.py -> networks.Encoder32."""
    params, stats = {}, {}
    for i, t in enumerate((0, 3, 6)):
        params[f"conv{i}"] = {"conv": {"kernel": conv_w(sd[f"encoder.{t}.weight"]),
                                       "bias": sd[f"encoder.{t}.bias"]}}
    for i, t in enumerate((1, 4)):
        params[f"norm{i}"], stats[f"norm{i}"] = bn(sd, f"encoder.{t}")
    for head in ("q_mean", "q_logvar"):
        params[head] = {"dense": {
            "kernel": dense_in_chw(sd[f"{head}.weight"], 128, 4, 4),
            "bias": sd[f"{head}.bias"]}}
    return {"params": params, "batch_stats": stats}, {}


def _conv_entry(sd, t):
    return {"conv": {"kernel": conv_w(sd[f"{t}.weight"]),
                     "bias": sd[f"{t}.bias"]}}


def _prelu(sd, key):
    return np.asarray(sd[key]).reshape(())


def convert_sr_resnet(sd):
    """Reference networks/sr_resnet.py -> networks.SRResNet. The body
    block count is inferred from the keys (``1.block.{i}.block...`` are
    residual blocks, ``1.block.{n}`` the trailing conv-BN)."""
    n = max(int(k.split(".")[2]) for k in sd if k.startswith("1.block."))
    params = {"head": _conv_entry(sd, "0.0"),
              "head_act": {"alpha": _prelu(sd, "0.1.weight")}}
    stats = {}
    sign_map = {}
    for i in range(n):
        t = f"1.block.{i}.block"
        name = f"res{i:02d}"
        entry = {"conv0": _conv_entry(sd, f"{t}.0.0"),
                 "act0": {"alpha": _prelu(sd, f"{t}.0.2.weight")},
                 "conv1": _conv_entry(sd, f"{t}.1.0")}
        n0p, n0s = bn(sd, f"{t}.0.1")
        n1p, n1s = bn(sd, f"{t}.1.1")
        entry["norm0"], entry["norm1"] = n0p, n1p
        params[name] = entry
        stats[name] = {"norm0": n0s, "norm1": n1s}
        sign_map[f"{t}.0.1"] = f"{name}_norm0_bn_scale"
        sign_map[f"{t}.1.1"] = f"{name}_norm1_bn_scale"
    params["body_conv"] = _conv_entry(sd, f"1.block.{n}.0")
    params["body_norm"], stats["body_norm"] = bn(sd, f"1.block.{n}.1")
    sign_map[f"1.block.{n}.1"] = "body_norm_bn_scale"
    for i in range(2):
        params[f"up{i}"] = _conv_entry(sd, f"{2 + i}.0.0")
        params[f"up{i}_act"] = {"alpha": _prelu(sd, f"{2 + i}.2.weight")}
    params["tail"] = _conv_entry(sd, "4.0")
    return {"params": params, "batch_stats": stats}, sign_map


def convert_discriminator96(sd):
    """Reference networks/discriminator_96.py -> networks.Discriminator96."""
    params = {"head": _conv_entry(sd, "0")}
    stats = {}
    for i, t in enumerate(range(2, 9)):
        params[f"block{i}_conv"] = _conv_entry(sd, f"{t}.0")
        params[f"block{i}_norm"], stats[f"block{i}_norm"] = bn(sd, f"{t}.1")
    params["fc0"] = _conv_entry(sd, "9")
    params["fc1"] = _conv_entry(sd, "11")
    return {"params": params, "batch_stats": stats}, {}


def convert_resnet_generator(sd):
    """Reference networks/resnet_generator.py -> networks.ResnetGenerator.
    Sequential indices: 1 head conv, 2 head IN, 4/7 down convs, 5/8 down
    INs, 10..10+n-1 residual blocks, then ConvT/IN pairs and the tail
    conv at 10+n+7."""
    res_idx = sorted({int(k.split(".")[0]) for k in sd if ".block." in k})
    n = len(res_idx)
    assert res_idx == list(range(10, 10 + n)), res_idx
    params = {"head": _conv_entry(sd, "1"), "head_norm": in_affine(sd, "2"),
              "down0": _conv_entry(sd, "4"), "down0_norm": in_affine(sd, "5"),
              "down1": _conv_entry(sd, "7"), "down1_norm": in_affine(sd, "8")}
    sign_map = {"2": "head_norm_scale", "5": "down0_norm_scale",
                "8": "down1_norm_scale"}
    for i, idx in enumerate(res_idx):
        name = f"res{i:02d}"
        params[name] = {
            "conv0": {"conv": {"kernel": conv_w(sd[f"{idx}.block.1.weight"]),
                               "bias": sd[f"{idx}.block.1.bias"]}},
            "norm0": in_affine(sd, f"{idx}.block.2"),
            "conv1": {"conv": {"kernel": conv_w(sd[f"{idx}.block.5.weight"]),
                               "bias": sd[f"{idx}.block.5.bias"]}},
            "norm1": in_affine(sd, f"{idx}.block.6"),
        }
        sign_map[f"{idx}.block.2"] = f"{name}_norm0_scale"
        sign_map[f"{idx}.block.6"] = f"{name}_norm1_scale"
    b = 10 + n
    for i in range(2):
        t = b + 3 * i
        params[f"up{i}"] = {"convt": {"kernel": convt_w(sd[f"{t}.weight"]),
                                      "bias": sd[f"{t}.bias"]}}
        params[f"up{i}_norm"] = in_affine(sd, str(t + 1))
        sign_map[str(t + 1)] = f"up{i}_norm_scale"
    params["tail"] = _conv_entry(sd, str(b + 7))
    return {"params": params}, sign_map


def convert_conv_discriminator(sd):
    """Reference networks/conv_discriminator.py -> ConvDiscriminator
    (the InstanceNorms are affine=False: no parameters)."""
    names = {0: "conv0", 2: "conv1", 5: "conv2", 8: "conv3", 11: "head"}
    params = {ours: _conv_entry(sd, str(t)) for t, ours in names.items()}
    return {"params": params}, {}


NET_CONVERTERS = {
    "ConvGenerator32": convert_conv_generator,
    "ConvGenerator64": convert_conv_generator,
    "SNDiscriminator32": convert_sn_discriminator,
    "SNDiscriminator64": convert_sn_discriminator,
    "Decoder32": convert_decoder32,
    "Encoder32": convert_encoder32,
    "SRResNet": convert_sr_resnet,
    "Discriminator96": convert_discriminator96,
    "Resnet9Blocks": convert_resnet_generator,
    "Resnet6Blocks": convert_resnet_generator,
    "ConvDiscriminator": convert_conv_discriminator,
}


# ---------------------------------------------------------------------------
# non-network state
# ---------------------------------------------------------------------------

def strip_module(sd):
    """Drop the DataParallel ``module.`` prefix (reference wraps every
    net, models/dcgan.py:16-17) and torch bookkeeping entries."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = v
    return out


def convert_transform_buffers(sd):
    """fn_inp / fn_out buffer dicts. Paste transforms carry fg (1,3,s,s)
    / bg (1,1,s,s) NCHW planes -> (s,s,3)/(s,s,1); RandomBitMask carries
    ``_mask`` (1,n) index rows -> (n,) int32; TransformVar carries
    (1,z) ``w``/``a`` rows (same layout here); TransformDist is empty."""
    sd = strip_module(sd)
    out = {}
    if "fg" in sd:
        out["fg"] = np.ascontiguousarray(sd["fg"][0].transpose(1, 2, 0))
        out["bg"] = np.ascontiguousarray(sd["bg"][0].transpose(1, 2, 0))
    if "_mask" in sd:
        out["_mask"] = np.asarray(sd["_mask"]).reshape(-1).astype(np.int32)
    for key in ("w", "a"):  # TransformVar latent-mix buffers
        if key in sd:
            out[key] = np.asarray(sd[key], np.float32).reshape(1, -1)
    return out


def convert_sign(sd, sign_map):
    """Reference sign buffers are keyed ``module_<torch path with _>``
    (tools/sign_model.py:36-40, over the DataParallel-wrapped target);
    re-key each per-layer vector to this framework's sorted-path key."""
    out = {}
    for tpath, ours in sign_map.items():
        tkey = "module_" + tpath.replace(".", "_")
        out[ours] = np.asarray(sd[tkey], np.float32)
    return out


def convert_pool(sd, pool_size, image_size):
    """Reference ImagePool buffers (models/util.py:5-35): variable-length
    ``images`` (n,3,H,W) + scalar ``counts`` -> fixed-shape NHWC."""
    imgs = np.asarray(sd["images"], np.float32)
    full = np.zeros((pool_size, image_size, image_size, 3), np.float32)
    if imgs.size:
        n = min(imgs.shape[0], pool_size)
        full[:n] = imgs[:n].transpose(0, 2, 3, 1)
    return {"images": full, "counts": np.int32(float(sd["counts"]))}


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def build_model(config):
    """Mirror the experiments' configure_model (without datasets/logs)."""
    import iprgan_tpu.models  # noqa: F401
    from iprgan_tpu.registry import MODELS

    model_conf = config.model
    if config.experiment == "ImageTranslation":
        image_size = config.dataset.crop
        model_conf.epoch = max(
            1, config.hparam.iteration // max(1, config.log.freq))
        model_conf.steps_per_epoch = max(1, config.log.freq)
        model_conf.schedule_on = config.get("attack_mode", None) is None
    else:
        image_size = config.dataset.size
    return MODELS(model_conf.type)(
        model_conf, protection_config=config.get("protection", None),
        hparam=config.hparam.to_dict(), image_size=image_size)


def convert(config, torch_ckpt):
    """torch checkpoint dict -> this framework's state-dict (numpy)."""
    import jax
    from flax import serialization

    model = build_model(config)
    state = jax.device_get(model.init_state(jax.random.PRNGKey(config.seed)))
    sd_out = serialization.to_state_dict(state)

    conf_of = {"G": config.model.get("G"), "D": config.model.get("D"),
               "GA": config.model.get("G"), "GB": config.model.get("G"),
               "DA": config.model.get("D"), "DB": config.model.get("D")}
    sign_target = "GB" if config.model.type == "CycleGAN" else "G"
    sign_map = None
    skipped = []

    for key, sub in torch_ckpt.items():
        if key == "step":
            continue
        if key in conf_of:
            net = conf_of[key]
            variables, smap = NET_CONVERTERS[net](strip_module(sub))
            assert key in sd_out, f"{key} not in model state"
            sd_out[key] = serialization.to_state_dict(variables)
            if key == sign_target:
                sign_map = smap
        elif key.startswith(("fn_inp", "fn_out")):
            bufs = convert_transform_buffers(sub)
            sd_out[key] = bufs
        elif key in ("poolA", "poolB"):
            sd_out[key] = convert_pool(
                strip_module(sub), config.model.get("pool_size", 50),
                config.dataset.crop)
        elif key == "sign":
            pass  # handled after the nets (needs sign_map)
        else:
            skipped.append(key)  # optG/optD/opt/schG/schD: fresh state

    if "sign" in torch_ckpt and sign_map is not None:
        sd_out["sign"] = convert_sign(strip_module(torch_ckpt["sign"]),
                                      sign_map)

    # loudly flag protection state the config implies but the checkpoint
    # does not carry: those entries would otherwise silently keep the
    # template's FRESH RANDOM values (a re-embedded signature / a new
    # trigger), which verifies against nothing
    for prot_key in ("sign", "fn_inp", "fn_out"):
        if prot_key in sd_out and prot_key not in torch_ckpt \
                and sd_out[prot_key]:
            print(f"WARNING: config declares protection but the torch "
                  f"checkpoint has no '{prot_key}' — the output carries a "
                  f"freshly initialized {prot_key} that will NOT verify "
                  f"against these weights. Use the matching config tier "
                  f"(baselines/black-box/complete).")

    step = torch_ckpt.get("step", 0)
    sd_out["step"] = step if step == "END" else int(step)
    if skipped:
        print(f"NOTE: re-initialized (not converted): {sorted(skipped)} — "
              "optimizer moments restart; schedules are pure functions of "
              "the step and resume correctly.")
    return sd_out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-c", "--config", required=True,
                    help="the run's config.yaml (reference schema)")
    ap.add_argument("-i", "--input", required=True,
                    help="reference checkpoint.pt")
    ap.add_argument("-o", "--output", required=True,
                    help="output log dir (gets config.yaml + "
                         "checkpoint.msgpack)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # init shapes only; fast

    import torch

    from iprgan_tpu.utils import checkpoint as ckpt

    config = Config.parse(args.config)
    torch_ckpt = torch.load(args.input, map_location="cpu")
    torch_ckpt = {
        k: ({kk: (vv.numpy() if isinstance(vv, torch.Tensor) else vv)
             for kk, vv in v.items()}
            if hasattr(v, "items") else v)
        for k, v in torch_ckpt.items()}

    sd = convert(config, torch_ckpt)
    os.makedirs(args.output, exist_ok=True)
    ckpt.save(os.path.join(args.output, ckpt.CKPT_NAME), sd)
    # write the config with log.path pointing at the output dir so the
    # whole battery (eval/attack/prune/sign_flip read config.log.path,
    # reference sign_flip.py:33) works from wherever -o landed
    out_config = Config.parse(args.config)
    out_config.log.path = os.path.abspath(args.output)
    with open(os.path.join(args.output, "config.yaml"), "w") as f:
        f.write(out_config.to_yaml())
    print(f"wrote {args.output}/{ckpt.CKPT_NAME}")


if __name__ == "__main__":
    main()
