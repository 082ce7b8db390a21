"""SRGAN-pretrain limiter analysis + optimization levers, on TPU.

The 1M-step SRResNet pretrain phase dominates the reference budget
(reference configs/SRGAN/complete/srgan-imagenet-a.yaml:30-32), so its
MFU is the biggest wall-clock lever in the whole project. The axon
tunnel exposes no device trace, so attribution is by ablation +
roofline:

components (differenced ms/step at the reference bsz 16):
    full          pixel-MSE fwd/bwd + wbox sign loss (the shipped step)
    no_wbox       drop the sign loss             -> wbox cost
    with_resize   + in-chunk bicubic /4 (the real data path)
                                                 -> resize cost
levers:
    bsz 32/64     amortize weight traffic / fixed overheads
    bf16          half the bytes on the conv path
    combined      bf16 + the best batch

roofline: XLA flops + bytes-accessed of the compiled chunk give the
arithmetic intensity; below the chip ridge (~240 flop/byte on v5e) the
step is HBM-bound and the measured ceiling is
bandwidth * intensity, not the MXU peak.

Run: python scripts/bench_srgan_breakdown.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import bench  # noqa: E402


def _cost(bsz, dtype=None):
    """Cost analysis of the pretrain chunk at the given batch."""
    import jax
    import jax.numpy as jnp

    from iprgan_tpu.config import Config
    import iprgan_tpu.models  # noqa: F401
    from iprgan_tpu.registry import MODELS
    from iprgan_tpu.utils.flops import compiled_cost
    from __graft_entry__ import _dcgan_config

    prot = _dcgan_config(1, 1, "/tmp/iprgan_bench_log").protection
    prot["bbox"]["fn_inp"] = Config({"type": "RandomNoisePatch", "size": 6})
    prot["bbox"]["fn_out"]["size"] = 48
    model = MODELS("SRGAN")(
        Config({"G": "SRResNet", "D": "Discriminator96",
                "V": "VGG19Feature", "opt": "Adam",
                "opt_param": {"lr": 1e-4}}),
        protection_config=prot,
        hparam={"pretrain_iter": 0, "iteration": 10 ** 6}, image_size=96,
        dtype=dtype)
    state = jax.device_put(model.init_state(jax.random.PRNGKey(0)))
    rng_d = jax.random.PRNGKey(2)
    data = {"lr": jax.random.uniform(rng_d, (1, bsz, 24, 24, 3)),
            "hr": jax.random.uniform(rng_d, (1, bsz, 96, 96, 3))}

    @jax.jit
    def chunk(state, batch, rng):
        def body(state, key):
            return model.train_step_pretrain(state, batch, key)

        return jax.lax.scan(body, state, jax.random.split(rng, 50))

    return compiled_cost(chunk, state, data, jax.random.PRNGKey(1))


def component_rows(bsz=16):
    """Per-component fwd+bwd timing of the SRResNet pretrain step at the
    reference batch (ablation by parts: the axon tunnel exposes no
    device trace). Each component is jitted as grad(sum(module(x)))
    scanned 50x, timed with the scalar-fetch fence. The components sum
    close to the full step (XLA fusion across component boundaries is
    small here), so the ranking attributes the 12% MFU.

    Probes:
      tail_conv9_64to3   the shipped tail (96px, 3 output channels —
                         3/128 MXU lane occupancy suspect)
      tail_conv9_64to32  same conv with 32 output channels: if ms/step
                         barely moves, the tail pays for padded lanes
                         and the 3-channel conv wastes ~10x its FLOPs
    """
    import time

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from iprgan_tpu.networks.sr_resnet import _ResBlock

    class Body(nn.Module):
        n: int = 16

        @nn.compact
        def __call__(self, x, train=True):
            for i in range(self.n):
                x = _ResBlock(name=f"b{i}")(x, train=train)
            return x

    class Ups(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for i in range(2):
                x = nn.Conv(256, (3, 3), name=f"up{i}")(x)
                b, h, w, c = x.shape
                x = x.reshape(b, h, w, c // 4, 2, 2).transpose(
                    0, 1, 4, 2, 5, 3).reshape(b, h * 2, w * 2, c // 4)
                x = nn.PReLU()(x)
            return x

    def conv(ch, k):
        class C(nn.Module):
            @nn.compact
            def __call__(self, x, train=True):
                return nn.Conv(ch, (k, k))(x)
        return C()

    comps = [
        ("head_conv9_3to64_24px", conv(64, 9), (bsz, 24, 24, 3)),
        ("body_16blocks_24px", Body(), (bsz, 24, 24, 64)),
        ("ups_2xpixelshuffle", Ups(), (bsz, 24, 24, 64)),
        ("tail_conv9_64to3_96px", conv(3, 9), (bsz, 96, 96, 64)),
        ("tail_conv9_64to32_96px", conv(32, 9), (bsz, 96, 96, 64)),
    ]
    rows = []
    for name, mod, shape in comps:
        x = jnp.ones(shape, jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x, train=False)
        has_bn = "batch_stats" in variables

        def loss(v, x, has_bn=has_bn, mod=mod):
            if has_bn:
                out, _ = mod.apply(v, x, train=True,
                                   mutable=["batch_stats"])
            else:
                out = mod.apply(v, x)
            return jnp.sum(out ** 2)

        @jax.jit
        def chunk(v, x, loss=loss):
            def body(carry, _):
                # grad at the CARRY (not the invariant arg) so XLA
                # cannot hoist the whole grad out of the loop
                g = jax.grad(loss)(carry, x)
                return jax.tree_util.tree_map(
                    lambda a, b: a + 0.0 * b, carry, g), None
            out, _ = jax.lax.scan(body, v, None, length=50)
            return out

        warm = chunk(variables, x)
        # fence: fetch one scalar (block_until_ready does not block on
        # the axon tunnel)
        float(jax.tree_util.tree_leaves(warm)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        out = chunk(warm, x)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        dt = time.perf_counter() - t0
        rows.append({"variant": f"component_{name}",
                     "ms_per_step": round(dt / 50 * 1e3, 3)})
        print(rows[-1])
    return rows


def main():
    import jax.numpy as jnp

    from iprgan_tpu.utils.flops import (chip_hbm_bandwidth,
                                        chip_peak_flops, mfu)

    peak = chip_peak_flops()
    hbm = chip_hbm_bandwidth()
    ridge = peak / hbm if (peak and hbm) else None
    print(f"chip peak {peak and peak / 1e12:.0f} Tflop/s  "
          f"HBM {hbm and hbm / 1e9:.0f} GB/s  "
          f"ridge {ridge and f'{ridge:.0f}'} flop/byte\n")

    grid = [
        ("full_bsz16_f32", dict(bsz=16)),
        ("no_wbox_bsz16_f32", dict(bsz=16, wbox=False)),
        ("with_resize_bsz16_f32", dict(bsz=16, in_chunk_resize=True)),
        ("full_bsz32_f32", dict(bsz=32)),
        ("full_bsz64_f32", dict(bsz=64)),
        ("full_bsz16_bf16", dict(bsz=16, dtype=jnp.bfloat16)),
        ("full_bsz64_bf16", dict(bsz=64, dtype=jnp.bfloat16)),
    ]
    rows = []
    for name, kw in grid:
        sps, fps = bench.bench_srgan(phase="pretrain", **kw)
        bsz = kw.get("bsz", 16)
        row = {"variant": name, "steps_per_sec": round(sps, 2),
               "ms_per_step": round(1e3 / sps, 3),
               "flops_per_step": fps,
               "mfu": round(mfu(fps, sps, peak) or 0, 4),
               "images_per_sec": round(sps * bsz)}
        rows.append(row)
        print(row)

    by = {r["variant"]: r for r in rows}
    print("\nattribution at bsz16 f32 (ms/step):")
    t = by["full_bsz16_f32"]["ms_per_step"]
    print(f"  total                 {t:.3f}")
    print(f"  wbox sign loss        "
          f"{t - by['no_wbox_bsz16_f32']['ms_per_step']:.3f}")
    print(f"  in-chunk bicubic /4   "
          f"{by['with_resize_bsz16_f32']['ms_per_step'] - t:.3f}")

    rows.extend(component_rows(16))

    for tag, bsz in (("bsz16", 16), ("bsz64", 64)):
        cost = _cost(bsz)
        if cost:
            flops, byts = cost.get("flops", 0), cost.get("bytes accessed", 0)
            inten = flops / byts if byts else None
            bound = "HBM-BOUND" if (inten and ridge and inten < ridge) \
                else "compute-bound"
            print(f"roofline {tag}: intensity "
                  f"{inten and f'{inten:.1f}'} flop/byte ({bound}; "
                  f"bw-implied ceiling "
                  f"{inten and hbm and f'{inten * hbm / 1e12:.1f}'} Tflop/s)")
            rows.append({"variant": f"roofline_{tag}",
                         "arithmetic_intensity": inten, "ridge": ridge})

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "bench_srgan_breakdown.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"\nwrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
