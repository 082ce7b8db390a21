"""VAE step limiter probe, on TPU.

The VAE workload runs at ~7% MFU. This script identifies the limiter by
measurement instead of assertion:

* dispatch hypothesis: if host dispatch dominated, steps/s would grow
  with chunk length (fewer dispatches per step). A flat steps/s across
  chunk 200 vs 1000 rules it out.
* memory/small-kernel hypothesis: XLA cost analysis gives flops and
  bytes-accessed of the compiled chunk; arithmetic intensity
  (flops/byte) below the chip ridge point (peak FLOP/s / HBM B/s,
  ~240 flop/byte on v5e) proves the step is HBM-bound, and explains
  why bf16 does not help (same bytes moved for BN/elementwise-dominated
  graphs, while the MXU was never the bottleneck).
* batch lever: scaling bsz raises intensity (weights amortized over
  more samples) — the actionable fix for production throughput.

Run: python scripts/bench_vae_limiter.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from iprgan_tpu.utils.flops import (chip_hbm_bandwidth,
                                        chip_peak_flops, mfu)

    peak = chip_peak_flops()
    hbm = chip_hbm_bandwidth()
    ridge = peak / hbm if (peak and hbm) else None
    print(f"chip peak {peak and peak / 1e12:.0f} Tflop/s  "
          f"HBM {hbm and hbm / 1e9:.0f} GB/s  "
          f"ridge {ridge and f'{ridge:.0f}'} flop/byte\n")

    rows = []
    grid = [
        ("chunk200_bsz64_f32", dict(chunk_steps=200, bsz=64)),
        ("chunk1000_bsz64_f32", dict(chunk_steps=1000, bsz=64)),
        ("chunk200_bsz64_bf16", dict(chunk_steps=200, bsz=64,
                                     dtype=jnp.bfloat16)),
        ("chunk200_bsz512_f32", dict(chunk_steps=200, bsz=512)),
        ("chunk200_bsz512_bf16", dict(chunk_steps=200, bsz=512,
                                      dtype=jnp.bfloat16)),
    ]
    for name, kw in grid:
        sps, fps = bench.bench_vae(**kw)
        bsz = kw.get("bsz", 64)
        row = {"variant": name, "steps_per_sec": round(sps, 2),
               "flops_per_step": fps,
               "mfu": round(mfu(fps, sps, peak) or 0, 4),
               "images_per_sec": round(sps * bsz)}
        rows.append(row)
        print(row)

    # roofline of the compiled 200-step bsz-64 chunk
    cost = _chunk_cost(bsz=64)
    if cost:
        flops = cost.get("flops", 0.0)
        byts = cost.get("bytes accessed", 0.0)
        inten = flops / byts if byts else None
        print(f"\nchunk cost analysis: flops {flops:.3e}  "
              f"bytes {byts:.3e}  intensity "
              f"{inten and f'{inten:.1f}'} flop/byte "
              f"(ridge {ridge and f'{ridge:.0f}'})")
        rows.append({"variant": "roofline_bsz64",
                     "arithmetic_intensity": inten, "ridge": ridge})

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "bench_vae_limiter.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"\nwrote {os.path.normpath(out)}")


def _chunk_cost(bsz: int):
    """Cost analysis of the same chunk bench_vae times (rebuilt here so
    we can lower() it)."""
    import jax
    import jax.numpy as jnp

    from iprgan_tpu.config import Config
    import iprgan_tpu.models  # noqa: F401
    from iprgan_tpu.registry import MODELS
    from iprgan_tpu.utils.flops import compiled_cost
    from __graft_entry__ import _dcgan_config

    prot = _dcgan_config(1, 1, "/tmp/iprgan_bench_log").protection
    model = MODELS("VAE")(
        Config({"G": "Decoder32", "D": "Encoder32", "opt": "Adam",
                "opt_param": {"lr": 3e-5, "weight_decay": 1e-6}}),
        protection_config=prot, hparam={}, image_size=32)
    state = jax.device_put(model.init_state(jax.random.PRNGKey(0)))
    data = {"real": jax.random.uniform(
        jax.random.PRNGKey(2), (1, bsz, 32, 32, 3)) * 2 - 1}

    @jax.jit
    def chunk(state, batch, rng):
        def body(state, key):
            return model.train_step(state, batch, key)

        return jax.lax.scan(body, state, jax.random.split(rng, 200))

    return compiled_cost(chunk, state, data, jax.random.PRNGKey(1))


if __name__ == "__main__":
    main()
