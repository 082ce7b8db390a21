"""A/B the DCGAN generator head on the chip: plain ConvTranspose(3,1,1)
64->3 vs the space-to-depth blocked form (conv_generator.head_s2d).

The head is ~0.3% of step FLOPs but runs at 3/128 MXU lane occupancy
in the plain form — the same pathology the SRResNet tail had (README
"Space-to-depth blocked tail"). This measures whether fixing it moves
the 162.8G-FLOP headline step, using bench.bench_jax's exact timing
harness (200-step chunk, scalar-fetch fencing, best-of-two).

Run: python scripts/bench_dcgan_head.py      (TPU; ~2 min warm cache)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import bench  # noqa: E402


def main():
    from iprgan_tpu.networks.conv_generator import ConvGenerator
    from iprgan_tpu.registry import NETWORKS

    results = {}
    for name, s2d in (("plain_head", False), ("s2d_head", True)):
        NETWORKS._entries["ConvGenerator32"] = (
            lambda dtype=None, _s=s2d: ConvGenerator(
                mg=4, dtype=dtype, head_s2d=_s))
        for dt_name, dtype in (("f32", None), ("bf16", "bf16")):
            import jax.numpy as jnp

            sps, fps = bench.bench_jax(
                dtype=jnp.bfloat16 if dtype else None)
            key = f"{name}_{dt_name}"
            results[key] = {"steps_per_sec": round(sps, 2),
                            "flops_per_step": fps}
            print(f"{key:18s} {sps:8.2f} steps/s   "
                  f"flops {fps and f'{fps / 1e9:.2f}G'}", flush=True)

    for dt in ("f32", "bf16"):
        a = results[f"plain_head_{dt}"]["steps_per_sec"]
        b = results[f"s2d_head_{dt}"]["steps_per_sec"]
        print(f"{dt}: {a:.2f} -> {b:.2f} steps/s "
              f"({(b / a - 1) * 100:+.1f}%)")

    out = os.path.join(os.path.dirname(__file__), os.pardir,
                       "bench_dcgan_head.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
