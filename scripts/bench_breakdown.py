"""Ablation time breakdown of the headline DCGAN train step, on TPU.

The axon tunnel exposes no device-level trace, so the step's time sinks
are attributed by ablation: time the compiled 200-step chunk with
components removed and difference the results.

    complete      hinge GAN + bbox(SSIM on trigger branch) + wbox(sign)
    bbox          drop the sign loss            -> wbox cost
    bbox_l1       SSIM -> l1                    -> SSIM window cost
    wbox          drop the trigger branch       -> bbox fwd/bwd cost
    baseline      plain GAN                     -> GAN core cost

Run: python scripts/bench_breakdown.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import bench  # noqa: E402


def main():
    results = {}
    for variant in ("complete", "bbox", "bbox_l1", "wbox", "baseline"):
        sps, fps = bench.bench_jax(protection=variant)
        results[variant] = (sps, fps)
        print(f"{variant:10s} {sps:8.1f} steps/s   "
              f"{1e3 / sps:6.3f} ms/step   "
              f"flops/step {fps and f'{fps / 1e9:.2f}G'}")

    ms = {k: 1e3 / v[0] for k, v in results.items()}
    print("\nattribution (ms/step):")
    print(f"  total (complete)         {ms['complete']:.3f}")
    print(f"  GAN core (baseline)      {ms['baseline']:.3f}")
    print(f"  bbox trigger branch      {ms['bbox'] - ms['baseline']:.3f}"
          f"  (cross-check complete-wbox: {ms['complete'] - ms['wbox']:.3f})")
    print(f"    of which SSIM vs l1    {ms['bbox'] - ms['bbox_l1']:.3f}")
    print(f"  wbox sign loss           {ms['wbox'] - ms['baseline']:.3f}"
          f"  (cross-check complete-bbox: {ms['complete'] - ms['bbox']:.3f})")


if __name__ == "__main__":
    main()
