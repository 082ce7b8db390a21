#!/usr/bin/env python
"""Eval-pipeline throughput: FID Inception forward + PDQ hashing.

SURVEY.md lists the reference's eval hot loops as (2) the eval-time
Inception forward over whole datasets (reference
experiments/image_generation.py:192-223) and (3) per-image CPU PDQ
hashing (reference tools/phash_pvalue.py:12-15). This measures both on
this host: Inception images/s on the default JAX device (the real TPU
chip under the driver) at the eval batch shape, and PDQ hashes/s for
the native C++ kernel vs the numpy mirror.

Timing on the axon tunnel is fenced with a value fetch
(block_until_ready does not block there — see bench.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def bench_inception(bsz: int = 50, n_batches: int = 8):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/iprgan_jax_cache")
    from iprgan_tpu.networks.inception import InceptionActivations

    inc = InceptionActivations.build(None)  # random init; same FLOPs
    rng = np.random.default_rng(0)
    # the fused [generated; real] eval pass is 2*bsz 32px images
    x = jnp.asarray(rng.uniform(-1, 1, (2 * bsz, 32, 32, 3)), jnp.float32)
    feats, probs = inc(x)
    _ = float(np.asarray(feats)[0, 0])  # warm + fence

    t0 = time.perf_counter()
    for _ in range(n_batches):
        feats, probs = inc(x)
    _ = float(np.asarray(feats)[0, 0])
    dt = time.perf_counter() - t0
    ips = n_batches * 2 * bsz / dt
    print(f"inception eval: {ips:.1f} images/s "
          f"(batch {2 * bsz} @ 32px -> 299px, {dt / n_batches * 1e3:.1f} "
          f"ms/batch)")
    return ips


def bench_pdq(n_images: int = 64, size: int = 64):
    from iprgan_tpu.ops import pdq

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n_images, size, size, 3), dtype=np.uint8)

    results = {}
    for name, use_native in (("native", True), ("numpy", False)):
        if use_native and not pdq._load_native():
            print("pdq native kernel not built (make -C native)")
            continue
        pdq.compute_hash(imgs[:2], use_native=use_native)  # warm
        t0 = time.perf_counter()
        pdq.compute_hash(imgs, use_native=use_native)
        dt = time.perf_counter() - t0
        results[name] = n_images / dt
        print(f"pdq {name}: {n_images / dt:.1f} hashes/s ({size}px)")
    if len(results) == 2:
        print(f"native speedup: {results['native'] / results['numpy']:.1f}x")
    return results


if __name__ == "__main__":
    bench_pdq()
    bench_inception()
