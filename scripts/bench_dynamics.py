#!/usr/bin/env python
"""Training-dynamics probe: is bf16 safe for the protected training?

Trains the headline DCGAN-CIFAR10 complete workload (hinge GAN + SSIM
watermark consistency + sign loss — reference
configs/DCGAN/complete/dcgan-cifar10-a.yaml semantics) for a few
hundred steps in f32 and in bf16 on the default device, and checks the
protection-critical dynamics:

* the white-box BER must stay 0 in BOTH dtypes — the sign hinge holds
  the embedded signature in place;
* the bf16 watermark-loss trajectory must TRACK the f32 one (same
  seeds, same data): the P/SSIM endpoint within a loose relative band
  of f32's. (The absolute direction of P/SSIM over a short window from
  init is a property of the loss schedule — the adversarial term ramps
  while the trigger branch settles — so "decreases in N steps" is not a
  numerics test; agreement with f32 is.)
* GAN losses must stay finite.

This is what justifies quoting the bf16 steps/s as a usable number
rather than a kernel benchmark. Timing is irrelevant here; compiled
chunks are shared with bench.py (same shapes -> warm cache).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

STEPS_PER_CHUNK = 200
N_CHUNKS = 10


def probe(dtype_name: str):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("IPRGAN_JAX_CACHE",
                                     "/tmp/iprgan_jax_cache"))

    from __graft_entry__ import _dcgan_config
    import iprgan_tpu.models  # noqa: F401
    from iprgan_tpu.data import get_dataset
    from iprgan_tpu.protection.sign import compute_ber
    from iprgan_tpu.registry import MODELS

    dtype = {"f32": None, "bf16": jnp.bfloat16}[dtype_name]
    config = _dcgan_config(1, 64, "/tmp/iprgan_bench_log")
    model = MODELS("DCGAN")(config.model, protection_config=config.protection,
                            hparam={}, image_size=32, dtype=dtype)
    state = jax.device_put(model.init_state(jax.random.PRNGKey(0)))
    data = jnp.asarray(get_dataset("synthetic", size=32).images)

    @jax.jit
    def chunk(state, data_u8, rng):
        def body(state, key):
            kidx, kstep = jax.random.split(key)
            idx = jax.random.randint(kidx, (1, 64), 0, data_u8.shape[0])
            real = jnp.take(data_u8, idx, axis=0)
            real = real.astype(jnp.float32) / 127.5 - 1.0
            return model.train_step(state, {"real": real}, kstep)

        return jax.lax.scan(body, state, jax.random.split(rng,
                                                          STEPS_PER_CHUNK))

    rng = jax.random.PRNGKey(1)
    traj = []
    for c in range(N_CHUNKS):
        rng, k = jax.random.split(rng)
        state, metrics = chunk(state, data, k)
        ssim = np.asarray(metrics["P/SSIM"])
        gsum = np.asarray(metrics["G/Sum"])
        assert np.isfinite(gsum).all(), f"non-finite G/Sum in chunk {c}"
        traj.append(float(ssim[-20:].mean()))

    ber = float(compute_ber(jax.device_get(state["G"]["params"]),
                            jax.device_get(state["sign"])))
    steps = STEPS_PER_CHUNK * N_CHUNKS
    print(f"{dtype_name}: {steps} steps  BER {ber:.4f}  P/SSIM per chunk: "
          + " ".join(f"{v:.3f}" for v in traj), flush=True)
    return traj, ber


if __name__ == "__main__":
    traj32, ber32 = probe("f32")
    traj16, ber16 = probe("bf16")
    # last-half means: the watermark loss oscillates under the
    # adversarial competition, so single endpoints are noisy
    m32 = float(np.mean(traj32[N_CHUNKS // 2:]))
    m16 = float(np.mean(traj16[N_CHUNKS // 2:]))
    rel = abs(m16 - m32) / max(m32, 1e-6)
    ok = ber32 == 0.0 and ber16 == 0.0 and rel < 0.25
    print(f"bf16 vs f32 P/SSIM (last-half mean): {m16:.4f} vs {m32:.4f} "
          f"(rel {rel:.2%}); BER f32={ber32:.4f} bf16={ber16:.4f}")
    print("DYNAMICS", "OK" if ok else "FAILED", flush=True)
    sys.exit(0 if ok else 1)
