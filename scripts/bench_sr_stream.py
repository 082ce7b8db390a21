"""SRGAN end-to-end streaming throughput + device-idle fraction, on TPU.

Times the real experiment path (host decode/crop -> prefetch thread ->
device chunk with in-graph bicubic 1/4) and compares against the pure
device rate on pre-staged data. idle = 1 - t_device / t_e2e is the
fraction of wall-clock the chip waits on the host. A third row times
the HBM-parked path (``dataset.park: true``, data/parked.py) — crops
sampled inside the compiled chunk, zero host->device bytes per step —
whose e2e rate should match pure-device.

Run: python scripts/bench_sr_stream.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

CHUNK = 50
N_CHUNKS = 4


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("IPRGAN_JAX_CACHE", "/tmp/iprgan_jax_cache"))

    from iprgan_tpu.config import Config
    from iprgan_tpu.experiments import get_experiment
    from __graft_entry__ import _dcgan_config

    prot = _dcgan_config(1, 1, tempfile.mkdtemp()).protection
    prot["bbox"]["fn_inp"] = Config({"type": "RandomNoisePatch", "size": 6})
    prot["bbox"]["fn_out"]["size"] = 48
    config = Config({
        "dataset": {"name": "sr_synthetic", "path": "", "size": 96,
                    "n": 256},
        "evaluation": {"p_thres": 0.05, "data": []},
        "experiment": "ImageSuperResolution",
        "model": {"G": "SRResNet", "D": "Discriminator96",
                  "V": "VGG19Feature", "opt": "Adam",
                  "opt_param": {"lr": 1e-4}, "type": "SRGAN"},
        "hparam": {"bsz": 16, "pretrain_iter": 0,
                   "iteration": 10 ** 6, "steps_per_call": CHUNK},
        "log": {"freq": 10 ** 6, "path": tempfile.mkdtemp()},
        "protection": prot.to_dict(),
        "resource": {"gpu": True, "ngpu": 1, "worker": 2},
        "seed": 7,
    })
    exp = get_experiment(config.experiment)(config)

    # e2e: host streaming + prefetch + device chunk
    exp.train_chunk(CHUNK)  # compile + warm the prefetch pipeline
    t0 = time.perf_counter()
    for _ in range(N_CHUNKS):
        m = exp.train_chunk(CHUNK)
    _ = float(m["G/Sum"][-1])  # fence (block_until_ready no-ops on axon)
    t_e2e = (time.perf_counter() - t0) / (N_CHUNKS * CHUNK)

    # pure device: same compiled chunk on pre-staged data
    hr = exp._fetch(CHUNK)
    hr_dev = exp.pctx.shard_batch(hr, axis=2)
    chunk = exp._chunk_fn(CHUNK, "gan")
    state = exp.state
    rng = jax.random.PRNGKey(3)
    state, m = chunk(state, hr_dev, rng)
    _ = float(m["G/Sum"][-1])
    t0 = time.perf_counter()
    for _ in range(N_CHUNKS):
        rng, k = jax.random.split(rng)
        state, m = chunk(state, hr_dev, k)
    _ = float(m["G/Sum"][-1])
    t_dev = (time.perf_counter() - t0) / (N_CHUNKS * CHUNK)

    idle = 1.0 - t_dev / t_e2e
    print(f"e2e    : {1 / t_e2e:7.2f} steps/s ({t_e2e * 1e3:.2f} ms/step)")
    print(f"device : {1 / t_dev:7.2f} steps/s ({t_dev * 1e3:.2f} ms/step)")
    print(f"device idle fraction waiting on host: {max(idle, 0):.1%}")

    # parked: same experiment with dataset.park — crops sampled on device
    config.dataset["park"] = True
    config.log["path"] = tempfile.mkdtemp()
    exp_p = get_experiment(config.experiment)(config)
    exp_p.train_chunk(CHUNK)  # compile
    t0 = time.perf_counter()
    for _ in range(N_CHUNKS):
        m = exp_p.train_chunk(CHUNK)
    _ = float(m["G/Sum"][-1])
    t_park = (time.perf_counter() - t0) / (N_CHUNKS * CHUNK)
    idle_p = 1.0 - t_dev / t_park
    print(f"parked : {1 / t_park:7.2f} steps/s ({t_park * 1e3:.2f} ms/step)"
          f" — idle {max(idle_p, 0):.1%}")


if __name__ == "__main__":
    main()
