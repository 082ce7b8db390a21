"""Multi-host init hook: real 2-process CPU launch.

Validates the documented env contract of
``parallel.mesh.maybe_init_distributed`` end-to-end: two ranks launched
with IPRGAN_COORDINATOR/IPRGAN_NUM_PROCESSES/IPRGAN_PROCESS_ID join one
jax.distributed job, build a ParallelContext spanning both processes,
and exchange data through a cross-process allgather. This is the DCN
half of the parallel runtime that replaces the reference's
single-process DataParallel (reference experiments/base.py:24-43).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from iprgan_tpu.parallel.mesh import ParallelContext, maybe_init_distributed

pctx = ParallelContext(n_requested=2)  # ctor calls maybe_init_distributed
assert jax.process_count() == 2, jax.process_count()
assert pctx.n == 2, pctx.n
assert maybe_init_distributed._done

import jax.numpy as jnp
from jax.experimental import multihost_utils
pid = jax.process_index()
g = multihost_utils.process_allgather(jnp.float32(pid + 1))
assert sorted(g.tolist()) == [1.0, 2.0], g
print(f"rank {{pid}} OK")
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# Full training step across 2 processes: each rank owns one CPU device
# of a 2-device global mesh, the experiment driver runs UNCHANGED (the
# multi-process data path goes through ParallelContext._place /
# make_array_from_callback — device_put would raise on non-addressable
# devices), and the resulting metrics + parameters must equal a
# single-process run with the same global batch and seed.
_TRAIN_WORKER = """
import faulthandler, json, os, pathlib, sys, tempfile
faulthandler.enable()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, {repo!r})
import numpy as np
from tests.test_dcgan_train import make_config
from iprgan_tpu.experiments import get_experiment

ngpu = int(os.environ["WORKER_NGPU"])
bsz = int(os.environ["WORKER_BSZ"])
family = os.environ.get("WORKER_FAMILY", "dcgan")
tmp = pathlib.Path(tempfile.mkdtemp())
if family == "dcgan":
    # HBM-parked data path: dataset replicate()d once, indices sampled
    # on device
    config = make_config(tmp, ngpu=ngpu, bsz=bsz, iteration=8, freq=100)
else:
    # host-streamed data path: every chunk ships a host batch through
    # ParallelContext.shard_batch (the multi-process _place route)
    from tests.test_cyclegan_train import make_cg_config
    config = make_cg_config(tmp, epochs=2 * ngpu)
    config.resource.ngpu = ngpu
    config.hparam.bsz = bsz
exp = get_experiment(config.experiment)(config)
assert exp.pctx.n == ngpu, exp.pctx.n
m = exp.train_chunk(2)
out = {{k: [float(x) for x in v] for k, v in m.items()}}
target = "G" if family == "dcgan" else "GB"
kern = np.asarray(jax.device_get(
    jax.tree_util.tree_leaves(exp.state[target]["params"])[0]))
out["_k_absum"] = float(np.abs(kern).sum())
print("METRICS " + json.dumps(out, sort_keys=True))
if jax.process_count() > 1:
    # reach exit together: otherwise a rank that lags (e.g. a cold
    # compile on this 1-core host) can miss the 5-min coordination
    # shutdown barrier and take the whole job down as a flake
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("train_worker_done")
"""


def _run_train_workers(tmp_path, n_proc, ngpu, bsz, timeout,
                       family="dcgan"):
    script = tmp_path / f"train_worker_{n_proc}_{family}.py"
    script.write_text(_TRAIN_WORKER.format(repo=REPO))
    port = _free_port()
    procs = []
    for pid in range(n_proc):
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   WORKER_NGPU=str(ngpu), WORKER_BSZ=str(bsz),
                   WORKER_FAMILY=family)
        env.pop("XLA_FLAGS", None)  # 1 device per rank
        for k in ("IPRGAN_COORDINATOR", "IPRGAN_NUM_PROCESSES",
                  "IPRGAN_PROCESS_ID"):
            env.pop(k, None)
        if n_proc > 1:
            env.update(IPRGAN_COORDINATOR=f"127.0.0.1:{port}",
                       IPRGAN_NUM_PROCESSES=str(n_proc),
                       IPRGAN_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    bad = [pid for pid, p in enumerate(procs) if p.returncode != 0]
    if bad:
        # report EVERY failed rank: when the coordination service tears
        # the job down, the surviving rank only shows the barrier error
        # while the root cause is in the rank that died first
        blob = "\n".join(f"--- rank {pid}/{n_proc} (rc={procs[pid].returncode}) ---\n"
                         f"{outs[pid]}" for pid in bad)
        raise AssertionError(f"ranks {bad} failed:\n{blob}")
    metrics = []
    for out in outs:
        import json
        line = [l for l in out.splitlines() if l.startswith("METRICS ")][-1]
        metrics.append(json.loads(line[len("METRICS "):]))
    return metrics


def test_two_process_train_chunk_matches_single(tmp_path):
    import numpy as np

    # 2 ranks x (ngpu=2, bsz 4) -> global batch 8, vs 1 rank ngpu=1 bsz 8.
    # Same seed -> same on-device sampled batches -> same math up to
    # cross-device reduction order.
    multi = _run_train_workers(tmp_path, n_proc=2, ngpu=2, bsz=4,
                               timeout=1200)
    single = _run_train_workers(tmp_path, n_proc=1, ngpu=1, bsz=8,
                                timeout=1200)[0]
    assert multi[0] == multi[1]  # replicated outputs agree across ranks
    for key in ("D/Sum", "G/Sum", "G/Adv", "P/SSIM"):
        np.testing.assert_allclose(multi[0][key], single[key],
                                   rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(multi[0]["_k_absum"], single["_k_absum"],
                               rtol=1e-3)


def test_two_process_train_chunk_host_streamed(tmp_path):
    """Same 2-process equivalence through the HOST-STREAMED data path:
    CycleGAN ships a host batch into shard_batch every chunk (vs
    DCGAN's one-time replicate of an HBM-parked dataset), exercising
    the make_array_from_callback route for sharded per-step arrays."""
    import numpy as np

    multi = _run_train_workers(tmp_path, n_proc=2, ngpu=2, bsz=1,
                               timeout=1800, family="cyclegan")
    single = _run_train_workers(tmp_path, n_proc=1, ngpu=1, bsz=2,
                                timeout=1800, family="cyclegan")[0]
    assert multi[0] == multi[1]
    for key in ("G/Sum", "G/CycA", "D/SumA", "D/SumB", "P/SSIM", "LR"):
        np.testing.assert_allclose(multi[0][key], single[key],
                                   rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(multi[0]["_k_absum"], single["_k_absum"],
                               rtol=1e-3)


def test_two_process_cpu_launch(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            IPRGAN_COORDINATOR=f"127.0.0.1:{port}",
            IPRGAN_NUM_PROCESSES="2",
            IPRGAN_PROCESS_ID=str(pid),
        )
        # each rank gets its own (single) cpu device: drop the pytest
        # session's 8-device virtualization to keep ranks symmetric
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"rank {pid} OK" in out
