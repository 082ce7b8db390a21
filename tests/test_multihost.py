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
