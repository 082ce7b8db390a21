"""Experiment driver base (reference experiments/base.py).

Owns the host-side orchestration around the compiled model functions:
logging, the data-parallel mesh, the chunked training loop (scan over
steps inside one jit), checkpoint/resume with the reference key schema,
and config-derived step accounting (weak scaling: iterations / n_chips,
batch x n_chips — reference experiments/base.py:36-39).
"""

from __future__ import annotations

import os
import time
from abc import ABC, abstractmethod
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

from iprgan_tpu.parallel import ParallelContext
from iprgan_tpu.utils import Logger, checkpoint
from iprgan_tpu.utils.checkpoint import CKPT_NAME, END_SENTINEL


def dtype_of(config):
    """resource.dtype: float32 (default) or bfloat16 compute dtype."""
    name = config.resource.get("dtype", "float32") \
        if "resource" in config else "float32"
    import jax.numpy as jnp

    return {"float32": None, "bfloat16": jnp.bfloat16}[name]


class Experiment(ABC):

    def __init__(self, config):
        assert config is not None, '"config" is undefined'
        self.config = config
        self.logger = Logger(config)
        # reference writes the *pre-rescale* config into the log dir
        # (experiments/base.py:15-17) — resume re-applies the rescale.
        with open(os.path.join(config.log.path, "config.yaml"), "w") as f:
            f.write(config.to_yaml())
        self.init_step = 1
        self.configure_device()

    # -- device / parallel -------------------------------------------------
    def configure_device(self):
        print("*** DEVICE ***")
        res = self.config.resource
        self.pctx = ParallelContext(
            n_requested=res.get("ngpu", 1),
            use_accel=bool(res.get("gpu", True)))
        n = self.pctx.n
        hparam = self.config.hparam
        if "pretrain_iter" in hparam.keys():
            hparam.pretrain_iter //= n
        hparam.iteration //= n
        hparam.bsz *= n
        print(self.pctx.describe())
        print()

    # -- abstract surface (reference experiments/base.py:21-55) -----------
    @abstractmethod
    def configure_dataset(self): ...

    @abstractmethod
    def configure_model(self): ...

    @abstractmethod
    def train_chunk(self, n: int) -> Dict[str, np.ndarray]:
        """Run n compiled steps; return stacked per-step metrics."""

    @abstractmethod
    def periodic_checkpoint(self, step: int): ...

    @abstractmethod
    def evaluate(self, fpath: str): ...

    # -- state dict --------------------------------------------------------
    def state_dict(self) -> Dict[str, Any]:
        sd = serialization.to_state_dict(jax.device_get(self.state))
        sd["step"] = int(sd["step"])
        return sd

    def load_state_dict(self, sd: Dict[str, Any], strict: bool = False):
        assert hasattr(self, "state"), '"state" not defined'
        new_state = dict(self.state)
        for key in self.state:
            if key == "step":
                continue
            if strict:
                assert key in sd, f"Missing key: {key}"
            if key in sd:
                new_state[key] = serialization.from_state_dict(
                    self.state[key], sd[key])
        step = sd.get("step", 0)
        if step == END_SENTINEL:
            total = self.config.hparam.get("pretrain_iter", 0) or 0
            total += self.config.hparam.iteration
            self.init_step = total
            new_state["step"] = np.int32(total)
        else:
            self.init_step = int(step) + 1
            new_state["step"] = np.int32(step)
        self.state = self.pctx.replicate(new_state)

    def save_checkpoint(self, step, fname: str = CKPT_NAME):
        sd = self.state_dict()
        sd["step"] = step
        checkpoint.save(os.path.join(self.config.log.path, fname), sd)

    # -- training loop -----------------------------------------------------
    @property
    def total_iterations(self) -> int:
        pre = self.config.hparam.get("pretrain_iter", 0) or 0
        return pre + self.config.hparam.iteration

    def start(self) -> bool:
        """Run the training loop. Returns True if it reached the full
        step budget, False if it stopped early on SIGTERM (preemption).

        Preemption handling: preemptible TPU fleets deliver SIGTERM with
        a grace window. The handler only sets a flag; the loop finishes
        the in-flight compiled chunk (host-side dispatch returns long
        before the device does — the flag is checked after the metrics
        fetch, which fences), checkpoints the last completed step under
        the normal rolling name, and returns. Auto-resume then continues
        from that exact step, so a kill/resume cycle loses zero steps.
        """
        import signal

        total = self.total_iterations
        freq = self.config.log.freq
        max_chunk = int(self.config.hparam.get("steps_per_call", 100))

        # optional device profiling: log.profile: true traces the first
        # post-warmup chunk into <log.path>/profile for xprof/tensorboard
        profile_at = 2 * max_chunk if self.config.log.get("profile") else -1

        self._preempted = False

        def _on_sigterm(signum, frame):
            self._preempted = True
            print("\nSIGTERM: checkpointing at the next chunk boundary "
                  "...", flush=True)

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread (tests) — no handler
            prev_handler = None

        print("*** TRAINING ***")
        step = self.init_step
        t0 = time.time()
        done_since = 0
        while step <= total:
            n = min(max_chunk, total - step + 1,
                    freq - ((step - 1) % freq))
            profiling = 0 <= profile_at <= step
            if profiling:
                jax.profiler.start_trace(
                    os.path.join(self.config.log.path, "profile"))
                profile_at = -1
            metrics = self.train_chunk(n)
            if profiling:
                jax.profiler.stop_trace()
            # train_chunk may execute FEWER steps than requested (the SR
            # driver clamps chunks at the pretrain/GAN boundary and the
            # halfway lr drop) — trust the returned per-step axis, not n
            n_done = min((len(v) for v in metrics.values()), default=n)
            for j in range(n_done):
                self.logger.write_scalar(
                    {k: float(v[j]) for k, v in metrics.items()}, step + j)
            step += n_done
            done_since += n_done
            if (step - 1) % freq == 0 or step > total:
                rate = done_since / max(time.time() - t0, 1e-9)
                print(f"step {step - 1}/{total}  {rate:.2f} steps/s")
                t0, done_since = time.time(), 0
                self.periodic_checkpoint(step - 1)
            if self._preempted and step <= total:
                self.save_checkpoint(step - 1)
                print(f"preempted at step {step - 1}/{total}; "
                      "checkpoint saved — rerun to resume")
                if prev_handler is not None:
                    signal.signal(signal.SIGTERM, prev_handler)
                return False

        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        self.final_checkpoint()
        print()
        return True

    def final_checkpoint(self):
        self.save_checkpoint(END_SENTINEL)
