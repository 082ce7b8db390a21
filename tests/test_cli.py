"""CLI integration: train.py end-to-end in a subprocess, then eval.py."""

import json
import os
import subprocess
import sys

import yaml
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["IPRGAN_FAKE_INCEPTION"] = "1"
    env["IPRGAN_JAX_CACHE"] = "/root/.jax_test_cache"
    env["PYTHONPATH"] = cwd
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1200)


def test_train_and_eval_cli(tmp_path):
    from tests.test_dcgan_train import make_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = make_config(tmp_path, iteration=2, freq=2)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(config.to_dict()))

    r = _run(["train.py", "-c", str(cfg_path)], repo)
    assert r.returncode == 0, r.stderr[-3000:]

    log = config.log.path
    assert os.path.exists(os.path.join(log, "checkpoint.msgpack"))
    metrics = json.load(open(os.path.join(log, "metrics.json")))
    assert "synthetic" in metrics and "FID" in metrics["synthetic"]
    assert float(metrics["synthetic"]["WBOX"]) == 0.0

    # eval.py reloads the saved config + checkpoint strictly
    r2 = _run(["eval.py", "-l", log, "--cpu"], repo)
    assert r2.returncode == 0, r2.stderr[-3000:]
    metrics2 = json.load(open(os.path.join(log, "metrics.json")))
    assert "synthetic" in metrics2
