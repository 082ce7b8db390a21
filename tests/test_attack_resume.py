"""attack.py control flow: auto-resume from the attack log dir's rolling
checkpoint, victim-weight injection only on a FRESH attack, and the
preemption contract (no merge/eval until the step budget is reached).

These run against a fake experiment class — no jit, no compiles — so
they live in the fast tier; the real compiled path is pinned by the
heavy tests in tests/test_attack_e2e.py (test_attack_finetune_resume).
"""

import argparse
import json
import os

import numpy as np
import pytest

from iprgan_tpu.utils import checkpoint as ckpt
from tests.test_dcgan_train import make_config


class FakeExperiment:
    """Records the calls attack.main makes; no device work."""

    instances = []

    def __init__(self, config):
        self.config = config
        self.loaded = []          # (state_dict, strict) pairs
        self.started = False
        self.evaluated = None
        self.state = {"step": 0}
        os.makedirs(config.log.path, exist_ok=True)
        FakeExperiment.instances.append(self)

    # scripted per-test
    start_result = True

    def load_state_dict(self, sd, strict=False):
        self.loaded.append((dict(sd), strict))

    def start(self):
        self.started = True
        return self.start_result

    def state_dict(self):
        return {"G": np.zeros(2, np.float32),
                "fn_inp": np.ones(2, np.float32), "step": 7}

    def evaluate(self, fpath):
        self.evaluated = fpath
        with open(fpath, "w") as f:
            json.dump({"synthetic": {"WBOX": 0.0}}, f)


@pytest.fixture
def harness(tmp_path, monkeypatch):
    import attack

    FakeExperiment.instances = []
    FakeExperiment.start_result = True
    monkeypatch.setattr("iprgan_tpu.experiments.get_experiment",
                        lambda name: FakeExperiment)
    config = make_config(tmp_path, iteration=4, freq=2)
    os.makedirs(config.log.path, exist_ok=True)
    victim_sd = {"G": np.arange(3, dtype=np.float32),
                 "D": np.arange(3, dtype=np.float32) * 2,
                 "sign": np.ones(2, np.float32), "step": "END"}
    ckpt.save(os.path.join(config.log.path, ckpt.CKPT_NAME), victim_sd)
    args = argparse.Namespace(mode="finetune", load_discriminator=False,
                              watermark=None, log=config.log.path)
    return attack, config, args


def test_fresh_attack_injects_victim_g(harness):
    attack, config, args = harness
    attack.main(config.copy(), args)
    atk = FakeExperiment.instances[0]
    assert atk.started
    # fresh: victim's ^G keys injected at step 0, D left out (no -d)
    (sd, strict), = atk.loaded
    assert not strict and sd["step"] == 0
    assert "G" in sd and "D" not in sd
    # merge+eval ran: victim checkpoint now carries the attacked G and
    # the attacker's fn_inp under the _ov suffix... (finetune has no
    # protection, but state_dict here returns fn_inp to pin the rename)
    merged = ckpt.load(os.path.join(config.log.path, ckpt.CKPT_NAME))
    assert merged["step"] == "END"            # victim's counter kept
    assert "fn_inp_ov" in merged
    ev = FakeExperiment.instances[1]
    assert ev.loaded[0][1] is True            # owner eval is strict
    assert os.path.exists(os.path.join(config.log.path, "metrics.json"))


def test_resume_skips_victim_injection(harness, capsys):
    attack, config, args = harness
    alt = attack.update_finetune_config(config.copy(),
                                        load_discriminator=False)
    os.makedirs(alt.log.path, exist_ok=True)
    mid_sd = {"G": np.full(3, 9.0, np.float32), "step": 5}
    ckpt.save(os.path.join(alt.log.path, ckpt.CKPT_NAME), mid_sd)

    attack.main(config.copy(), args)
    assert "Resuming attack from step 5" in capsys.readouterr().out
    atk = FakeExperiment.instances[0]
    (sd, strict), = atk.loaded
    # the attack's OWN rolling state was loaded, not the victim's G
    assert sd["step"] == 5
    np.testing.assert_array_equal(sd["G"], np.full(3, 9.0, np.float32))
    assert atk.started


def test_preempted_attack_defers_merge(harness):
    attack, config, args = harness
    FakeExperiment.start_result = False
    victim_path = os.path.join(config.log.path, ckpt.CKPT_NAME)
    before = open(victim_path, "rb").read()

    attack.main(config.copy(), args)

    assert open(victim_path, "rb").read() == before
    assert not os.path.exists(os.path.join(config.log.path,
                                           "metrics.json"))
    assert len(FakeExperiment.instances) == 1  # no eval experiment


def test_overwrite_resume_keeps_attacker_trigger(harness, monkeypatch,
                                                 tmp_path):
    """On overwrite-mode RESUME the attacker's fn_inp must come from the
    rolling checkpoint — resetting it again would fork the trigger the
    already-trained steps were conditioned on."""
    attack, config, args = harness
    from tests.test_dcgan_train import make_watermark
    wm_dir = tmp_path / "wm2"
    wm_dir.mkdir()
    args.mode = "overwrite"
    args.watermark = make_watermark(wm_dir)

    reset_calls = []
    monkeypatch.setattr(
        FakeExperiment, "model", property(lambda self: _FakeModel(
            reset_calls)), raising=False)

    alt = attack.update_overwrite_config(config.copy(), False,
                                         args.watermark)
    os.makedirs(alt.log.path, exist_ok=True)
    ckpt.save(os.path.join(alt.log.path, ckpt.CKPT_NAME),
              {"G": np.zeros(3, np.float32), "step": 3})

    attack.main(config.copy(), args)
    assert reset_calls == []  # trigger NOT re-reset on resume


class _FakeModel:
    def __init__(self, calls):
        class _FnInp:
            def reset(self, key, _calls=calls):
                _calls.append(key)
                return {}
        class _Prot:
            fn_inp = _FnInp()
        self.protection = _Prot()
