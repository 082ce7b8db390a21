"""Coverage for alternative trigger/loss variants: RandomBitMask and
TransformVar latent triggers, l1/mse watermark losses."""

import numpy as np

from iprgan_tpu.config import Config
from tests.test_dcgan_train import make_watermark
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def _config(tmp_path, fn_inp, loss_fn):
    wm = make_watermark(tmp_path)
    return Config({
        "dataset": {"name": "synthetic", "path": "", "size": 32},
        "evaluation": {"p_thres": 0.01,
                       "data": [{"bsz": 8, "name": "synthetic",
                                 "path": "", "size": 32}]},
        "experiment": "ImageGeneration",
        "model": {"G": "ConvGenerator32", "D": "SNDiscriminator32",
                  "opt": "Adam",
                  "opt_param": {"lr": 2.0e-4, "betas": [0.5, 0.999]},
                  "type": "DCGAN"},
        "hparam": {"bsz": 8, "iteration": 2, "steps_per_call": 2},
        "log": {"freq": 2, "path": str(tmp_path / "log")},
        "protection": {
            "bbox": {"fn_inp": fn_inp,
                     "fn_out": {"size": 16, "opaque": True,
                                "type": "PasteWatermark",
                                "watermark": wm},
                     "lambda": 1.0, "loss_fn": loss_fn},
            "wbox": None,
        },
        "resource": {"gpu": True, "ngpu": 1, "worker": 0},
        "seed": 7,
    })


def test_dcgan_bitmask_l1(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = _config(tmp_path,
                     {"type": "RandomBitMask", "n_bit": 16,
                      "constant": 3.0, "z_dim": 128}, "l1")
    exp = get_experiment(config.experiment)(config)
    assert exp.bbox and not exp.wbox
    assert "_mask" in exp.state["fn_inp"]
    m = exp.train_chunk(2)
    assert "P/L1" in m and np.isfinite(m["P/L1"]).all()
    assert "P/SignLoss" not in m  # wbox off


def test_dcgan_transform_var_mse(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = _config(tmp_path, {"type": "TransformVar"}, "mse")
    exp = get_experiment(config.experiment)(config)
    assert set(exp.state["fn_inp"]) == {"w", "a"}
    m = exp.train_chunk(2)
    assert "P/MSE" in m and np.isfinite(m["P/MSE"]).all()
