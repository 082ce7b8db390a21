"""The generated 45-config matrix parses and matches the reference
schema (SURVEY.md section 2.2)."""

import glob
import os

from iprgan_tpu.config import Config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_45_configs_parse():
    paths = sorted(glob.glob(os.path.join(ROOT, "configs", "**", "*.yaml"),
                             recursive=True))
    # configs/full_budget/, configs/demos/ and configs/perf/ hold
    # repo-local run recipes (budget artifacts, convergence demos,
    # measured high-throughput variants), not part of the reference's
    # 45-config matrix.
    skip_dirs = {"full_budget", "demos", "perf"}
    paths = [p for p in paths
             if not skip_dirs & set(p.split(os.sep))]
    assert len(paths) == 45

    families = {"DCGAN": 0, "VAE": 0, "SRGAN": 0, "CycleGAN": 0}
    for p in paths:
        cfg = Config.parse(p)
        families[cfg.model.type] += 1
        # universal schema
        for key in ("dataset", "evaluation", "experiment", "model",
                    "hparam", "log", "resource", "seed"):
            assert key in cfg, (p, key)
        assert cfg.seed == 1234

        tier = os.path.basename(os.path.dirname(p))
        if tier == "baselines":
            assert cfg.protection is None
            assert cfg.evaluation.get("p_thres") is None
        else:
            assert cfg.protection.bbox is not None
            assert cfg.protection.bbox.loss_fn == "ssim"
            expected_p = 0.01 if cfg.model.type == "DCGAN" else 0.05
            assert cfg.evaluation.p_thres == expected_p
            if tier == "black-box":
                assert cfg.protection.wbox is None
            else:
                assert cfg.protection.wbox.gamma_0 == 0.1
                assert cfg.protection.wbox.string.startswith("EXAMPLE ")

    assert families == {"DCGAN": 18, "VAE": 9, "SRGAN": 9, "CycleGAN": 9}


def test_flagship_config_values():
    cfg = Config.parse(os.path.join(
        ROOT, "configs", "DCGAN", "complete", "dcgan-cifar10-a.yaml"))
    assert cfg.hparam.bsz == 64 and cfg.hparam.iteration == 100000
    assert cfg.model.G == "ConvGenerator32"
    assert cfg.protection.bbox.fn_out.size == 16
    assert cfg.log.freq == 1000

    sr = Config.parse(os.path.join(
        ROOT, "configs", "SRGAN", "complete", "srgan-imagenet-a.yaml"))
    assert sr.hparam.pretrain_iter == 1000000
    assert len(sr.evaluation.data) == 3  # set5/set14/bsd100

    cg = Config.parse(os.path.join(
        ROOT, "configs", "CycleGAN", "complete", "cyclegan-city-a.yaml"))
    assert cg.model.pool_size == 50 and cg.hparam.iteration == 200
    assert cg.dataset.load == 143 and cg.dataset.crop == 128

    wm = cfg.protection.bbox.fn_out.watermark
    assert os.path.exists(os.path.join(ROOT, wm.lstrip("./")))
