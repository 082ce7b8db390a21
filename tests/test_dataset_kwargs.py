"""Dataset-config kwargs reach the loader (reference experiments pass
the whole ``dataset`` mapping through; see e.g. reference
experiments/image_generation.py `configure_dataset`).

Every extra key in the config's ``dataset`` block (e.g. ``n`` for the
synthetic corpora) must be forwarded to the registered loader — the
experiments must not hard-code a whitelist of kwargs.  Regression test
for the full-budget configs, which size the synthetic corpora via
``dataset.n``.
"""

from tests.test_cyclegan_train import make_cg_config
from tests.test_dcgan_train import make_config
from tests.test_srgan_train import make_sr_config


def test_generation_forwards_extra_dataset_kwargs(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_config(tmp_path)
    config.dataset["n"] = 48  # synthetic() default is 2048
    exp = get_experiment(config.experiment)(config)
    assert len(exp.dataset) == 48


def test_super_resolution_forwards_extra_dataset_kwargs(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_sr_config(tmp_path)
    config.dataset["n"] = 7  # sr_synthetic() default is 64
    exp = get_experiment(config.experiment)(config)
    assert len(exp.dataset) == 7


def test_translation_forwards_extra_dataset_kwargs(tmp_path):
    from iprgan_tpu.experiments import get_experiment

    config = make_cg_config(tmp_path)
    config.dataset["n"] = 5  # unaligned_synthetic() default is 12
    exp = get_experiment(config.experiment)(config)
    assert len(exp.dataset.arrays_a) == 5
