from iprgan_tpu.registry import EXPERIMENTS
from iprgan_tpu.experiments.image_generation import ImageGeneration  # noqa: F401
from iprgan_tpu.experiments.image_super_resolution import (  # noqa: F401
    ImageSuperResolution,
)
from iprgan_tpu.experiments.image_translation import (  # noqa: F401
    ImageTranslation,
)


def get_experiment(name: str):
    return EXPERIMENTS(name)
