from iprgan_tpu.registry import EXPERIMENTS
from iprgan_tpu.experiments.image_generation import ImageGeneration  # noqa: F401


def get_experiment(name: str):
    return EXPERIMENTS(name)
