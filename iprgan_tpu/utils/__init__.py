from iprgan_tpu.utils.tb_writer import Logger, ImageWriter  # noqa: F401
from iprgan_tpu.utils.metrics_math import (  # noqa: F401
    calculate_frechet_distance,
    calculate_inception_score,
)
from iprgan_tpu.utils import checkpoint  # noqa: F401
