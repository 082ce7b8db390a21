from iprgan_tpu.data.datasets import ArrayDataset, get_dataset  # noqa: F401
from iprgan_tpu.registry import DATASETS  # noqa: F401
