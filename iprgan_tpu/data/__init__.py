from iprgan_tpu.data.datasets import ArrayDataset, get_dataset  # noqa: F401
from iprgan_tpu.data import sr_datasets  # noqa: F401  (register SR loaders)
from iprgan_tpu.data import unaligned_datasets  # noqa: F401
from iprgan_tpu.registry import DATASETS  # noqa: F401
