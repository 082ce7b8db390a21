from iprgan_tpu.protection.transforms import (  # noqa: F401
    PasteWatermark,
    RandomBitMask,
    RandomNoisePatch,
    TransformDist,
    TransformVar,
    make_transform,
)
from iprgan_tpu.protection.sign import (  # noqa: F401
    BitGenerator,
    compute_ber,
    embed_signs,
    iter_norm_scale_paths,
    sign_loss,
)
from iprgan_tpu.protection.losses import make_loss  # noqa: F401
