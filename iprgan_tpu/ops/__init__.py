from iprgan_tpu.ops.ssim import ssim, ms_ssim, gaussian_window  # noqa: F401
from iprgan_tpu.ops.paste import paste_corner, corner_slices  # noqa: F401
