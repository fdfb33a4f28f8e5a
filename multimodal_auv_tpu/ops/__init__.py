from multimodal_auv_tpu.ops.preprocess import (  # noqa: F401
    normalize_images,
    normalize_multimodal,
    normalize_optical,
)
from multimodal_auv_tpu.ops.sampling import (  # noqa: F401
    gaussian_reparam,
    gaussian_shift_scale,
)
