from super_resolution_tpu.data.augment import (  # noqa: F401
    augment_batch,
    denormalize,
    normalize,
    preprocess_batch,
    to_uint8_image,
)
from super_resolution_tpu.data.pipeline import (  # noqa: F401
    PatchLoader,
    SyntheticPatches,
    device_prefetch,
    list_images,
)
