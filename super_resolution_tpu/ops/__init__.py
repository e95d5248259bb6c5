"""Device-side ops: pixel shuffle, nearest upsample, bicubic resize, and
Pallas kernels for the fused hot paths."""

from super_resolution_tpu.ops.shuffle import (  # noqa: F401
    nearest_upsample,
    pixel_shuffle,
)
from super_resolution_tpu.ops.resize import (  # noqa: F401
    bicubic_downsample,
    bicubic_resize,
)
from super_resolution_tpu.ops.ensemble import self_ensemble  # noqa: F401
