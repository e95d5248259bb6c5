from super_resolution_tpu.parallel.dp import (  # noqa: F401
    BATCH_AXIS,
    batch_sharded,
    make_mesh,
    pad_batch_to_mesh,
    replicated,
    shard_batch_iter,
    shard_state,
)
from super_resolution_tpu.parallel.tiling import (  # noqa: F401
    blend_window,
    bucket_tile_h,
    extract_tiles,
    plan_tiles,
    tiled_upscale,
)
