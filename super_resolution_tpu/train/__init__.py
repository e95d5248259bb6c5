from super_resolution_tpu.train.state import (  # noqa: F401
    GANTrainState,
    build_models,
    init_state,
    make_optimizer,
    n_params,
)
from super_resolution_tpu.train.steps import (  # noqa: F401
    eval_batch,
    make_gan_step,
    make_infer_fn,
    make_pretrain_step,
)
from super_resolution_tpu.train.loop import train  # noqa: F401
