from transformer_latent_diffusion_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    initialize_distributed,
    param_shardings,
    replicated,
)
from transformer_latent_diffusion_tpu.parallel.launcher import (  # noqa: F401
    launch,
)
from transformer_latent_diffusion_tpu.parallel.pipeline import (  # noqa: F401
    PipelinedDenoiser,
    merge_block_params,
    split_block_params,
    stacked_block_shardings,
)
