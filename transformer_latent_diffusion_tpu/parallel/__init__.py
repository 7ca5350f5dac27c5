from transformer_latent_diffusion_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    initialize_distributed,
    param_shardings,
    replicated,
)
