from transformer_latent_diffusion_tpu.utils.common import (  # noqa: F401
    count_parameters,
    count_parameters_per_layer,
    init_denoiser_params,
    make_grid,
    slerp,
    to_pil,
    uint8_grid_to_pil,
)
