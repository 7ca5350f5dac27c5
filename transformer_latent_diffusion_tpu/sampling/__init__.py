from transformer_latent_diffusion_tpu.sampling.diffusion import (  # noqa: F401
    NOISE_SCHEDULES,
    DiffusionGenerator,
    cfg_combine,
    make_noise_levels,
    make_step_coeffs,
    prediction_to_x0,
    shift_noise_levels,
)
from transformer_latent_diffusion_tpu.sampling.pipeline import (  # noqa: F401
    DiffusionTransformer,
    download_file,
    encode_text,
)
