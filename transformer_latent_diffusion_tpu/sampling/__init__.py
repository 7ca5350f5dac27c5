from transformer_latent_diffusion_tpu.sampling.diffusion import (  # noqa: F401
    DiffusionGenerator,
    make_noise_levels,
    make_step_coeffs,
)
from transformer_latent_diffusion_tpu.sampling.pipeline import (  # noqa: F401
    DiffusionTransformer,
    download_file,
    encode_text,
)
