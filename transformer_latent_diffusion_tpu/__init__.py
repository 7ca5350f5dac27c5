"""TPU-native text-to-image latent diffusion framework.

A from-scratch JAX/Flax/Pallas rebuild with the capabilities of
apapiu/transformer_latent_diffusion: a DiT denoiser over VAE latents with
CLIP text conditioning, a fully-jitted lax.scan sampler (DDIM and
DPM-Solver++(2M)) with classifier-free guidance, a sharded training loop,
an offline data pipeline, and an HTTP serving layer.
"""

from transformer_latent_diffusion_tpu.configs import (  # noqa: F401
    ClipConfig,
    DataConfig,
    DataDownloadConfig,
    DenoiserConfig,
    DenoiserLoad,
    LTDConfig,
    ModelConfig,
    TrainConfig,
    VaeConfig,
)

__version__ = "0.1.0"
