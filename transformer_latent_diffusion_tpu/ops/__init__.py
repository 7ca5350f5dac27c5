from transformer_latent_diffusion_tpu.ops.attention import (  # noqa: F401
    multi_head_attention,
)
