from transformer_latent_diffusion_tpu.models.blocks import (  # noqa: F401
    DecoderBlock,
    MLP,
    MLPSepConv,
    SelfAttention,
    CrossAttention,
    sinusoidal_embedding,
)
from transformer_latent_diffusion_tpu.models.denoiser import (  # noqa: F401
    MLP_CLASSES,
    Denoiser,
    DenoiserTransBlock,
    expand_input_channels,
    patchify,
    resize_pos_embed,
    unpatchify,
)
from transformer_latent_diffusion_tpu.models.moe import MoEMLP  # noqa: F401
