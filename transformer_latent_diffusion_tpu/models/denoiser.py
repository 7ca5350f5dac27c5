"""Transformer-based denoiser (Flax linen), TPU-first.

Capability parity with the reference model layer
(/root/reference/tld/denoiser.py): patchify -> learned positional
embedding -> N DiT decoder blocks -> unpatchify, conditioned on a 2-token
(noise, text) sequence. TPU-first design choices: patchify is a pure
reshape + matmul (no conv — it lands on the MXU as one big GEMM), the
positional table is sliced for shorter sequences and can be 2D-resized for
high-res generation, and compute runs in a configurable dtype (bf16 on TPU).
Public array layout matches the reference API: latents are NCHW.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from transformer_latent_diffusion_tpu.models.blocks import (
    LN_EPS,
    MLP,
    DecoderBlock,
    MLPSepConv,
    _gelu,
    sinusoidal_embedding,
)
from transformer_latent_diffusion_tpu.models.moe import MoEMLP

# DenoiserConfig.mlp_class values -> FFN modules. "sep_conv" is the
# reference default (transformer_blocks.py:89-113); "moe" is the
# beyond-reference expert-parallel FFN (models/moe.py).
MLP_CLASSES = {"sep_conv": MLPSepConv, "mlp": MLP, "moe": MoEMLP}


def patchify(x: jax.Array, patch_size: int) -> jax.Array:
    """(B, C, H, W) -> (B, h*w, C*p*p) with (c, p1, p2) flatten order.

    The (c, p1, p2) order matches the reference's conv-patchify weight
    layout (denoiser.py:34-45) so converted torch weights drop in.
    """
    b, c, hh, ww = x.shape
    p = patch_size
    h, w = hh // p, ww // p
    x = x.reshape(b, c, h, p, w, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (b, h, w, c, p1, p2)
    return x.reshape(b, h * w, c * p * p)


def unpatchify(x: jax.Array, patch_size: int, h: int, w: int, n_channels: int) -> jax.Array:
    """(B, h*w, C*p*p) -> (B, C, H, W); inverse of `patchify`.

    Parity: reference rearrange "b (h w) (c p1 p2) -> b c (h p1) (w p2)"
    (denoiser.py:47-52).
    """
    b = x.shape[0]
    p = patch_size
    x = x.reshape(b, h, w, n_channels, p, p)
    x = x.transpose(0, 3, 1, 4, 2, 5)  # (b, c, h, p1, w, p2)
    return x.reshape(b, n_channels, h * p, w * p)


class DenoiserTransBlock(nn.Module):
    """Patchify + pos-embed + DiT stack + unpatchify.

    Parity: reference DenoiserTransBlock (denoiser.py:10-82).
    """

    patch_size: int
    img_size: int
    embed_dim: int
    dropout: float
    n_layers: int
    mlp_multiplier: int = 4
    n_channels: int = 4
    use_pallas: bool = False
    fused_mlp_vjp: bool = False
    fused_attn_vjp: bool = False
    fused_layer_vjp: bool = False
    # gradient checkpointing: rematerialize each decoder block in the
    # backward pass instead of storing its activations. Necessary for
    # 1024px (4096-token) training — without it the saved per-layer
    # (B, 4096, 768) residuals OOM the 16GB HBM at batch 16.
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    # sequence parallelism: shard self-attention's token dim over the
    # mesh 'model' axis (parallel/sequence.py). Set via
    # TrainConfig.sequence_parallel; excludes the fused Pallas kernels.
    seq_mesh: Any = None
    # FFN selection + MoE knobs (see MLP_CLASSES / models/moe.py)
    mlp_class: str = "sep_conv"
    n_experts: int = 8
    expert_capacity_factor: float = 1.25
    ep_mesh: Any = None

    @nn.compact
    def __call__(self, x, cond, deterministic: bool = True,
                 pos_embed_override: Optional[jax.Array] = None):
        p = self.patch_size
        b, c, hh, ww = x.shape
        h, w = hh // p, ww // p
        seq_len = (self.img_size // p) ** 2
        patch_dim = self.n_channels * p * p

        tokens = patchify(x, p).astype(self.dtype)
        # conv-patchify == per-patch linear; LN -> Dense -> LN as reference
        tokens = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="patch_norm1")(
            nn.Dense(patch_dim, dtype=self.dtype, name="patch_proj")(tokens)
        )
        tokens = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="patch_norm2")(
            nn.Dense(self.embed_dim, dtype=self.dtype, name="embed_proj")(tokens)
        )

        pos_table = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=1.0),
            (seq_len, self.embed_dim),
        )
        if pos_embed_override is not None:
            # high-res path: caller passes a 2D-resized table (see
            # resize_pos_embed); shape (h*w, embed_dim)
            pos = pos_embed_override
        else:
            # slice for shorter sequences, like the reference's
            # precomputed_pos_enc[: x.size(1)] (denoiser.py:76)
            pos = jax.lax.slice_in_dim(pos_table, 0, h * w, axis=0)
        tokens = tokens + pos.astype(self.dtype)[None, :, :]

        block_cls = DecoderBlock
        if self.remat:
            # deterministic (arg 3) is a static python bool
            block_cls = nn.remat(DecoderBlock, static_argnums=(3,))
        for i in range(self.n_layers):
            tokens = block_cls(
                embed_dim=self.embed_dim,
                mlp_multiplier=self.mlp_multiplier,
                dropout_level=self.dropout,
                mlp_class=MLP_CLASSES[self.mlp_class],
                n_experts=self.n_experts,
                expert_capacity_factor=self.expert_capacity_factor,
                ep_mesh=self.ep_mesh,
                use_pallas=self.use_pallas,
                fused_mlp_vjp=self.fused_mlp_vjp,
                fused_attn_vjp=self.fused_attn_vjp,
                fused_layer_vjp=self.fused_layer_vjp,
                seq_mesh=self.seq_mesh,
                dtype=self.dtype,
                name=f"decoder_block_{i}",
            )(tokens, cond, deterministic)

        out = nn.Dense(patch_dim, dtype=self.dtype, name="out_proj")(tokens)
        return unpatchify(out.astype(jnp.float32), p, h, w, self.n_channels)


class Denoiser(nn.Module):
    """Top-level denoiser. Parity: reference Denoiser (denoiser.py:85-126).

    __call__(x, noise_level, label):
      x           (B, n_channels, S, S) noisy latent
      noise_level (B, 1) in (0, 1)
      label       (B, text_emb_size) pooled CLIP text embedding
    returns x0 prediction, same shape as x.
    """

    image_size: int
    noise_embed_dims: int
    patch_size: int
    embed_dim: int
    dropout: float
    n_layers: int
    text_emb_size: int = 768
    mlp_multiplier: int = 4
    n_channels: int = 4
    use_pallas: bool = False
    fused_mlp_vjp: bool = False
    fused_attn_vjp: bool = False
    fused_layer_vjp: bool = False
    remat: bool = False  # checkpoint each decoder block (hi-res training)
    dtype: jnp.dtype = jnp.float32
    seq_mesh: Any = None  # sequence-parallel attention mesh (see blocks.py)
    # FFN selection + MoE knobs (see MLP_CLASSES / models/moe.py)
    mlp_class: str = "sep_conv"
    n_experts: int = 8
    expert_capacity_factor: float = 1.25
    ep_mesh: Any = None  # expert-parallel mesh (experts over 'model')
    # input latent width; None = n_channels. The outpainting fine-tune
    # (reference README.md "Outpainting model") feeds 2*n_channels
    # (noisy latent + masked context); the forward pass is shape-driven
    # (patchify + Dense infer the width), this field records the
    # contract for init/sampling/training glue.
    input_channels: Optional[int] = None
    # what the network predicts ("x0" | "eps" | "v"); the forward pass
    # is objective-agnostic — this records the training contract so the
    # sampler (DiffusionGenerator) and loss (train.build_loss_fn) agree
    # (see sampling.diffusion.prediction_to_x0)
    objective: str = "x0"

    @nn.compact
    def __call__(self, x, noise_level, label, deterministic: bool = True,
                 pos_embed_override: Optional[jax.Array] = None):
        noise_level = noise_level.astype(self.dtype)
        # fourier_feats: SinusoidalEmbedding -> Dense -> GELU -> Dense
        nemb = sinusoidal_embedding(noise_level, self.noise_embed_dims)
        nemb = nn.Dense(self.embed_dim, dtype=self.dtype, name="fourier_dense1")(nemb)
        nemb = _gelu(nemb)
        nemb = nn.Dense(self.embed_dim, dtype=self.dtype, name="fourier_dense2")(nemb)

        lemb = nn.Dense(self.embed_dim, dtype=self.dtype, name="label_proj")(
            label.astype(self.dtype)
        )

        cond = jnp.stack([nemb, lemb], axis=1)  # (B, 2, d)
        cond = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="cond_norm")(cond)

        return DenoiserTransBlock(
            patch_size=self.patch_size,
            img_size=self.image_size,
            embed_dim=self.embed_dim,
            dropout=self.dropout,
            n_layers=self.n_layers,
            mlp_multiplier=self.mlp_multiplier,
            n_channels=self.n_channels,
            use_pallas=self.use_pallas,
            fused_mlp_vjp=self.fused_mlp_vjp,
            fused_attn_vjp=self.fused_attn_vjp,
            fused_layer_vjp=self.fused_layer_vjp,
            remat=self.remat,
            seq_mesh=self.seq_mesh,
            mlp_class=self.mlp_class,
            n_experts=self.n_experts,
            expert_capacity_factor=self.expert_capacity_factor,
            ep_mesh=self.ep_mesh,
            dtype=self.dtype,
            name="denoiser_trans_block",
        )(x, cond, deterministic=deterministic,
          pos_embed_override=pos_embed_override)


def expand_input_channels(params, old_channels: int, new_channels: int,
                          patch_size: int):
    """Zero-init patchify-projection surgery for the outpainting model.

    The reference author widened the patchify conv from 4 to 8 input
    channels "and initialize[d] the mask channels parameters to zero;
    the rest of the architecture remained the same" (reference
    README.md, "Outpainting model" section — notebook-only there).
    Here patchify flattens (c, p1, p2) channel-major, so the original
    channels occupy the FIRST old_channels*p*p rows of the patch_proj
    kernel; the appended rows are zeros, making the widened model's
    output bit-equal to the original's for ANY context content until
    fine-tuning moves the new rows. Returns a new params tree.
    """
    if new_channels < old_channels:
        raise ValueError(f"cannot shrink input: {old_channels} -> "
                         f"{new_channels}")
    pp = patch_size * patch_size
    params = jax.tree_util.tree_map(lambda x: x, params)  # deep-copy dicts
    block = params["denoiser_trans_block"]
    k = block["patch_proj"]["kernel"]
    if k.shape[0] != old_channels * pp:
        raise ValueError(f"patch_proj kernel has {k.shape[0]} input rows, "
                         f"expected {old_channels}*{pp}")
    block["patch_proj"] = dict(
        block["patch_proj"],
        kernel=jnp.zeros((new_channels * pp, k.shape[1]), k.dtype)
        .at[: old_channels * pp].set(k),
    )
    return params


def resize_pos_embed(pos_table: jax.Array, old_grid: int, new_grid: int) -> jax.Array:
    """2D-resize a learned positional table for high-res generation.

    The reference documents pos-embed upsampling for 512/1024 px
    (README.md:22-26) but implements it in external notebooks; here it is a
    first-class op: (old², d) -> reshape to grid -> bilinear resize ->
    (new², d).
    """
    d = pos_table.shape[-1]
    grid = pos_table.reshape(old_grid, old_grid, d)
    resized = jax.image.resize(grid, (new_grid, new_grid, d), method="bilinear")
    return resized.reshape(new_grid * new_grid, d)
