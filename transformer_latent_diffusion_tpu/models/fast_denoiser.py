"""Fused inference engine for the denoiser (Pallas hot path).

A pure function over the SAME param pytree as `models.denoiser.Denoiser`
(so checkpoints, EMA params and converted torch weights are shared), but
executing each decoder block through the fused Pallas kernels in
`ops/fused_block.py`. This is the sampling-time engine the reference
reaches via torch SDPA + torch.compile (transformer_blocks.py:37,
train.py:90); training and autodiff keep the linen path.

Numerical contract: f32 LayerNorm/softmax/accumulation inside the kernels;
activations cross layers in `compute_dtype` (bf16 on TPU). Asserted
against the linen path by tests/test_fused_kernels.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from transformer_latent_diffusion_tpu.configs import DenoiserConfig
from transformer_latent_diffusion_tpu.models.blocks import (
    LN_EPS,
    _gelu,
    sinusoidal_embedding,
)
from transformer_latent_diffusion_tpu.models.denoiser import patchify, unpatchify
from transformer_latent_diffusion_tpu.ops.fused_block import (
    fused_attention_pair,
    fused_mlp_sepconv,
)


def _ln(x, p):
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - m), axis=-1, keepdims=True)
    out = (x32 - m) * jax.lax.rsqrt(var + LN_EPS)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p, dtype):
    out = x.astype(dtype) @ p["kernel"].astype(dtype)
    if "bias" in p:
        out = out + p["bias"].astype(dtype)
    return out


def make_fused_apply(cfg: DenoiserConfig, compute_dtype=jnp.bfloat16,
                     interpret: bool = False):
    """Build `apply(params, x, noise_level, label) -> x0_pred`.

    Mirrors Denoiser.__call__ (models/denoiser.py) exactly; reference
    semantics per /root/reference/tld/denoiser.py:116-126.
    """
    n_heads = cfg.embed_dim // 64
    p_sz = cfg.patch_size

    def apply(params: Any, x: jax.Array, noise_level: jax.Array,
              label: jax.Array) -> jax.Array:
        dt = compute_dtype
        # --- conditioning: fourier feats + label proj -> LN -> (B, 2, D)
        nemb = sinusoidal_embedding(noise_level.astype(dt), cfg.noise_embed_dims)
        nemb = _dense(nemb, params["fourier_dense1"], dt)
        nemb = _gelu(nemb)
        nemb = _dense(nemb, params["fourier_dense2"], dt)
        lemb = _dense(label.astype(dt), params["label_proj"], dt)
        cond = jnp.stack([nemb, lemb], axis=1)
        cond = _ln(cond, params["cond_norm"])

        tb = params["denoiser_trans_block"]
        b, c, hh, ww = x.shape
        h, w = hh // p_sz, ww // p_sz

        tokens = patchify(x, p_sz).astype(dt)
        tokens = _ln(_dense(tokens, tb["patch_proj"], dt), tb["patch_norm1"])
        tokens = _ln(_dense(tokens, tb["embed_proj"], dt), tb["patch_norm2"])

        pos = jax.lax.slice_in_dim(tb["pos_embed"], 0, h * w, axis=0)
        tokens = tokens + pos.astype(dt)[None]

        for i in range(cfg.n_layers):
            blk = tb[f"decoder_block_{i}"]
            # pre-project the 2-token conditioning KV outside the kernel
            kv = _dense(cond, blk["cross_attention"]["kv_linear"], dt)
            k_cond, v_cond = jnp.split(kv, 2, axis=-1)

            tokens = fused_attention_pair(
                tokens,
                blk["norm1"]["scale"], blk["norm1"]["bias"],
                blk["self_attention"]["qkv_linear"]["kernel"].astype(dt),
                blk["norm2"]["scale"], blk["norm2"]["bias"],
                blk["cross_attention"]["q_linear"]["kernel"].astype(dt),
                k_cond, v_cond,
                n_heads=n_heads,
                interpret=interpret,
            )
            mlp = blk["mlp"]
            tokens = fused_mlp_sepconv(
                tokens,
                blk["norm3"]["scale"], blk["norm3"]["bias"],
                mlp["expand"]["kernel"].astype(dt), mlp["expand"]["bias"],
                mlp["depthwise_kernel"][:, :, 0, :].astype(dt),
                mlp["depthwise_bias"],
                mlp["contract"]["kernel"].astype(dt), mlp["contract"]["bias"],
                hw=h,
                interpret=interpret,
            )

        out = _dense(tokens, tb["out_proj"], dt)
        return unpatchify(out.astype(jnp.float32), p_sz, h, w, cfg.n_channels)

    return apply
