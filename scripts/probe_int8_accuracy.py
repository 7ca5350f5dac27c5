"""Quantify lossy-mode drift on the flagship model: 50-step DDIM
latents vs the exact bf16 fused engine, same seed/labels, for
(a) the W8A8 int8 engine and (b) Delta-DiT block caching at interval 2
and 3.

Reports cosine similarity and relative L2/Linf of the final latents —
the honest accuracy statement for the opt-in acceleration modes (random
init; trained weights are typically easier than random ones since
activations are better conditioned).

Usage: python scripts/probe_int8_accuracy.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.models.fast_denoiser import (
        make_fused_apply,
    )
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = DenoiserConfig(
        image_size=32, noise_embed_dims=256, patch_size=2, embed_dim=768,
        dropout=0, n_layers=12, text_emb_size=768,
    )
    model = Denoiser(**cfg.__dict__, dtype=jnp.bfloat16)
    params = init_denoiser_params(model, cfg)
    labels = jax.random.normal(jax.random.PRNGKey(0), (8, 768))

    def run(mode, interval):
        engine = make_fused_apply(cfg, compute_dtype=jnp.bfloat16,
                                  quantize=mode)
        gen = DiffusionGenerator(model=model, params=params, vae=None,
                                 model_dtype=jnp.bfloat16, fast_apply=engine)
        _, lat = gen.generate(labels=labels, n_iter=50, num_imgs=8,
                              class_guidance=6, seed=11,
                              img_size=cfg.image_size,
                              sharp_f=0, bright_f=0, use_ddpm_plus=False,
                              cache_interval=interval)
        return np.asarray(jax.device_get(lat), np.float64)

    base = run(None, 1)
    print(f"bf16 exact: std={base.std():.4f}", flush=True)
    a = base.ravel()
    for tag, mode, interval in (("int8", "int8", 1),
                                ("cache2", None, 2),
                                ("cache3", None, 3)):
        b = run(mode, interval).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        rel_l2 = np.linalg.norm(a - b) / np.linalg.norm(a)
        rel_linf = np.abs(a - b).max() / np.abs(a).max()
        print(f"{tag:8s} cosine={cos:.5f} rel_l2={rel_l2:.4f} "
              f"rel_linf={rel_linf:.4f}", flush=True)


if __name__ == "__main__":
    main()
