"""Capability probe: 512px and 1024px generation on the real TPU.

Runs the full sampler at latent sizes 64 (1024 tokens; fused-engine
upper bound) and 128 (4096 tokens; XLA fallback path), with pos-embed
2D-resize from the flagship 32-table — the reference's documented
high-res mechanism (README.md:22-26) as a first-class op. Reports
imgs/sec (latents only) and finiteness; one 512px VAE decode sanity.

Usage: python scripts/probe_highres_generate.py
"""

from __future__ import annotations

import os
import sys
import time

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
    labels8 = jax.random.normal(jax.random.PRNGKey(0), (4, 768))

    for latent_size, n_imgs, n_iter in ((64, 4, 20), (128, 2, 10)):
        cfg = DenoiserConfig(
            image_size=latent_size, noise_embed_dims=256, patch_size=2,
            embed_dim=768, dropout=0, n_layers=12, text_emb_size=768,
        )
        model = Denoiser(**cfg.__dict__, dtype=jnp.bfloat16)
        params = init_denoiser_params(model, cfg)
        hw = latent_size // cfg.patch_size
        engine = make_fused_apply(cfg) if hw <= 32 else None
        gen = DiffusionGenerator(model=model, params=params, vae=None,
                                 model_dtype=jnp.bfloat16, fast_apply=engine)
        t0 = time.time()
        _, lat = gen.generate(labels=labels8[:n_imgs], n_iter=n_iter,
                              num_imgs=n_imgs, class_guidance=6, seed=3,
                              img_size=latent_size, sharp_f=0, bright_f=0,
                              use_ddpm_plus=False)
        first = time.time() - t0
        t0 = time.time()
        _, lat = gen.generate(labels=labels8[:n_imgs], n_iter=n_iter,
                              num_imgs=n_imgs, class_guidance=6, seed=4,
                              img_size=latent_size, sharp_f=0, bright_f=0,
                              use_ddpm_plus=False)
        s = float(jnp.sum(jnp.abs(lat)))
        dt = time.time() - t0
        px = latent_size * 8
        engine_tag = "fused" if engine is not None else "xla"
        assert s == s, "NaN latents"
        print(f"{px}px ({hw * hw} tokens, {engine_tag}): {n_imgs} imgs, "
              f"{n_iter} steps in {dt:.2f}s ({n_imgs / dt:.2f} imgs/s; "
              f"first+compile {first:.1f}s)", flush=True)

    # one 512px VAE decode sanity (64x64 latents -> 512x512 RGB)
    from transformer_latent_diffusion_tpu.models.vae import FlaxVae

    vae = FlaxVae.create(dtype=jnp.bfloat16)
    t0 = time.time()
    img = vae.decode(jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64, 64)))
    s = float(jnp.sum(jnp.abs(img)))
    assert s == s
    print(f"512px VAE decode (2 imgs): {time.time() - t0:.2f}s "
          f"shape={img.shape}", flush=True)


if __name__ == "__main__":
    main()
