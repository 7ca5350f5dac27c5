"""Measure the cost of the guidance quality knobs (cfg_rescale +
guidance_interval) on the flagship 50-step fused-engine path.

The knobs add two per-sample std reductions + a where() to every scan
step — expected to be noise-level vs the denoiser forward, but this
runtime's per-op costs have surprised before, so: measure, same-process
A/B (process-to-process step noise is ~70 ms, CLAUDE.md).

Run on the TPU:  python scripts/probe_guidance_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from transformer_latent_diffusion_tpu.configs import DenoiserConfig  # noqa: E402
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.models.fast_denoiser import (
    make_fused_apply,
)
from transformer_latent_diffusion_tpu.models.vae import FlaxVae
from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
from transformer_latent_diffusion_tpu.utils import init_denoiser_params


def main():
    from bench import wait_for_backend  # rides out transient tunnel outages

    wait_for_backend()
    cfg = DenoiserConfig(
        image_size=32, noise_embed_dims=256, patch_size=2, embed_dim=768,
        dropout=0, n_layers=12, text_emb_size=768,
    )
    num_imgs, n_iter = 32, 50
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = Denoiser(**cfg.__dict__, dtype=dtype)
    params = init_denoiser_params(model, cfg)
    fast_apply = make_fused_apply(cfg, compute_dtype=dtype) if on_tpu else None
    vae = FlaxVae.create(dtype=dtype)
    gen = DiffusionGenerator(model=model, params=params, vae=vae,
                             model_dtype=dtype, fast_apply=fast_apply)
    labels = jax.random.normal(jax.random.PRNGKey(0), (num_imgs, 768))

    def run(seed, **kw):
        img, _ = gen.generate(
            labels=labels, n_iter=n_iter, num_imgs=num_imgs,
            class_guidance=6, seed=seed, img_size=cfg.image_size,
            sharp_f=0, bright_f=0, use_ddpm_plus=False, **kw)
        return float(jnp.sum(img))  # axon sync (block_until_ready no-op)

    variants = {
        "baseline": {},
        "rescale0.7": {"cfg_rescale": 0.7},
        "interval(0.1,0.95)": {"guidance_interval": (0.1, 0.95)},
        "both": {"cfg_rescale": 0.7, "guidance_interval": (0.1, 0.95)},
    }
    for name, kw in variants.items():
        t0 = time.time()
        run(0, **kw)
        print(f"{name}: warmup/compile {time.time() - t0:.1f}s", flush=True)

    n_rep = 3
    for name, kw in variants.items():
        t0 = time.time()
        for r in range(n_rep):
            run(r + 1, **kw)
        dt = (time.time() - t0) / n_rep
        print(f"{name}: {dt * 1000:.1f} ms/gen = "
              f"{num_imgs / dt:.2f} imgs/s", flush=True)


if __name__ == "__main__":
    main()
