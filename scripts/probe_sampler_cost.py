"""Measure sampler throughput at matched NFE on the flagship fused-engine
path (quality side: probe_sampler_quality.py).

Heun makes 2 denoiser calls per scan step, so at a call budget B it runs
(B+1)//2 steps — the per-image work is the same B fused forwards plus
double the (cheap) update arithmetic. Expectation: imgs/s within a few
percent of ddim at equal NFE; this probe checks that on the real chip.
Schedules are levels-array-only (same compiled scan) — zero cost by
construction, so only samplers are timed.

Run on the TPU:  python scripts/probe_sampler_cost.py
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
    num_imgs = 32
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = Denoiser(**cfg.__dict__, dtype=dtype)
    params = init_denoiser_params(model, cfg)
    fast_apply = make_fused_apply(cfg, compute_dtype=dtype) if on_tpu else None
    vae = FlaxVae.create(dtype=dtype)
    gen = DiffusionGenerator(model=model, params=params, vae=vae,
                             model_dtype=dtype, fast_apply=fast_apply)
    labels = jax.random.normal(jax.random.PRNGKey(0), (num_imgs, 768))

    def run(seed, sampler, n_iter):
        img, _ = gen.generate(
            labels=labels, n_iter=n_iter, num_imgs=num_imgs,
            class_guidance=6, seed=seed, img_size=cfg.image_size,
            sharp_f=0, bright_f=0, sampler=sampler)
        return float(jnp.sum(img))  # axon sync (block_until_ready no-op)

    # (sampler, n_iter) at two NFE budgets: 15 (the reference headline
    # step count) and 50 (the flagship bench)
    variants = [("ddim", 15), ("dpm", 15), ("heun", 8),
                ("ddim", 50), ("dpm", 50), ("heun", 25)]
    for sampler, n_iter in variants:
        t0 = time.time()
        run(0, sampler, n_iter)
        print(f"{sampler}@{n_iter}: warmup/compile {time.time() - t0:.1f}s",
              flush=True)

    n_rep = 3
    for sampler, n_iter in variants:
        nfe = n_iter if sampler != "heun" else 2 * (n_iter - 1) + 1
        t0 = time.time()
        for r in range(n_rep):
            run(r + 1, sampler, n_iter)
        dt = (time.time() - t0) / n_rep
        print(f"{sampler}@{n_iter} (NFE {nfe}): {dt * 1000:.1f} ms/gen = "
              f"{num_imgs / dt:.2f} imgs/s", flush=True)


if __name__ == "__main__":
    main()
