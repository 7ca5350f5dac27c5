"""Measure the reference's own headline config on this chip.

Reference README.md:133-136: generating a batch of 36 images at 15
DPM-Solver++(2M) steps takes ~3.5 s on a T4 and ~0.6 s on an A100
(where "the VAE decoding step" dominates). This probe runs the exact
same workload — batch 36, 15 DPM++ steps, CFG, VAE decode included —
on the flagship 101M denoiser with the fused bf16 engine, so README
can quote a direct apples-to-apples number.

Run on the real TPU: python scripts/probe_ref_headline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from transformer_latent_diffusion_tpu.configs import DenoiserConfig  # noqa: E402
from transformer_latent_diffusion_tpu.models import Denoiser  # noqa: E402
from transformer_latent_diffusion_tpu.models.vae import FlaxVae  # noqa: E402
from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator  # noqa: E402
from transformer_latent_diffusion_tpu.utils import init_denoiser_params  # noqa: E402


def main():
    from bench import wait_for_backend  # rides out transient tunnel outages

    on_tpu = wait_for_backend() not in ("cpu",)
    print(f"backend={jax.default_backend()}")
    cfg = DenoiserConfig(
        image_size=32, noise_embed_dims=256, patch_size=2, embed_dim=768,
        dropout=0, n_layers=12, text_emb_size=768,
    )
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = Denoiser(**cfg.__dict__, dtype=dtype)
    params = init_denoiser_params(model, cfg)

    fast_apply = None
    if on_tpu:
        from transformer_latent_diffusion_tpu.models.fast_denoiser import (
            make_fused_apply,
        )
        fast_apply = make_fused_apply(cfg, compute_dtype=dtype)

    vae = FlaxVae.create(dtype=dtype)
    gen = DiffusionGenerator(model=model, params=params, vae=vae,
                             model_dtype=dtype, fast_apply=fast_apply)

    # batch 32, not the reference's 36: the fused engine's per-layer
    # kernels are compiled (and cached) at the bench.py batch; a batch-36
    # (72 with CFG) variant forces a fresh Mosaic compile that measured
    # >30 min through the remote-compile tunnel. imgs/s is the
    # batch-size-comparable unit either way.
    num_imgs, n_iter = 32, 15
    labels = jax.random.normal(jax.random.PRNGKey(0), (num_imgs, 768))

    def run(seed):
        img, _ = gen.generate(
            labels=labels, n_iter=n_iter, num_imgs=num_imgs,
            class_guidance=6, seed=seed, img_size=cfg.image_size,
            sharp_f=0, bright_f=0, use_ddpm_plus=True,  # DPM++ like the ref
        )
        return float(jnp.sum(img))  # axon: scalar fetch is the only sync

    t0 = time.time()
    run(0)
    print(f"compile+warmup {time.time() - t0:.1f}s")
    best = float("inf")
    for i in range(5):
        t0 = time.time()
        run(i + 1)
        best = min(best, time.time() - t0)
    rate = num_imgs / best
    print(f"batch-{num_imgs}, {n_iter}-step DPM++ incl. VAE decode: "
          f"{best * 1000:.0f} ms ({rate:.1f} imgs/s)")
    # reference anchors (README.md:133-136): 36 imgs / 3.5 s on T4
    # (10.3 imgs/s), 36 imgs / 0.6 s on A100 (60 imgs/s)
    print(f"vs reference: T4 {rate / (36 / 3.5):.2f}x, "
          f"A100 {rate / (36 / 0.6):.2f}x")


if __name__ == "__main__":
    main()
