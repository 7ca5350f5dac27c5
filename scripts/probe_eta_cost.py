"""Measure eta-stochastic DDIM's runtime cost on the flagship fused path.

eta > 0 adds, per scan step: a per-image threefry normal draw
(vmap(fold_in + normal) at the latent shape) plus ~4 elementwise ops
for the eps_hat re-mix. Against a 101M fused denoiser forward this
should be noise; this probe checks that on the real chip at the two
operating points (15-step headline / 50-step flagship), batch 32,
including VAE decode. eta=0 compiles the identical body to plain DDIM
(trace-time branch), so only eta>0 needs timing — the 0 column is the
control.

Run on the TPU:  python scripts/probe_eta_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from transformer_latent_diffusion_tpu.configs import DenoiserConfig  # noqa: E402
from transformer_latent_diffusion_tpu.models import Denoiser  # noqa: E402
from transformer_latent_diffusion_tpu.models.fast_denoiser import (  # noqa: E402
    make_fused_apply,
)
from transformer_latent_diffusion_tpu.models.vae import FlaxVae  # noqa: E402
from transformer_latent_diffusion_tpu.sampling import (  # noqa: E402
    DiffusionGenerator,
)
from transformer_latent_diffusion_tpu.utils import (  # noqa: E402
    init_denoiser_params,
)


def main():
    from bench import wait_for_backend

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

    def run(seed, n_iter, eta):
        img, _ = gen.generate(
            labels=labels, n_iter=n_iter, num_imgs=num_imgs,
            class_guidance=6, seed=seed, img_size=cfg.image_size,
            sharp_f=0, bright_f=0, sampler="ddim", eta=eta)
        return float(jnp.sum(img))

    variants = [(15, 0.0), (15, 0.5), (50, 0.0), (50, 0.5)]
    for n_iter, eta in variants:
        t0 = time.time()
        run(0, n_iter, eta)
        print(f"ddim@{n_iter} eta={eta}: warmup/compile "
              f"{time.time() - t0:.1f}s", flush=True)

    n_rep = 3
    for n_iter, eta in variants:
        t0 = time.time()
        for r in range(n_rep):
            run(r + 1, n_iter, eta)
        dt = (time.time() - t0) / n_rep
        print(f"ddim@{n_iter} eta={eta}: {dt * 1000:.1f} ms/gen = "
              f"{num_imgs / dt:.2f} imgs/s", flush=True)


if __name__ == "__main__":
    main()
