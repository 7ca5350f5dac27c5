"""Hi-res inference A/B: pure XLA vs Pallas flash-attn vs fused-MLP vs both.

The fully-fused layer engine is gated to <=256 tokens (VMEM thrash
beyond); this probe measures, same-process, which hybrid wins for 512px
(1024 tokens) and 1024px (4096 tokens) generation:

  xla        Denoiser(use_pallas=False, fused_mlp_vjp=False)
  flash      + Pallas flash attention kernel (ops/attention.py)
  fmlp       + fused MLP-sepconv Pallas op (ops/fused_mlp_vjp.py)
  flash+fmlp both

Usage: python scripts/probe_highres_hybrid.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    print(f"backend={jax.default_backend()}", flush=True)
    labels = jax.random.normal(jax.random.PRNGKey(0), (4, 768))

    for latent_size, n_imgs, n_iter in ((64, 4, 20), (128, 2, 10)):
        cfg = DenoiserConfig(
            image_size=latent_size, noise_embed_dims=256, patch_size=2,
            embed_dim=768, dropout=0, n_layers=12, text_emb_size=768,
        )
        params = None
        results = {}
        for tag, pallas_attn, fmlp in (
            ("xla", False, False),
            ("flash", True, False),
            ("fmlp", False, True),
            ("flash+fmlp", True, True),
        ):
            model = Denoiser(**cfg.__dict__, dtype=jnp.bfloat16,
                             use_pallas=pallas_attn, fused_mlp_vjp=fmlp)
            if params is None:
                params = init_denoiser_params(model, cfg)
            gen = DiffusionGenerator(model=model, params=params, vae=None,
                                     model_dtype=jnp.bfloat16)

            def run(seed):
                _, lat = gen.generate(
                    labels=labels[:n_imgs], n_iter=n_iter, num_imgs=n_imgs,
                    class_guidance=6, seed=seed, img_size=latent_size,
                    sharp_f=0, bright_f=0, use_ddpm_plus=False)
                return float(jnp.sum(jnp.abs(lat)))

            try:
                t0 = time.time()
                s = run(3)
                first = time.time() - t0
                assert s == s, "NaN"
                t0 = time.time()
                run(4)
                dt = time.time() - t0
                results[tag] = dt
                print(f"  {latent_size}-latent {tag:11s}: {dt:6.2f}s "
                      f"({n_imgs / dt:5.2f} imgs/s; compile {first:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"  {latent_size}-latent {tag:11s}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        if "xla" in results:
            best = min(results, key=results.get)
            print(f"{latent_size}-latent best: {best} "
                  f"({results['xla'] / results[best]:.2f}x vs xla)",
                  flush=True)


if __name__ == "__main__":
    main()
