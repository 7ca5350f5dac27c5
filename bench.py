"""Headline benchmark: 256px images/sec/chip, 100M-param denoiser,
batch-32 generation, 50-step DDIM with CFG, bf16, including VAE decode.

Baseline (BASELINE.md): A100 generates 36 imgs in ~0.6 s at 15 DPM++
steps => ~60 imgs/s; scaled to 50 steps the model-bound anchor is
~18 imgs/s. vs_baseline = ours / 18.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec", "vs_baseline": N}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_ANCHOR_IMGS_PER_SEC = 18.0  # 50-step-DDIM-equivalent (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", choices=["int8"], default=None,
                    help="opt-in W8A8 engine (not the headline parity path)")
    ap.add_argument("--cache-interval", type=int, default=1,
                    help="opt-in Delta-DiT block caching: recompute the "
                         "middle layers every k-th step (1 = exact)")
    cli = ap.parse_args()

    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.models.vae import FlaxVae
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    log(f"backend={backend} devices={jax.devices()}")

    cfg = DenoiserConfig(
        image_size=32, noise_embed_dims=256, patch_size=2, embed_dim=768,
        dropout=0, n_layers=12, text_emb_size=768,
    )
    num_imgs = 32
    n_iter = 50

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = Denoiser(**cfg.__dict__, dtype=dtype)
    params = init_denoiser_params(model, cfg)

    use_pallas = on_tpu
    fast_apply = None
    if use_pallas:
        try:
            from transformer_latent_diffusion_tpu.models.fast_denoiser import (
                make_fused_apply,
            )

            fast_apply = make_fused_apply(cfg, compute_dtype=dtype,
                                          quantize=cli.quantize)
            x = jnp.ones((2, 4, 32, 32))
            v = float(jnp.sum(jax.jit(fast_apply)(
                params, x, jnp.full((2, 1), 0.5), jnp.ones((2, 768)))))
            assert v == v, "fused engine produced NaN"
        except Exception as e:  # pallas unavailable -> XLA path
            log(f"fused engine failed ({type(e).__name__}: {e}); XLA path")
            fast_apply = None
            use_pallas = False

    vae = FlaxVae.create(dtype=dtype)
    gen = DiffusionGenerator(
        model=model, params=params, vae=vae, model_dtype=dtype,
        fast_apply=fast_apply,
    )

    labels = jax.random.normal(jax.random.PRNGKey(0), (num_imgs, 768))

    def run(seed):
        img, lat = gen.generate(
            labels=labels, n_iter=n_iter, num_imgs=num_imgs,
            class_guidance=6, seed=seed, img_size=cfg.image_size,
            sharp_f=0, bright_f=0, use_ddpm_plus=False,  # DDIM per BASELINE
            cache_interval=cli.cache_interval,
        )
        # axon's block_until_ready is a no-op; fetching a scalar reduction
        # is the only reliable synchronization point (bulk device->host
        # transfers also crawl through the tunnel, so keep it tiny).
        return float(jnp.sum(img))

    log("compiling + warmup...")
    t0 = time.time()
    try:
        run(0)
    except Exception as e:
        # the remote-compile tunnel occasionally 500s/hangs on a first
        # attempt; one retry (compiles that DID land are cached)
        log(f"warmup failed ({type(e).__name__}: {e}); retrying once")
        time.sleep(10)
        run(0)
    log(f"warmup took {time.time() - t0:.1f}s")

    n_rep = 3
    t0 = time.time()
    for i in range(n_rep):
        run(i + 1)
    dt = time.time() - t0
    imgs_per_sec = num_imgs * n_rep / dt
    log(f"{num_imgs * n_rep} imgs in {dt:.2f}s (pallas={use_pallas})")

    metric = "256px_imgs_per_sec_per_chip_50step_ddim_b32_incl_vae"
    if cli.quantize:
        metric += f"_{cli.quantize}"
    if cli.cache_interval > 1:
        metric += f"_cache{cli.cache_interval}"
    print(json.dumps({
        "metric": metric,
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / A100_ANCHOR_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
