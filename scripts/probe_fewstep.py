"""TPU throughput of few-step (consistency-style) sampling.

The reference's open TODO "speed up generation even more - LCMs?" is
implemented in train/distill.py + generate(fresh_noise=True). Weights
don't affect throughput, so this probes the flagship geometry untrained:

  * ddim-50      — the bench.py exact workload (batch 32, fused engine).
  * dpm-15       — the reference's headline step count.
  * lcm-4/lcm-2  — fresh-noise consistency multistep, consistency_apply
                   wrapping the FUSED engine (the prepare protocol is
                   preserved, so weight packing stays hoisted out of
                   the scan and steady-state stays Pallas-fast).

Expectation: model calls scale with steps, so 4-step should push the
VAE decode toward dominance — the interesting number is where
imgs/s saturates. Run on the real TPU: python scripts/probe_fewstep.py
(--tiny for a CPU smoke).
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
from transformer_latent_diffusion_tpu.train import consistency_apply  # noqa: E402
from transformer_latent_diffusion_tpu.utils import init_denoiser_params  # noqa: E402


def time_variant(name, fn, num_imgs, reps=4):
    t0 = time.time()
    fn(0)
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(reps):
        t0 = time.time()
        fn(i + 1)
        best = min(best, time.time() - t0)
    print(f"{name:10s} compile+warm {compile_s:7.1f}s   "
          f"steady {best * 1000:7.0f} ms   {num_imgs / best:7.1f} imgs/s")


def main():
    tiny = "--tiny" in sys.argv
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    from bench import wait_for_backend

    on_tpu = wait_for_backend() not in ("cpu",)
    print(f"backend={jax.default_backend()}")
    cfg = DenoiserConfig() if tiny else DenoiserConfig(
        image_size=32, noise_embed_dims=256, patch_size=2, embed_dim=768,
        dropout=0, n_layers=12, text_emb_size=768,
    )
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = Denoiser(**cfg.__dict__, dtype=dtype)
    params = init_denoiser_params(model, cfg)
    engine = None
    if on_tpu:
        from transformer_latent_diffusion_tpu.models.fast_denoiser import (
            make_fused_apply,
        )
        engine = make_fused_apply(cfg, compute_dtype=dtype)
    vae = (FlaxVae.create(block_out_channels=(8, 16), layers_per_block=1,
                          dtype=dtype)
           if tiny else FlaxVae.create(dtype=dtype))

    num_imgs = 32
    labels = jax.random.normal(jax.random.PRNGKey(0), (num_imgs, 768))
    common = dict(labels=labels, num_imgs=num_imgs, img_size=cfg.image_size,
                  class_guidance=6, sharp_f=0, bright_f=0)

    def sync(out):
        img, _ = out
        return float(jnp.sum(img))

    gen = DiffusionGenerator(model=model, params=params, vae=vae,
                             model_dtype=dtype, fast_apply=engine)
    time_variant("ddim-50", lambda sd: sync(gen.generate(
        seed=sd, n_iter=50, use_ddpm_plus=False, **common)), num_imgs)
    time_variant("dpm-15", lambda sd: sync(gen.generate(
        seed=sd, n_iter=15, use_ddpm_plus=True, **common)), num_imgs)

    # consistency sampling: wrapper over the fused engine (prepare
    # protocol preserved); distilled models bake guidance in => g=1
    lcm = DiffusionGenerator(
        model=model, params=params, vae=vae, model_dtype=dtype,
        fast_apply=consistency_apply(model, inner=engine))
    lcm_common = dict(common, class_guidance=1)
    for steps in (4, 2):
        time_variant(f"lcm-{steps}", lambda sd, s=steps: sync(lcm.generate(
            seed=sd, n_iter=s, use_ddpm_plus=False, fresh_noise=True,
            **lcm_common)), num_imgs)


if __name__ == "__main__":
    main()
