"""TPU timing for the editing paths (img2img / inpaint / negative prompt).

The editing triad (generate(init_latents=, mask=, negative_labels=) —
beyond the reference, which only has text-to-image) was built and
parity-tested on CPU; this probe measures what each variant costs on the
real chip relative to plain text-to-image, same process (benchmark
processes have ~70 ms warm-up noise; only same-process A/B is
trustworthy):

  * t2i          — the bench.py workload (batch 32, 50-step DDIM, VAE).
  * negative     — same + negative_labels (identical graph: the uncond
                   half just changes content; expect ~0 delta).
  * img2img 0.5  — strength=0.5 skips half the schedule => its own
                   n_steps scan graph (fresh compile, then ~half the
                   sampling time).
  * inpaint      — masked run (run_masked): a DIFFERENT scan body (mask
                   pinning per step) => fresh scan-of-pallas graph. This
                   is the one to watch: a fresh scan harness around the
                   fused engine once measured a 200x compile artifact
                   (CLAUDE.md timing methodology note). Compile time is
                   printed separately from steady-state.

Run on the real TPU: python scripts/probe_editing.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transformer_latent_diffusion_tpu.configs import DenoiserConfig  # noqa: E402
from transformer_latent_diffusion_tpu.models import Denoiser  # noqa: E402
from transformer_latent_diffusion_tpu.models.vae import FlaxVae  # noqa: E402
from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator  # noqa: E402
from transformer_latent_diffusion_tpu.utils import init_denoiser_params  # noqa: E402


def time_variant(name, fn, reps=4):
    t0 = time.time()
    fn(0)
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(reps):
        t0 = time.time()
        fn(i + 1)
        best = min(best, time.time() - t0)
    print(f"{name:16s} compile+warm {compile_s:7.1f}s   "
          f"steady {best * 1000:7.0f} ms   {32 / best:6.1f} imgs/s")
    return best


def main():
    tiny = "--tiny" in sys.argv  # CPU smoke mode: default DenoiserConfig
    if tiny:
        # smoke mode must not wait on the tunnel (jax is pre-imported on
        # the axon platform by sitecustomize; env vars are too late)
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
    fast_apply = None
    if on_tpu:
        from transformer_latent_diffusion_tpu.models.fast_denoiser import (
            make_fused_apply,
        )
        fast_apply = make_fused_apply(cfg, compute_dtype=dtype)
    vae = (FlaxVae.create(block_out_channels=(8, 16), layers_per_block=1,
                          dtype=dtype)
           if tiny else FlaxVae.create(dtype=dtype))
    gen = DiffusionGenerator(model=model, params=params, vae=vae,
                             model_dtype=dtype, fast_apply=fast_apply)

    num_imgs, n_iter = 32, 50  # bench.py workload
    key = jax.random.PRNGKey(0)
    labels = jax.random.normal(key, (num_imgs, 768))
    neg = jax.random.normal(jax.random.PRNGKey(9), (num_imgs, 768))
    init = jax.random.normal(jax.random.PRNGKey(1),
                             (num_imgs, cfg.n_channels, cfg.image_size,
                              cfg.image_size)) * 0.5
    s = cfg.image_size
    mask = np.zeros((s, s), np.float32)
    mask[: s // 2] = 1.0

    common = dict(labels=labels, n_iter=n_iter, num_imgs=num_imgs,
                  class_guidance=6, img_size=s, sharp_f=0, bright_f=0,
                  use_ddpm_plus=False)

    def sync(out):
        img, _ = out
        return float(jnp.sum(img))

    t_t2i = time_variant(
        "t2i", lambda sd: sync(gen.generate(seed=sd, **common)))
    time_variant(
        "negative", lambda sd: sync(gen.generate(
            seed=sd, negative_labels=neg, **common)))
    time_variant(
        "img2img s=0.5", lambda sd: sync(gen.generate(
            seed=sd, init_latents=init, strength=0.5, **common)))
    t_inp = time_variant(
        "inpaint", lambda sd: sync(gen.generate(
            seed=sd, init_latents=init, mask=mask, **common)))
    print(f"inpaint / t2i steady ratio: {t_inp / t_t2i:.3f} "
          f"(mask pinning adds elementwise work only; >1.1x would mean "
          f"the masked scan graph lost fusion)")


if __name__ == "__main__":
    main()
