"""A/B the real fused engine bf16 vs int8 at the flagship shape, in a
chained scan (one dispatch, one sync) — calibrates probe_int8_stage's
harness and gives the true engine-level int8 speedup without the
sampler/VAE around it.

Usage: python scripts/probe_int8_engine.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transformer_latent_diffusion_tpu.configs import DenoiserConfig  # noqa: E402
from transformer_latent_diffusion_tpu.models import Denoiser  # noqa: E402
from transformer_latent_diffusion_tpu.models.fast_denoiser import (  # noqa: E402
    make_fused_apply,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params  # noqa: E402

B = 64  # CFG-doubled batch 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    cfg = DenoiserConfig(image_size=32, noise_embed_dims=256, patch_size=2,
                         embed_dim=768, dropout=0, n_layers=12,
                         text_emb_size=768)
    model = Denoiser(**cfg.__dict__, dtype=jnp.bfloat16)
    params = init_denoiser_params(model, cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 4, 32, 32)) * 0.5, jnp.float32)
    noise = jnp.full((B, 1), 0.5, jnp.float32)
    label = jnp.asarray(rng.standard_normal((B, 768)) * 0.1, jnp.float32)

    # matmul flops per forward (matches bench.denoiser_flops_per_call)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import denoiser_flops_per_call

    flops = denoiser_flops_per_call(cfg, B)

    for quant in (None, "int8"):
        eng = make_fused_apply(cfg, compute_dtype=jnp.bfloat16,
                               quantize=quant)
        prepared = jax.jit(eng.prepare)(params)

        def step(x_t, _):
            y = eng.apply_prepared(prepared, x_t, noise, label)
            return y * 0.5 + x * 0.5, None  # keep values bounded, no CSE

        fn = jax.jit(lambda x0, n: jax.lax.scan(step, x0, None, length=n)[0],
                     static_argnums=(1,))
        t0 = time.time()
        float(jnp.sum(fn(x, 2)))
        print(f"quant={quant}: compiled in {time.time() - t0:.0f}s",
              flush=True)
        t0 = time.time()
        float(jnp.sum(fn(x, args.iters)))
        dt = (time.time() - t0) / args.iters
        print(f"quant={quant}: {dt * 1e3:7.2f} ms/fwd  "
              f"{flops / dt / 1e12:6.1f} TFLOPS(matmul)", flush=True)


if __name__ == "__main__":
    main()
