"""512px (1024-token) TRAINING A/B: XLA attention vs Pallas flash fwd.

At 1024 tokens the fused-layer/attention backward kernels are gated off
(fail to compile); training runs fused-MLP + attention. The flash
attention kernel is differentiable (Pallas forward + XLA-recompute
backward via custom_vjp) — does enabling it beat pure-XLA attention for
hi-res fine-tuning?

Usage: python scripts/probe_highres_train.py [--batch 64] [--steps 10]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--image-size", type=int, default=64,
                    help="latent size: 64 = 512px, 128 = 1024px")
    ap.add_argument("--remat", action="store_true",
                    help="gradient-checkpoint each decoder block")
    ap.add_argument("--only-flash", action="store_true",
                    help="skip the XLA-attention variant (it OOMs at "
                         "batch 16 / 4096 tokens; the flash path's "
                         "chunked backward does not)")
    args = ap.parse_args()
    b = args.batch
    s_lat = args.image_size

    from transformer_latent_diffusion_tpu.configs import (
        DenoiserConfig,
        TrainConfig,
    )
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.train.train import (
        _build_train_step,
        make_optimizer,
    )
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig(image_size=s_lat, noise_embed_dims=256,
                         patch_size=2, embed_dim=768, dropout=0, n_layers=12)
    tc = TrainConfig(batch_size=b)
    on_tpu = jax.default_backend() not in ("cpu",)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((b, 4, s_lat, s_lat)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, 768)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    params = None
    variants = (("xla attention", False), ("flash attention", True))
    if args.only_flash:
        variants = (("flash attention", True),)
    for tag, use_pallas in variants:
        model = Denoiser(**cfg.__dict__,
                         dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                         use_pallas=use_pallas, fused_mlp_vjp=on_tpu,
                         remat=args.remat)
        if params is None:
            params = init_denoiser_params(model, cfg)
        opt = make_optimizer(tc)
        state = {
            "params": jax.tree.map(jnp.copy, params),
            "ema_params": jax.tree.map(jnp.copy, params),
            "opt_state": opt.init(params),
            "step": jnp.asarray(0),
        }
        step = jax.jit(_build_train_step(model, opt, tc, 8.0),
                       donate_argnums=(0,))
        t0 = time.time()
        state, loss = step(state, x, y, key)
        _ = float(loss)
        first = time.time() - t0
        t0 = time.time()
        for i in range(args.steps):
            state, loss = step(state, x, y, jax.random.fold_in(key, i))
        _ = float(loss)
        dt = (time.time() - t0) / args.steps
        print(f"{tag:16s} {dt * 1e3:7.1f} ms/step ({b / dt:5.1f} samples/s; "
              f"compile {first:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
