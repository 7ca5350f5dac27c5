"""Training-step throughput on the real TPU (flagship 101M model).

Times the full donated jitted train step (Beta noise sampling,
corruption, CFG dropout, fwd/bwd through the fused per-layer VJP
kernels, Adam, EMA) at batch 256, mirroring how train.main runs it.
Prints ms/step and samples/sec. Compare with docs/DESIGN.md's measured
table and the reference A100 anchor (~578 samples/s, BASELINE.md).

Usage: python scripts/bench_train.py [--batch 256] [--steps 20]
       [--no-fused] (XLA path instead of fused VJP kernels)
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
import optax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--image-size", type=int, default=32,
                    help="latent size: 32 = 256px flagship, 64 = 512px "
                         "fine-tune regime (1024 tokens, degraded fused path)")
    args = ap.parse_args()

    from transformer_latent_diffusion_tpu.configs import (
        DenoiserConfig,
        TrainConfig,
    )
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.train.train import _build_train_step
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    print(f"backend={jax.default_backend()} batch={args.batch}", flush=True)

    cfg = DenoiserConfig(
        image_size=args.image_size, noise_embed_dims=256, patch_size=2,
        embed_dim=768, dropout=0, n_layers=12, text_emb_size=768,
    )
    fused = not args.no_fused
    model = Denoiser(**cfg.__dict__, dtype=jnp.bfloat16,
                     fused_layer_vjp=fused)
    params = init_denoiser_params(model, cfg)
    train_cfg = TrainConfig(batch_size=args.batch)
    optimizer = optax.adam(train_cfg.lr)
    state = {
        "params": params,
        "ema_params": jax.tree.map(jnp.copy, params),
        "opt_state": optimizer.init(params),
        "step": jnp.asarray(0),
    }

    step_fn = jax.jit(
        _build_train_step(model, optimizer, train_cfg, vae_scale_factor=8.0),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (args.batch, 4, args.image_size, args.image_size)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((args.batch, 768)), jnp.float32)

    t0 = time.time()
    state, loss = step_fn(state, x, y, jax.random.PRNGKey(0))
    _ = float(loss)
    print(f"compile+first step: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    for i in range(args.steps):
        state, loss = step_fn(state, x, y, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
    _ = float(loss)
    dt = (time.time() - t0) / args.steps
    print(f"fused={fused}  {dt * 1e3:.1f} ms/step  "
          f"{args.batch / dt:.0f} samples/sec", flush=True)

    # roofline evidence (VERDICT r1 #3): achieved train-step TFLOPS vs
    # the measured chip GEMM peak. fwd+bwd = 3x the forward matmul FLOPs
    # (activation grad + weight grad each re-run every GEMM).
    if jax.default_backend() not in ("cpu",):
        from bench import denoiser_flops_per_call, measure_peak_tflops

        peak = measure_peak_tflops()
        flops_per_step = 3.0 * denoiser_flops_per_call(cfg, args.batch)
        tflops = flops_per_step / dt / 1e12
        import json

        print(json.dumps({
            "train_flops_per_step": flops_per_step,
            "train_tflops": round(tflops, 1),
            "measured_peak_tflops_bf16": round(peak, 1),
            "train_pct_of_peak": round(100 * tflops / peak, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
