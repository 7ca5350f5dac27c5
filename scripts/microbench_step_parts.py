"""Decompose the training step: fwd+bwd only vs adam+EMA only vs full.

Locates where the gap between the fused-kernel total (12 x (fwd+bwd)
from scripts/microbench_layer.py) and the full train step goes.

Usage: python scripts/microbench_step_parts.py [--batch 256]
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


def timed(tag, fn, *args, reps=10):
    t0 = time.time()
    out = fn(*args)
    _ = float(jax.tree.reduce(
        lambda a, b: a + jnp.sum(b).astype(jnp.float32), out,
        jnp.float32(0)))
    first = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.tree.reduce(
        lambda a, b: a + jnp.sum(b).astype(jnp.float32), out,
        jnp.float32(0)))
    dt = (time.time() - t0) / reps
    print(f"{tag:24s} {dt * 1e3:8.1f} ms  (first {first:.1f}s)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    print(f"backend={jax.default_backend()} batch={args.batch}", flush=True)

    cfg = DenoiserConfig(
        image_size=32, noise_embed_dims=256, patch_size=2, embed_dim=768,
        dropout=0, n_layers=12, text_emb_size=768,
    )
    model = Denoiser(**cfg.__dict__, dtype=jnp.bfloat16, fused_layer_vjp=True)
    params = init_denoiser_params(model, cfg)
    n_leaves = len(jax.tree.leaves(params))
    print(f"{n_leaves} param leaves", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, 4, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((args.batch, 768)), jnp.float32)
    nl = jnp.asarray(rng.uniform(0.01, 0.99, (args.batch, 1)), jnp.float32)

    def loss_fn(p):
        pred = model.apply({"params": p}, x, nl, y)
        return jnp.mean((pred - x) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    timed("fwd+bwd only", grad_fn, params)
    _, grads = grad_fn(params)

    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)

    @jax.jit
    def opt_only(grads, opt_state, params, ema):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: 0.999 * e + 0.001 * p, ema, params)
        return params, ema, opt_state

    ema = jax.tree.map(jnp.copy, params)
    timed("adam+ema only", opt_only, grads, opt_state, params, ema)

    @jax.jit
    def full(params, opt_state, ema):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: 0.999 * e + 0.001 * p, ema, params)
        return params, opt_state, ema, loss

    timed("full step", full, params, opt_state, ema)

    fwd_only = jax.jit(loss_fn)
    timed("fwd only", fwd_only, params)


if __name__ == "__main__":
    main()
