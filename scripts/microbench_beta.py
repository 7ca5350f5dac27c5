"""Isolate the cost of the library train step vs its pieces.

Reproduces scripts/bench_train.py's number with the real
_build_train_step, then re-times it with jax.random.beta monkeypatched
to a cheap uniform — isolating the Beta(a,b) rejection sampler cost on
this TPU runtime.

Usage: python scripts/microbench_beta.py [--batch 256]
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


def bench_step(tag, model, params, batch, reps=10):
    from transformer_latent_diffusion_tpu.configs import TrainConfig
    from transformer_latent_diffusion_tpu.train.train import _build_train_step

    optimizer = optax.adam(3e-4)
    # copy: the donated step invalidates these buffers, and the caller
    # reuses `params` across bench_step invocations
    params = jax.tree.map(jnp.copy, params)
    state = {
        "params": params,
        "ema_params": jax.tree.map(jnp.copy, params),
        "opt_state": optimizer.init(params),
        "step": jnp.asarray(0),
    }
    step_fn = jax.jit(
        _build_train_step(model, optimizer, TrainConfig(batch_size=batch),
                          vae_scale_factor=8.0),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 4, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((batch, 768)), jnp.float32)

    t0 = time.time()
    state, loss = step_fn(state, x, y, jax.random.PRNGKey(0))
    _ = float(loss)
    first = time.time() - t0
    t0 = time.time()
    for i in range(reps):
        state, loss = step_fn(state, x, y, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
    _ = float(loss)
    dt = (time.time() - t0) / reps
    print(f"{tag:28s} {dt * 1e3:8.1f} ms/step  {batch / dt:6.0f} samples/s"
          f"  (first {first:.1f}s)", flush=True)


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

    # the library step now uses the closed-form Beta(1, b) inverse CDF
    bench_step("lib train_step", model, params, args.batch)

    import transformer_latent_diffusion_tpu.train.train as train_mod

    real_sampler = train_mod.sample_beta
    train_mod.sample_beta = lambda key, a, b, shape: jax.random.beta(
        key, a, b, shape)
    try:
        bench_step("lib train_step (rejection beta)", model, params,
                   args.batch)
    finally:
        train_mod.sample_beta = real_sampler


if __name__ == "__main__":
    main()
