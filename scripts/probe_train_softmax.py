"""A/B: MXU-matmul row-sums vs VPU lane-reduces in the fused train
kernels' softmax (fwd denominator + backward sum(dp*p)).

Motivation: scripts/probe_attn_parts.py measured the inference engine's
softmax lane-reduces at 3.5 ms/fwd. The train kernels run the same
reduces in the forward AND recompute them in the backward, plus the
dsoftmax inner product. This probe monkeypatches _softmax_rows /
_softmax_bwd in BOTH fused_attn_vjp and fused_layer_vjp (the latter
imports them by value) with f32 MXU ones-matmul row-sums and times the
full donated train step (batch 256, fused per-layer VJP) same-process.

Usage: python scripts/probe_train_softmax.py [--batch 256] [--steps 20]
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

from transformer_latent_diffusion_tpu.ops import fused_attn_vjp as fa  # noqa: E402
from transformer_latent_diffusion_tpu.ops import fused_layer_vjp as fl  # noqa: E402
from transformer_latent_diffusion_tpu.ops.fused_block import _mm  # noqa: E402


def _rowsum_mxu(a):
    """(n, k) f32 -> (n, 1) f32 row-sum as an MXU ones-matmul (f32
    matmul = bf16x3 passes, ~f32 precision; N=128 for lane alignment)."""
    ones = jnp.ones((a.shape[-1], 128), jnp.float32)
    return _mm(a, ones)[:, :1]


def _softmax_rows_mxu(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / _rowsum_mxu(e)


def _softmax_bwd_mxu(p, dp):
    return p * (dp - _rowsum_mxu(dp * p))


def build_step(batch):
    from transformer_latent_diffusion_tpu.configs import (
        DenoiserConfig,
        TrainConfig,
    )
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.train.train import _build_train_step
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig(image_size=32, noise_embed_dims=256, patch_size=2,
                         embed_dim=768, dropout=0, n_layers=12,
                         text_emb_size=768)
    model = Denoiser(**cfg.__dict__, dtype=jnp.bfloat16, fused_layer_vjp=True)
    params = init_denoiser_params(model, cfg)
    train_cfg = TrainConfig(batch_size=batch)
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
    return step_fn, state


def time_case(name, batch, steps, patch):
    orig = (fa._softmax_rows, fa._softmax_bwd,
            fl._softmax_rows, fl._softmax_bwd)
    if patch:
        fa._softmax_rows = fl._softmax_rows = _softmax_rows_mxu
        fa._softmax_bwd = fl._softmax_bwd = _softmax_bwd_mxu
    try:
        step_fn, state = build_step(batch)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((batch, 4, 32, 32)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((batch, 768)), jnp.float32)
        t0 = time.time()
        state, loss = step_fn(state, x, y, jax.random.PRNGKey(0))
        _ = float(loss)
        print(f"{name}: compile+first {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        for i in range(steps):
            state, loss = step_fn(state, x, y, jax.random.fold_in(
                jax.random.PRNGKey(1), i))
        _ = float(loss)
        dt = (time.time() - t0) / steps
        print(f"{name:10s} {dt * 1e3:7.1f} ms/step  "
              f"{batch / dt:6.0f} samples/s", flush=True)
        return dt
    finally:
        (fa._softmax_rows, fa._softmax_bwd,
         fl._softmax_rows, fl._softmax_bwd) = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    base = time_case("base", args.batch, args.steps, patch=False)
    mxu = time_case("mxu-sum", args.batch, args.steps, patch=True)
    print(f"\nspeedup: {base / mxu:.3f}x")


if __name__ == "__main__":
    main()
