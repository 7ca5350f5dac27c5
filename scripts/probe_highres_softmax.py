"""A/B: MXU row-sums in the flash-attention BACKWARD kernels at the
512px training shape (1024 tokens, batch 64 — the hi-res hybrid path:
Pallas flash fwd/bwd attention + fused MLP VJP).

Toggles ops.attention._ROWSUM_VIA_MXU same-process (jit caches cleared
between cases, since the flag is read at trace time).

Usage: python scripts/probe_highres_softmax.py [--batch 64] [--steps 10]
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

from transformer_latent_diffusion_tpu.ops import attention as attn_mod  # noqa: E402


def time_case(name, batch, steps, mxu_rowsum):
    attn_mod._ROWSUM_VIA_MXU = mxu_rowsum
    jax.clear_caches()
    try:
        from transformer_latent_diffusion_tpu.configs import (
            DenoiserConfig,
            TrainConfig,
        )
        from transformer_latent_diffusion_tpu.models import Denoiser
        from transformer_latent_diffusion_tpu.train.train import (
            _build_train_step,
        )
        from transformer_latent_diffusion_tpu.utils import (
            init_denoiser_params,
        )

        cfg = DenoiserConfig(image_size=64, noise_embed_dims=256,
                             patch_size=2, embed_dim=768, dropout=0,
                             n_layers=12, text_emb_size=768)
        # hi-res hybrid: flash attention (use_pallas) + fused MLP VJP
        model = Denoiser(**cfg.__dict__, dtype=jnp.bfloat16,
                         use_pallas=True, fused_mlp_vjp=True)
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
            _build_train_step(model, optimizer, train_cfg,
                              vae_scale_factor=8.0),
            donate_argnums=(0,),
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((batch, 4, 64, 64)), jnp.float32)
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
        print(f"{name:12s} {dt * 1e3:7.1f} ms/step  "
              f"{batch / dt:6.0f} samples/s", flush=True)
        return dt
    finally:
        attn_mod._ROWSUM_VIA_MXU = True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    base = time_case("vpu-reduce", args.batch, args.steps, mxu_rowsum=False)
    mxu = time_case("mxu-rowsum", args.batch, args.steps, mxu_rowsum=True)
    print(f"\n512px train speedup: {base / mxu:.3f}x")


if __name__ == "__main__":
    main()
