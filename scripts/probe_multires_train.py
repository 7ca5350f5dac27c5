"""Multi-resolution bucketed training on the real chip: per-bucket step
time inside one interleaved loop vs each bucket solo.

The design claim (docs/DESIGN.md) is that static-shape bucket interleave
has NO cross-bucket cost — each shape owns a compiled step and the only
difference vs solo runs is alternating dispatches. This probe checks
that on hardware, with the flagship 256px config (fused-layer kernels,
batch 256) interleaved with a 512px bucket (flash+fused-MLP hybrid path
via the per-shape gates, batch 64, non-native grid -> differentiable
pos-table resize in the loss).

Run on the TPU:  python scripts/probe_multires_train.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from transformer_latent_diffusion_tpu.configs import (  # noqa: E402
    DenoiserConfig,
    TrainConfig,
)
from transformer_latent_diffusion_tpu.models import Denoiser  # noqa: E402
from transformer_latent_diffusion_tpu.train.train import (  # noqa: E402
    _build_train_step,
)
from transformer_latent_diffusion_tpu.utils import (  # noqa: E402
    init_denoiser_params,
)


def main():
    from bench import wait_for_backend

    wait_for_backend()
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = DenoiserConfig(
        image_size=32, noise_embed_dims=256, patch_size=2, embed_dim=768,
        dropout=0, n_layers=12, text_emb_size=768,
    )
    # per-shape gates pick fused-layer at 256 tokens and
    # flash-attn + fused-MLP at 1024 tokens from the SAME model flags
    model = Denoiser(**cfg.__dict__, dtype=dtype, use_pallas=on_tpu,
                     fused_layer_vjp=on_tpu)
    params = init_denoiser_params(model, cfg)
    optimizer = optax.adam(3e-4)
    state = {
        "params": params,
        "ema_params": jax.tree.map(jnp.copy, params),
        "opt_state": optimizer.init(params),
        "step": jnp.asarray(0),
    }
    step_fn = jax.jit(
        _build_train_step(model, optimizer, TrainConfig(),
                          vae_scale_factor=8.0),
        donate_argnums=(0,))

    rng = np.random.default_rng(0)
    buckets = {  # name: (batch, latent size)
        "256px_b256": (256, 32),
        "512px_b64": (64, 64),
    }
    data = {}
    for name, (b, s) in buckets.items():
        data[name] = (
            jnp.asarray(rng.standard_normal((b, 4, s, s)), jnp.float32),
            jnp.asarray(rng.standard_normal((b, 768)), jnp.float32))

    key = jax.random.PRNGKey(7)
    for name in buckets:  # compile + warm each shape
        t0 = time.time()
        for i in range(6):
            state, loss = step_fn(state, *data[name],
                                  jax.random.fold_in(key, i))
        float(loss)
        print(f"{name}: compile+warm {time.time() - t0:.1f}s "
              f"loss={float(loss):.4f}", flush=True)

    n_steps = 20
    solo = {}
    for name, (b, s) in buckets.items():
        t0 = time.time()
        for i in range(n_steps):
            state, loss = step_fn(state, *data[name],
                                  jax.random.fold_in(key, 100 + i))
        float(loss)
        dt = (time.time() - t0) / n_steps
        solo[name] = dt
        print(f"solo {name}: {dt * 1e3:.1f} ms/step = "
              f"{b / dt:.1f} samples/s", flush=True)

    # interleaved: alternate buckets inside ONE timed region (sync once,
    # like the solo loops) — the claim is total == sum of solos
    t0 = time.time()
    for i in range(n_steps):
        for name in buckets:
            state, loss = step_fn(state, *data[name],
                                  jax.random.fold_in(key, 1000 + i))
    float(loss)
    dt_pair = (time.time() - t0) / n_steps
    dt_sum = sum(solo.values())
    print(f"interleaved pair: {dt_pair * 1e3:.1f} ms per "
          f"(256px + 512px) step vs {dt_sum * 1e3:.1f} sum-of-solos "
          f"= {dt_pair / dt_sum:.3f}x (1.0 = interleave is free)",
          flush=True)


if __name__ == "__main__":
    main()
