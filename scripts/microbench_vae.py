"""Locate where VAE-decode time goes (compute vs HBM bandwidth).

The headline bench spends ~0.17s/batch-32 in `FlaxVae.decode`. This
script times (a) the full decode, (b) each synthetic building block at
every decoder resolution (3x3 conv on the MXU, GroupNorm+silu on the
VPU/HBM), so we can see which levels are bandwidth-bound and whether a
fused Pallas resnet kernel would pay off.

Usage: python scripts/microbench_vae.py [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402


def timed(tag, fn, *args, reps=5):
    out = fn(*args)  # compile + warm
    _ = float(jnp.sum(out))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / reps
    print(f"{tag:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    b = args.batch
    dtype = jnp.bfloat16

    from transformer_latent_diffusion_tpu.models.vae import FlaxVae

    vae = FlaxVae.create(dtype=dtype)
    lat = jnp.ones((b, 4, 32, 32), dtype=jnp.float32)
    t_full = timed("full decode (b=%d)" % b, vae.decode, lat)

    # Synthetic per-op costs at each decoder level.
    # Decoder levels (reversed block_out): 512@32^2, 512@64^2, 256@128^2,
    # 128@256^2; resnets per level = layers_per_block+1 = 3.
    key = jax.random.PRNGKey(0)
    for (res, ch) in [(32, 512), (64, 512), (128, 256), (256, 128)]:
        x = jax.random.normal(key, (b, res, res, ch), dtype=dtype)

        conv = nn.Conv(ch, (3, 3), padding="SAME", dtype=dtype)
        cp = jax.jit(conv.init)(key, x)
        conv_apply = jax.jit(lambda p, x, m=conv: m.apply(p, x))
        tc = timed(f"conv3x3 {ch}->{ch} @{res}^2", conv_apply, cp, x)
        macs = b * res * res * ch * ch * 9
        print(f"{'':44s}   -> {macs * 2 / tc / 1e12:.1f} TFLOPS", flush=True)

        gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
        gp = jax.jit(gn.init)(key, x)
        gn_apply = jax.jit(lambda p, x, m=gn: nn.silu(m.apply(p, x)))
        tg = timed(f"groupnorm+silu {ch} @{res}^2", gn_apply, gp, x)
        traffic = 2 * b * res * res * ch * 2  # one read + one write, bf16
        print(f"{'':44s}   -> {traffic / tg / 1e9:.1f} GB/s eff (1R+1W)",
              flush=True)

    print(f"\nfull decode: {t_full * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
