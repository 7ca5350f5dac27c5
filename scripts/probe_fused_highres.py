"""Probe: do the fused VJP kernels compile + run at 1024 tokens (512px)?

The training fused kernels keep per-sample activations VMEM-resident;
at 1024 tokens the backward's stored attention probabilities alone are
12 x (1024,1024) f32 = 50MB. This probe compiles fwd+grad of each fused
op at N=1024 (hw=32) with a small batch and reports pass/fail + timing,
so the auto-enable gates in models/blocks.py can be set from facts.

Usage: python scripts/probe_fused_highres.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

D, HID, HEADS = 768, 3072, 12
N, HW = 1024, 32
B = 8


def report(tag, fn, *args):
    try:
        t0 = time.time()
        out = jax.jit(fn)(*args)
        s = float(jax.tree.reduce(
            lambda a, b: a + jnp.sum(b).astype(jnp.float32), out,
            jnp.float32(0)))
        assert s == s, "NaN"
        print(f"{tag:24s} OK   (compile+run {time.time() - t0:.1f}s)",
              flush=True)
        return True
    except Exception as e:
        print(f"{tag:24s} FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return False


def main():
    print(f"backend={jax.default_backend()} N={N} B={B}", flush=True)
    rng = np.random.default_rng(0)
    mxu = jnp.bfloat16

    def mk(shape, f32=False):
        a = rng.standard_normal(shape).astype(np.float32) * 0.02
        return jnp.asarray(a, dtype=jnp.float32 if f32 else mxu)

    x = mk((B, N, D))
    cond = mk((B, 2, D))

    from transformer_latent_diffusion_tpu.ops.fused_layer_vjp import (
        fused_layer_vjp,
    )
    from transformer_latent_diffusion_tpu.ops.fused_mlp_vjp import (
        fused_mlp_sepconv_vjp,
    )

    lp = [mk((D,), True), mk((D,), True), mk((D, 3 * D)),
          mk((D,), True), mk((D,), True), mk((D, D)), mk((D, 2 * D)),
          mk((D,), True), mk((D,), True), mk((D, HID)), mk((HID,), True),
          mk((3, 3, HID)), mk((HID,), True), mk((HID, D)), mk((D,), True)]

    def layer_loss(x, cond, *p):
        return jnp.sum(fused_layer_vjp(x, cond, *p, HEADS, HW, False) ** 2)

    report("fused_layer fwd", lambda: fused_layer_vjp(
        x, cond, *lp, HEADS, HW, False))
    report("fused_layer grad", lambda: jax.grad(layer_loss, argnums=(0, 4))(
        x, cond, *lp))

    def mlp_loss(x, w1, b1, dw, dwb, w2, b2):
        return jnp.sum(fused_mlp_sepconv_vjp(
            x, w1, b1, dw, dwb, w2, b2, HW, False) ** 2)

    margs = (x, lp[9], lp[10], lp[11], lp[12], lp[13], lp[14])
    report("fused_mlp fwd", lambda: fused_mlp_sepconv_vjp(
        *margs, HW, False))
    report("fused_mlp grad", lambda: jax.grad(mlp_loss, argnums=(0, 1))(*margs))

    from transformer_latent_diffusion_tpu.ops.fused_attn_vjp import (
        fused_attention_pair_vjp,
    )

    aargs = (x, cond, lp[0], lp[1], lp[2], lp[3], lp[4], lp[5], lp[6])

    def attn_loss(*a):
        return jnp.sum(fused_attention_pair_vjp(*a, HEADS, False) ** 2)

    report("fused_attn fwd", lambda: fused_attention_pair_vjp(
        *aargs, HEADS, False))
    report("fused_attn grad", lambda: jax.grad(attn_loss, argnums=(0, 4))(*aargs))


if __name__ == "__main__":
    main()
