"""Per-stage profile of the W8A8 int8 inference engine (VERDICT r1 #4).

The int8 engine covers ~95% of layer matmul FLOPs at a nominal 2x MXU
rate yet measured only 1.10x end-to-end. This probe times ablated
variants of the 12-layer fused kernel at the flagship shape
(batch 64 = CFG-doubled 32, 256 tokens, d=768) to locate where the 2x
dies:

  bf16-full      the exact engine kernel (baseline)
  int8-full      the current W8A8 kernel
  bf16-proj      LN + the four projections + residuals only
                 (attention, depthwise+GELU skipped)
  int8-proj      same, W8A8 with per-row dynamic quant
  int8-proj-nq   same, but activations quantized with a STATIC scale
                 (no absmax reduce / divide): isolates quant overhead
  bf16-attn      LN + QKV/Q projections + BOTH attentions, no MLP matmuls
                 (isolates the per-head (256,64) attention cost)

Each variant chains S iterations through lax.scan (carry = x) with ONE
host sync, so tunnel round-trips don't pollute the numbers.

Usage: python scripts/probe_int8_stage.py [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from transformer_latent_diffusion_tpu.ops.fused_block import (  # noqa: E402
    _gelu_exact,
    _ln_f32,
    _mm,
)
from transformer_latent_diffusion_tpu.ops.fused_mlp_vjp import _dw_fwd  # noqa: E402
from transformer_latent_diffusion_tpu.ops.fused_stack import _mha  # noqa: E402
from transformer_latent_diffusion_tpu.ops.fused_stack_int8 import (  # noqa: E402
    _mm_i8,
    _qmm,
    _rowquant,
)

B, N, D, HID, LAYERS, HEADS, HW = 64, 256, 768, 3072, 12, 12, 16


def _variant_kernel(x_ref, cond_ref, ln1s, ln1b, wqkv, sqkv, ln2s, ln2b,
                    wq, sq, wkv, ln3s, ln3b, w1, s1, b1, dw, dwb, w2, s2, b2,
                    o_ref, *, mode: str):
    mxu = jnp.bfloat16
    x = x_ref[0].astype(jnp.float32)
    cond = cond_ref[0]
    n, d = x.shape
    use_i8 = mode.startswith("int8")
    do_attn = "proj" not in mode
    do_mlp = "attn" not in mode

    def proj(xn, w_bf, w_i8, cs):
        if not use_i8:
            return _mm(xn.astype(mxu), w_bf).astype(jnp.float32)
        if mode == "int8-proj-nq":
            # static activation scale: skip absmax reduce + divide
            xq = jnp.round(x_clip(xn) * 8.0).astype(jnp.int8)
            return _mm_i8(xq, w_i8).astype(jnp.float32) * (1.0 / 8.0) \
                * cs.astype(jnp.float32)
        return _qmm(xn, w_i8, cs.astype(jnp.float32))

    def x_clip(v):
        return jnp.clip(v, -15.875, 15.875)

    for l in range(LAYERS):
        xn = _ln_f32(x, ln1s[l].astype(jnp.float32), ln1b[l].astype(jnp.float32))
        qkv = proj(xn, wqkv[l], wqkv[l], sqkv[l]).astype(mxu)
        if do_attn:
            x = x + _mha(qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:],
                         HEADS, mxu)
        else:
            x = x + qkv[:, :d].astype(jnp.float32)

        xn2 = _ln_f32(x, ln2s[l].astype(jnp.float32), ln2b[l].astype(jnp.float32))
        qc = proj(xn2, wq[l], wq[l], sq[l]).astype(mxu)
        if do_attn:
            kv = _mm(cond.astype(mxu), wkv[l]).astype(mxu)
            x = x + _mha(qc, kv[:, :d], kv[:, d:], HEADS, mxu)
        else:
            x = x + qc.astype(jnp.float32)

        if do_mlp:
            xn3 = _ln_f32(x, ln3s[l].astype(jnp.float32),
                          ln3b[l].astype(jnp.float32))
            hmat = proj(xn3, w1[l], w1[l], s1[l]) + b1[l].astype(jnp.float32)
            if do_attn:  # full variants keep the depthwise+gelu
                hid = hmat.shape[-1]
                acc = _dw_fwd(hmat.reshape(HW, HW, hid),
                              dw[l].astype(jnp.float32), HW)
                act = _gelu_exact(acc + dwb[l].astype(jnp.float32))
                act = act.reshape(HW * HW, hid)
            else:
                act = hmat
            x = x + proj(act, w2[l], w2[l], s2[l]) + b2[l].astype(jnp.float32)

    o_ref[0] = x.astype(o_ref.dtype)


def build(mode: str, weights):
    args = list(weights.values())

    def const_spec(arr):
        nd = len(arr.shape)
        return pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(_variant_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(a) for a in args],
        out_specs=pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )

    def step(x, _):
        y = call(x, cond_g, *args)
        # renormalize so chained iterations don't blow up
        return y * (0.999 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-3)), None

    return jax.jit(lambda x, iters: jax.lax.scan(
        step, x, None, length=iters)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    global cond_g
    cond_g = jnp.asarray(rng.standard_normal((B, 2, D)) * 0.1, jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((B, N, D)) * 0.1, jnp.float32)

    def mk(shape, dt=jnp.bfloat16, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    L = LAYERS
    bf16 = {
        "ln1s": mk((L, D), jnp.float32, 1.0), "ln1b": mk((L, D), jnp.float32, 0),
        "wqkv": mk((L, D, 3 * D)), "sqkv": mk((L, 1, 3 * D), jnp.float32, 0.01),
        "ln2s": mk((L, D), jnp.float32, 1.0), "ln2b": mk((L, D), jnp.float32, 0),
        "wq": mk((L, D, D)), "sq": mk((L, 1, D), jnp.float32, 0.01),
        "wkv": mk((L, D, 2 * D)),
        "ln3s": mk((L, D), jnp.float32, 1.0), "ln3b": mk((L, D), jnp.float32, 0),
        "w1": mk((L, D, HID)), "s1": mk((L, 1, HID), jnp.float32, 0.01),
        "b1": mk((L, HID), jnp.float32, 0),
        "dw": mk((L, 9, HID), jnp.float32), "dwb": mk((L, HID), jnp.float32, 0),
        "w2": mk((L, HID, D)), "s2": mk((L, 1, D), jnp.float32, 0.01),
        "b2": mk((L, D), jnp.float32, 0),
    }
    int8 = dict(bf16)
    for w in ("wqkv", "wq", "w1", "w2"):
        q = np.clip(np.round(np.asarray(bf16[w], np.float32) / 0.001),
                    -127, 127).astype(np.int8)
        int8[w] = jnp.asarray(q)

    flops_all = L * B * (2 * N * D * (3 * D + D) + 4 * N * N * D + 8 * N * D
                         + 4 * N * D * HID + 18 * N * HID)
    flops_proj = L * B * (2 * N * D * (3 * D + D) + 4 * N * D * HID)
    flops_attn = L * B * (2 * N * D * (3 * D + D) + 4 * N * N * D + 8 * N * D
                          + 2 * N * D * 2 * D)  # incl wkv proj
    cases = [
        ("bf16-full", bf16, flops_all),
        ("int8-full", int8, flops_all),
        ("bf16-proj", bf16, flops_proj),
        ("int8-proj", int8, flops_proj),
        ("int8-proj-nq", int8, flops_proj),
        ("bf16-attn", bf16, flops_attn),
    ]
    results = {}
    for mode, weights, flops in cases:
        fn = build(mode, weights)
        t0 = time.time()
        float(jnp.sum(fn(x0, 2)))  # compile + warm
        print(f"{mode}: compiled in {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        float(jnp.sum(fn(x0, args.iters)))
        dt = (time.time() - t0) / args.iters
        results[mode] = dt
        print(f"{mode:14s} {dt * 1e3:7.2f} ms/iter  "
              f"{flops / dt / 1e12:6.1f} TFLOPS", flush=True)

    a, b = results["bf16-full"], results["int8-full"]
    print(f"\nend-to-end kernel speedup int8/bf16: {a / b:.3f}x")
    p, q, s = results["bf16-proj"], results["int8-proj"], results["int8-proj-nq"]
    print(f"projection-only speedup: {p / q:.3f}x (static-scale: {p / s:.3f}x)")
    print(f"quant overhead per iter: {(q - s) * 1e3:.2f} ms")
    print(f"attention+dw cost (bf16-full - bf16-proj): "
          f"{(a - p) * 1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
