"""Microbenchmark fused decoder-layer kernel variants on the real TPU.

Times one pallas_call per variant (batch 256 grid, training shapes:
N=256 tokens, D=768, hidden=3072, hw=16, 12 heads) by chaining the call
20x inside one jit (output feeds input, so XLA cannot elide) and syncing
via float(jnp.sum(...)) (block_until_ready is a no-op on axon).

Variants isolate suspected waste in the hot kernel:
  base          current full-layer forward (ops/fused_layer_vjp._fwd_kernel)
  bwd_base      current full-layer backward
  nodw          forward with the 3x3 depthwise conv skipped (GELU kept)
  dw_commuted   depthwise with shifts commuted: row shifts ride the free
                outer axis; only the 2 column shifts touch sublanes
                (current code does 6 unaligned sublane slices)
  attn_onehead  head loop replaced by a single 768-wide attention
                (wrong math, same macro matmul shapes; isolates the
                12-iteration head-loop overhead)
  attn_packed   per-head matmuls kept, but one packed softmax over the
                (N, H*N) score buffer using a segment-sum matmul instead
                of 12 small per-head softmaxes

Usage: python scripts/microbench_layer.py [--batch 256] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer_latent_diffusion_tpu.ops.fused_attn_vjp import (
    _ln_fwd,
    _mm,
    _mm_nt,
    _softmax_rows,
)
from transformer_latent_diffusion_tpu.ops.fused_layer_vjp import (
    _attn_pair_fwd,
    _pallas_bwd,
    _pallas_fwd,
    _param_shapes,
    _reshape_params,
)
from transformer_latent_diffusion_tpu.ops.fused_mlp_vjp import (
    _dw_fwd,
    _gelu_f32,
)

D = 768
HID = 3072
N = 256
HW = 16
HEADS = 12


def _dw_fwd_commuted(h, dw9, hw):
    """acc[i,j,c] = sum_{di,dj} h[i+di-1, j+dj-1, c] * w[di*3+dj, c]
    with row (i) shifts on the free outer axis and only 2 sublane (j)
    shifts."""
    pr = jnp.pad(h, ((1, 1), (0, 0), (0, 0)))  # pad rows only
    zs = []
    for dj in range(3):
        z = (pr[0:hw] * dw9[0 * 3 + dj]
             + pr[1:hw + 1] * dw9[1 * 3 + dj]
             + pr[2:hw + 2] * dw9[2 * 3 + dj])
        zs.append(z)
    # acc[:, j] = z0[:, j-1] + z1[:, j] + z2[:, j+1]  (zero boundary)
    pc0 = jnp.pad(zs[0], ((0, 0), (1, 1), (0, 0)))
    pc2 = jnp.pad(zs[2], ((0, 0), (1, 1), (0, 0)))
    return pc0[:, 0:hw] + zs[1] + pc2[:, 2:hw + 2]


def _mlp_tail(x2, ln3s, ln3b, w1, b1, dw9, dwb, w2, b2, hw, mxu, dw_mode):
    xn3, _, _ = _ln_fwd(x2, ln3s, ln3b)
    h = _mm(xn3.astype(mxu), w1) + b1
    kk = h.shape[-1]
    if dw_mode == "base":
        c = _dw_fwd(h.reshape(hw, hw, kk), dw9, hw) + dwb
    elif dw_mode == "commuted":
        c = _dw_fwd_commuted(h.reshape(hw, hw, kk), dw9, hw) + dwb
    else:  # "none"
        c = h.reshape(hw, hw, kk) + dwb
    a = _gelu_f32(c).reshape(hw * hw, kk)
    return x2 + _mm(a.astype(mxu), w2) + b2


def _attn_onehead(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv, mxu):
    n, d = x.shape
    scale = 1.0 / math.sqrt(d // HEADS)
    xn1, _, _ = _ln_fwd(x, ln1s, ln1b)
    qkv = _mm(xn1.astype(mxu), wqkv).astype(mxu)
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    p = _softmax_rows(_mm_nt(q, k) * scale)
    x1 = x + _mm(p.astype(mxu), v)
    xn2, _, _ = _ln_fwd(x1, ln2s, ln2b)
    qc = _mm(xn2.astype(mxu), wq).astype(mxu)
    kv = _mm(cond.astype(mxu), wkv).astype(mxu)
    p2 = _softmax_rows(_mm_nt(qc, kv[:, :d]) * scale)
    return x1 + _mm(p2.astype(mxu), kv[:, d:])


def _attn_packed_softmax(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                         mxu, seg_sum, seg_bcast):
    """Per-head score/PV matmuls, ONE packed softmax on (N, H*N)."""
    n, d = x.shape
    dh = d // HEADS
    scale = 1.0 / math.sqrt(dh)

    def packed_attn(q, k, v, kn):
        scores = []
        for h in range(HEADS):
            sl = slice(h * dh, (h + 1) * dh)
            scores.append(_mm_nt(q[:, sl], k[:, sl]) * scale)
        s = jnp.concatenate(scores, axis=-1)          # (N, H*kn) f32
        m = jnp.max(s, axis=-1, keepdims=True)        # global row max: valid
        e = jnp.exp(s - m)
        denom = _mm(e.astype(jnp.float32), seg_sum)   # (N, H)
        inv = 1.0 / denom
        p = e * _mm(inv, seg_bcast)                   # broadcast back (N,H*kn)
        p = p.astype(mxu)
        cols = [_mm(p[:, h * kn:(h + 1) * kn], v[:, h * dh:(h + 1) * dh])
                for h in range(HEADS)]
        return jnp.concatenate(cols, axis=-1)

    xn1, _, _ = _ln_fwd(x, ln1s, ln1b)
    qkv = _mm(xn1.astype(mxu), wqkv).astype(mxu)
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    x1 = x + packed_attn(q, k, v, n)

    xn2, _, _ = _ln_fwd(x1, ln2s, ln2b)
    qc = _mm(xn2.astype(mxu), wq).astype(mxu)
    kv = _mm(cond.astype(mxu), wkv).astype(mxu)
    kc, vc = kv[:, :d], kv[:, d:]
    cols = []
    for h in range(HEADS):
        sl = slice(h * dh, (h + 1) * dh)
        p = _softmax_rows(_mm_nt(qc[:, sl], kc[:, sl]) * scale)
        cols.append(_mm(p.astype(mxu), vc[:, sl]))
    return x1 + jnp.concatenate(cols, axis=-1)


def _paired_mha(q, k, v, n_heads, mxu):
    """Heads processed two at a time in 128-lane-aligned blocks.

    For the pair (a, b): S = q_pair @ [[k_a|0],[0|k_b]]^T gives the two
    (N, N) score blocks side by side in one full-K-width MXU op; PV uses
    the same masked stack. 2x the (tiny) attention FLOPs, but no 64-lane
    misaligned slices and half the loop iterations.
    """
    n, d = q.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    mask_a = jnp.concatenate(
        [jnp.ones((1, dh), jnp.float32), jnp.zeros((1, dh), jnp.float32)],
        axis=-1).astype(mxu)
    mask_b = jnp.concatenate(
        [jnp.zeros((1, dh), jnp.float32), jnp.ones((1, dh), jnp.float32)],
        axis=-1).astype(mxu)
    cols = []
    for hp in range(n_heads // 2):
        sl = slice(hp * 2 * dh, (hp + 1) * 2 * dh)
        qp, kp, vp = q[:, sl], k[:, sl], v[:, sl]
        kstack = jnp.concatenate([kp * mask_a, kp * mask_b], axis=0)  # (2N, 2dh)
        s = _mm_nt(qp, kstack) * scale                                # (N, 2N)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        den_a = jnp.sum(e[:, :n], axis=-1, keepdims=True)
        den_b = jnp.sum(e[:, n:], axis=-1, keepdims=True)
        p = jnp.concatenate([e[:, :n] / den_a, e[:, n:] / den_b],
                            axis=-1).astype(mxu)
        vstack = jnp.concatenate([vp * mask_a, vp * mask_b], axis=0)  # (2N, 2dh)
        cols.append(_mm(p, vstack))                                   # (N, 2dh)
    return jnp.concatenate(cols, axis=-1)


def _attn_paired(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv, mxu):
    n, d = x.shape
    xn1, _, _ = _ln_fwd(x, ln1s, ln1b)
    qkv = _mm(xn1.astype(mxu), wqkv).astype(mxu)
    x1 = x + _paired_mha(qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:],
                         HEADS, mxu)
    xn2, _, _ = _ln_fwd(x1, ln2s, ln2b)
    qc = _mm(xn2.astype(mxu), wq).astype(mxu)
    kv = _mm(cond.astype(mxu), wkv).astype(mxu)
    # cond KV is length-2: keep the cheap per-head loop
    dh = d // HEADS
    scale = 1.0 / math.sqrt(dh)
    kc, vc = kv[:, :d], kv[:, d:]
    cols = []
    for h in range(HEADS):
        sl = slice(h * dh, (h + 1) * dh)
        p = _softmax_rows(_mm_nt(qc[:, sl], kc[:, sl]) * scale)
        cols.append(_mm(p.astype(mxu), vc[:, sl]))
    return x1 + jnp.concatenate(cols, axis=-1)


def _variant_kernel(x_ref, cond_ref, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                    ln3s, ln3b, w1, b1, dw, dwb, w2, b2, *rest,
                    attn_mode: str, dw_mode: str, hw: int):
    o_ref = rest[-1]
    seg = rest[:-1]
    mxu = wqkv.dtype
    x = x_ref[0].astype(jnp.float32)
    cond = cond_ref[0].astype(jnp.float32)
    a = (ln1s[0].astype(jnp.float32), ln1b[0].astype(jnp.float32), wqkv[...],
         ln2s[0].astype(jnp.float32), ln2b[0].astype(jnp.float32),
         wq[...], wkv[...])
    if attn_mode == "base":
        x2 = _attn_pair_fwd(x, cond, *a, HEADS, mxu)
    elif attn_mode == "onehead":
        x2 = _attn_onehead(x, cond, *a, mxu)
    elif attn_mode == "paired":
        x2 = _attn_paired(x, cond, *a, mxu)
    else:  # packed
        x2 = _attn_packed_softmax(x, cond, *a, mxu, seg[0][...].astype(jnp.float32),
                                  seg[1][...].astype(jnp.float32))
    x3 = _mlp_tail(x2, ln3s[0].astype(jnp.float32), ln3b[0].astype(jnp.float32),
                   w1[...], b1[0].astype(jnp.float32),
                   dw[...].astype(jnp.float32), dwb[0].astype(jnp.float32),
                   w2[...], b2[0].astype(jnp.float32), hw, mxu, dw_mode)
    o_ref[0] = x3.astype(o_ref.dtype)


def make_variant(params, attn_mode, dw_mode, b):
    pshapes = _param_shapes(D, HID)
    const = lambda i: (0, 0)  # noqa: E731
    extra = []
    extra_specs = []
    if attn_mode == "packed":
        seg_sum = np.zeros((HEADS * N, HEADS), np.float32)
        for h in range(HEADS):
            seg_sum[h * N:(h + 1) * N, h] = 1.0
        seg_bcast = seg_sum.T.copy()
        extra = [jnp.asarray(seg_sum), jnp.asarray(seg_bcast)]
        extra_specs = [pl.BlockSpec((HEADS * N, HEADS), const,
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((HEADS, HEADS * N), const,
                                    memory_space=pltpu.VMEM)]

    def run(x, cond):
        return pl.pallas_call(
            functools.partial(_variant_kernel, attn_mode=attn_mode,
                              dw_mode=dw_mode, hw=HW),
            out_shape=jax.ShapeDtypeStruct((b, N, D), x.dtype),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(s, const, memory_space=pltpu.VMEM)
                 for s in pshapes] + extra_specs,
            out_specs=pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, cond, *_reshape_params(params), *extra)

    return run


def time_chained(fn, x, cond, iters, tag):
    @jax.jit
    def chained(x, cond):
        def body(c, _):
            return fn(c, cond), 0.0
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    t0 = time.time()
    out = chained(x, cond)
    _ = float(jnp.sum(out))
    compile_and_first = time.time() - t0

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = chained(out, cond)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / (reps * iters)
    print(f"{tag:16s} {dt * 1e3:8.3f} ms/call   "
          f"(first+compile {compile_and_first:.1f}s)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    b = args.batch

    print(f"backend={jax.default_backend()} batch={b}", flush=True)
    rng = np.random.default_rng(0)
    mxu = jnp.bfloat16

    def mk(shape, f32=False):
        a = rng.standard_normal(shape).astype(np.float32) * 0.02
        return jnp.asarray(a, dtype=jnp.float32 if f32 else mxu)

    params = [
        mk((D,), True), mk((D,), True), mk((D, 3 * D)),
        mk((D,), True), mk((D,), True), mk((D, D)), mk((D, 2 * D)),
        mk((D,), True), mk((D,), True), mk((D, HID)), mk((HID,), True),
        mk((3, 3, HID)), mk((HID,), True), mk((HID, D)), mk((D,), True),
    ]
    x = jnp.asarray(rng.standard_normal((b, N, D)), dtype=mxu)
    cond = jnp.asarray(rng.standard_normal((b, 2, D)), dtype=mxu)
    g = jnp.asarray(rng.standard_normal((b, N, D)), dtype=mxu)

    variants = [
        ("base", "base", "base"),
        ("nodw", "base", "none"),
        ("dw_commuted", "base", "commuted"),
        ("attn_onehead", "onehead", "base"),
        ("attn_packed", "packed", "base"),
        ("attn_paired", "paired", "base"),
        ("best_combo", "packed", "commuted"),
    ]
    fns = {tag: make_variant(params, am, dm, b) for tag, am, dm in variants}

    # correctness cross-check (numerics-preserving variants must match base)
    ya = fns["base"](x, cond).astype(jnp.float32)
    for tag in ("dw_commuted", "attn_packed", "attn_paired", "best_combo"):
        yb = fns[tag](x, cond).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ya - yb)))
        print(f"{tag} max|diff| vs base: {err:.3e}", flush=True)

    results = {}
    for tag, _, _ in variants:
        results[tag] = time_chained(fns[tag], x, cond, args.iters, tag)

    # backward baseline (not chained — dx has same shape as x, chain on dx)
    def bwd_fn(xx, cc):
        outs = _pallas_bwd(xx, cc, g, params, HEADS, HW, False)
        return outs[0]
    results["bwd_base"] = time_chained(bwd_fn, x, cond, args.iters, "bwd_base")

    # forward baseline via library entry (sanity vs variant base)
    def fwd_lib(xx, cc):
        return _pallas_fwd(xx, cc, params, HEADS, HW, False)
    results["fwd_lib"] = time_chained(fwd_lib, x, cond, args.iters, "fwd_lib")

    print("\nsummary (ms/call):", flush=True)
    for k, v in results.items():
        print(f"  {k:16s} {v * 1e3:8.3f}", flush=True)


if __name__ == "__main__":
    main()
