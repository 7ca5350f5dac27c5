"""Fused Pallas kernels for the DiT decoder block (inference hot path).

The reference reaches its fused hot path through torch SDPA
(/root/reference/tld/transformer_blocks.py:37) and torch.compile
(train.py:90). Here the TPU-native equivalent is two Pallas kernels per
layer that keep the full token sequence of one batch element resident in
VMEM, eliminating the HBM round-trips between LayerNorm / attention /
depthwise-conv / MLP that dominate the XLA-op-by-op timeline:

  * `fused_attention_pair`: LN1 -> fused-QKV matmul -> per-head softmax
    attention -> +residual -> LN2 -> Q proj -> length-2 cross-attention
    (two tiny matmuls + closed-form softmax) -> +residual.

  * `fused_mlp_sepconv`: LN3 -> expand matmul -> 3x3 depthwise conv on the
    token grid (9 shifted FMAs) -> GELU -> contract matmul -> +residual.

Performance-critical structure: the grid iterates over batch only, with
weight BlockSpecs mapped to a constant index so Mosaic keeps them resident
in VMEM across programs (weights are DMA'd once per layer, not once per
batch element). All matmul operands are bf16 (f32 MXU issue rate is 8x
lower); accumulation, LayerNorm statistics and softmax stay in f32.

Inference-only (sampling); training uses the differentiable XLA path in
models/blocks.py. Numerics vs that path: tests/test_fused_kernels.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _ln_f32(x_f32, scale, bias):
    m = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32 - m), axis=-1, keepdims=True)
    return (x_f32 - m) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (|error| < 1.5e-7 in f32).

    Mosaic has no erf/erfc lowering; this 5-term polynomial keeps the
    fused kernel numerically interchangeable with XLA's exact GELU.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x_f32):
    # erf-form GELU, matching torch nn.GELU default / jax approximate=False
    return 0.5 * x_f32 * (1.0 + _erf_poly(x_f32 * (1.0 / math.sqrt(2.0))))


def _mm(a, b):
    """bf16-in / f32-out matmul (a: (m,k), b: (k,n))."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_t(a, b):
    """a @ b.T with f32 accumulation (a: (m,k), b: (n,k))."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# --------------------------- attention pair ---------------------------------


def _attn_pair_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, ln2s_ref, ln2b_ref,
                      wq_ref, kc_ref, vc_ref, o_ref, *, n_heads: int):
    mxu_dtype = wqkv_ref.dtype
    x = x_ref[0].astype(jnp.float32)                    # (N, D)
    n, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)

    # --- self attention ---
    xn = _ln_f32(x, ln1s_ref[0].astype(jnp.float32), ln1b_ref[0].astype(jnp.float32))
    qkv = _mm(xn.astype(mxu_dtype), wqkv_ref[...])      # (N, 3D) f32
    qkv_lp = qkv.astype(mxu_dtype)
    q, k, v = qkv_lp[:, :d], qkv_lp[:, d:2 * d], qkv_lp[:, 2 * d:]

    attn_cols = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = _mm_t(qh, kh) * scale                       # (N, N) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(mxu_dtype)
        attn_cols.append(_mm(p, vh))                    # (N, dh) f32
    x = x + jnp.concatenate(attn_cols, axis=-1)

    # --- cross attention over the 2-token conditioning sequence ---
    xn2 = _ln_f32(x, ln2s_ref[0].astype(jnp.float32), ln2b_ref[0].astype(jnp.float32))
    qc = _mm(xn2.astype(mxu_dtype), wq_ref[...]).astype(mxu_dtype)  # (N, D)
    kc = kc_ref[0].astype(mxu_dtype)                    # (2, D)
    vc = vc_ref[0].astype(mxu_dtype)
    cross_cols = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = _mm_t(qc[:, sl], kc[:, sl]) * scale         # (N, 2) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(mxu_dtype)
        cross_cols.append(_mm(p, vc[:, sl]))            # (N, dh) f32
    x = x + jnp.concatenate(cross_cols, axis=-1)
    o_ref[0] = x.astype(o_ref.dtype)


def fused_attention_pair(x, ln1_scale, ln1_bias, w_qkv, ln2_scale, ln2_bias,
                         w_q, k_cond, v_cond, n_heads: int,
                         interpret: bool = False):
    """x: (B, N, D); k_cond/v_cond: (B, 2, D) (pre-projected outside).

    Returns x after `x += SA(LN1 x); x += CA(LN2 x, cond)` — parity with
    reference DecoderBlock (transformer_blocks.py:136-137).
    """
    b, n, d = x.shape
    ln1s = ln1_scale.reshape(1, d)
    ln1b = ln1_bias.reshape(1, d)
    ln2s = ln2_scale.reshape(1, d)
    ln2b = ln2_bias.reshape(1, d)

    const = lambda i: (0, 0)  # noqa: E731 — weights resident across programs
    return pl.pallas_call(
        functools.partial(_attn_pair_kernel, n_heads=n_heads),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * (3 * d + d) + 4 * b * n * n * d,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w_qkv.size + w_q.size) * w_qkv.dtype.itemsize,
            transcendentals=b * n * n,
        ),
        interpret=interpret,
    )(x, ln1s, ln1b, w_qkv, ln2s, ln2b, w_q, k_cond, v_cond)


# ----------------------------- MLP sepconv ----------------------------------


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, dw_ref, dwb_ref,
                w2_ref, b2_ref, o_ref, *, hw: int):
    mxu_dtype = w1_ref.dtype
    x = x_ref[0].astype(jnp.float32)                     # (N, D)
    xn = _ln_f32(x, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32))

    h = _mm(xn.astype(mxu_dtype), w1_ref[...])           # (N, hid) f32
    h = (h + b1_ref[0].astype(jnp.float32)).astype(mxu_dtype)

    k = h.shape[-1]
    grid_h = h.reshape(hw, hw, k)
    padded = jnp.pad(grid_h, ((1, 1), (1, 1), (0, 0)))
    dw = dw_ref[...].astype(jnp.float32)                 # (9, hid)
    acc = jnp.zeros((hw, hw, k), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + padded[di:di + hw, dj:dj + hw, :].astype(jnp.float32) \
                * dw[di * 3 + dj]
    acc = acc + dwb_ref[0].astype(jnp.float32)
    act = _gelu_exact(acc).reshape(hw * hw, k).astype(mxu_dtype)

    out = _mm(act, w2_ref[...]) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (x + out).astype(o_ref.dtype)


def fused_mlp_sepconv(x, ln_scale, ln_bias, w1, b1, dw, dwb, w2, b2,
                      hw: int, interpret: bool = False):
    """x: (B, N, D) with N == hw*hw. dw: (3, 3, hidden) depthwise weights.

    Returns `x + MLPSepConv(LN3 x)` — parity with reference DecoderBlock
    line 138 + MLPSepConv (transformer_blocks.py:89-113). Weights stay
    resident in VMEM across the batch grid.
    """
    b, n, d = x.shape
    hidden = w1.shape[1]

    lns = ln_scale.reshape(1, d)
    lnb = ln_bias.reshape(1, d)
    b1r = b1.reshape(1, hidden)
    dwr = dw.reshape(9, hidden)
    dwbr = dwb.reshape(1, hidden)
    b2r = b2.reshape(1, d)

    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_mlp_kernel, hw=hw),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d * hidden + 18 * b * n * hidden,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w1.size + w2.size) * w1.dtype.itemsize,
            transcendentals=10 * b * n * hidden,
        ),
        interpret=interpret,
    )(x, lns, lnb, w1, b1r, dwr, dwbr, w2, b2r)
