"""Differentiable fused attention pair: Pallas forward AND backward.

Companion to ops/fused_mlp_vjp.py for the training hot path (measured:
the attention pair is ~32% of fwd+bwd step time on the XLA path). One
kernel computes, per batch element, entirely in VMEM:

    x1 = x + SelfAttn(LN1(x))           (fused QKV, per-head softmax)
    x2 = x1 + CrossAttn(LN2(x1), cond)  (cond KV projected in-kernel)

and the backward kernel recomputes the forward internals from (x, cond)
— cheaper than spilling N x N attention probabilities to HBM — producing
dx, dcond and all weight/LN grads, with weight-grad blocks accumulated in
VMEM across the batch grid.

Gradients asserted against jax.grad of the jnp reference by
tests/test_fused_attn_vjp.py. Enabled with TrainConfig.fused_attn_vjp.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scoped-VMEM budget for these kernels (v5e has 128MiB); module-level
# so probes can tune it without editing call sites
VMEM_LIMIT_BYTES = 100 * 1024 * 1024

LN_EPS = 1e-5


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ln_fwd(x, scale, bias):
    m = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - m) * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(dy, xhat, rstd, scale):
    """Returns (dx, dscale (1,D), dbias (1,D))."""
    dscale = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * scale
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return dx, dscale, dbias


def _rowsum_mxu(a):
    """(n, k) f32 -> (n, 1) row-sum as an MXU ones-matmul.

    VPU lane-reduces over the (N, N) score rows are the single biggest
    non-matmul cost in these kernels: replacing the softmax denominator
    and the dsoftmax inner-product reduces with f32 ones-matmuls (bf16x3
    passes, ~f32 precision; N=128 output for lane alignment) measured a
    same-process 1.156x on the full fused train step
    (scripts/probe_train_softmax.py: 491 -> 425 ms/step at batch 256).
    The row MAX stays a VPU reduce — it has no matmul form. The
    inference engine keeps plain reduces: any reordering of its softmax
    arithmetic drifts the 50-step latents ~1e-2 (chaotic amplification,
    scripts/probe_attn_parts.py), threatening the reference-parity
    budget, while per-step gradient parity is insensitive at 5e-3."""
    ones = jnp.ones((a.shape[-1], 128), jnp.float32)
    return _mm(a, ones)[:, :1]


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / _rowsum_mxu(e)


def _softmax_bwd(p, dp):
    return p * (dp - _rowsum_mxu(dp * p))


# ------------------------------ forward -------------------------------------


def _fwd_kernel(x_ref, cond_ref, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                o_ref, *, n_heads: int):
    mxu = wqkv.dtype
    x = x_ref[0].astype(jnp.float32)
    cond = cond_ref[0].astype(jnp.float32)
    n, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)

    xn1, _, _ = _ln_fwd(x, ln1s[0].astype(jnp.float32), ln1b[0].astype(jnp.float32))
    qkv = _mm(xn1.astype(mxu), wqkv[...]).astype(mxu)
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    cols = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        p = _softmax_rows(_mm_nt(q[:, sl], k[:, sl]) * scale)
        cols.append(_mm(p.astype(mxu), v[:, sl]))
    x1 = x + jnp.concatenate(cols, axis=-1)

    xn2, _, _ = _ln_fwd(x1, ln2s[0].astype(jnp.float32), ln2b[0].astype(jnp.float32))
    qc = _mm(xn2.astype(mxu), wq[...]).astype(mxu)
    kv = _mm(cond.astype(mxu), wkv[...]).astype(mxu)
    kc, vc = kv[:, :d], kv[:, d:]
    cols = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        p = _softmax_rows(_mm_nt(qc[:, sl], kc[:, sl]) * scale)
        cols.append(_mm(p.astype(mxu), vc[:, sl]))
    x2 = x1 + jnp.concatenate(cols, axis=-1)
    o_ref[0] = x2.astype(o_ref.dtype)


# ------------------------------ backward ------------------------------------


def _bwd_kernel(x_ref, cond_ref, g_ref, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                dx_ref, dcond_ref, dln1s_ref, dln1b_ref, dwqkv_ref,
                dln2s_ref, dln2b_ref, dwq_ref, dwkv_ref, *, n_heads: int):
    mxu = wqkv.dtype
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dln1s_ref[...] = jnp.zeros_like(dln1s_ref)
        dln1b_ref[...] = jnp.zeros_like(dln1b_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dln2s_ref[...] = jnp.zeros_like(dln2s_ref)
        dln2b_ref[...] = jnp.zeros_like(dln2b_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dwkv_ref[...] = jnp.zeros_like(dwkv_ref)

    x = x_ref[0].astype(jnp.float32)
    cond = cond_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    n, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    g1s = ln1s[0].astype(jnp.float32)
    g2s = ln2s[0].astype(jnp.float32)

    # ---- recompute forward ----
    xn1, xhat1, rstd1 = _ln_fwd(x, g1s, ln1b[0].astype(jnp.float32))
    qkv = _mm(xn1.astype(mxu), wqkv[...]).astype(mxu)
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    # per-head probabilities are recomputed in the backward loop below
    # rather than stored: 12 x (N, N) f32 of live VMEM is what makes the
    # 1024-token backward uncompilable.
    sa_cols = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        p = _softmax_rows(_mm_nt(q[:, sl], k[:, sl]) * scale)
        sa_cols.append(_mm(p.astype(mxu), v[:, sl]))
    x1 = x + jnp.concatenate(sa_cols, axis=-1)

    xn2, xhat2, rstd2 = _ln_fwd(x1, g2s, ln2b[0].astype(jnp.float32))
    qc = _mm(xn2.astype(mxu), wq[...]).astype(mxu)
    kv = _mm(cond.astype(mxu), wkv[...]).astype(mxu)
    kc, vc = kv[:, :d], kv[:, d:]

    # ---- cross-attention backward (upstream g) ----
    dqc_cols, dkc_cols, dvc_cols = [], [], []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = _mm_nt(qc[:, sl], kc[:, sl]) * scale            # (N, 2)
        p = _softmax_rows(s)
        gh = g[:, sl]
        gh_lp = gh.astype(mxu)
        dvc_cols.append(_mm_tn(p.astype(mxu), gh_lp))        # (2, dh)
        dp = _mm_nt(gh_lp, vc[:, sl])                        # (N, 2)
        ds = _softmax_bwd(p, dp) * scale
        ds_lp = ds.astype(mxu)
        dqc_cols.append(_mm(ds_lp, kc[:, sl]))               # (N, dh)
        dkc_cols.append(_mm_tn(ds_lp, qc[:, sl]))            # (2, dh)
    dqc = jnp.concatenate(dqc_cols, axis=-1)                 # (N, D)
    dkv = jnp.concatenate(
        [jnp.concatenate(dkc_cols, axis=-1),
         jnp.concatenate(dvc_cols, axis=-1)], axis=-1)       # (2, 2D)

    dqc_lp = dqc.astype(mxu)
    dwq_ref[...] += _mm_tn(xn2.astype(mxu), dqc_lp)
    dxn2 = _mm_nt(dqc_lp, wq[...])
    dkv_lp = dkv.astype(mxu)
    dwkv_ref[...] += _mm_tn(cond.astype(mxu), dkv_lp)
    dcond_ref[0] = _mm_nt(dkv_lp, wkv[...]).astype(dcond_ref.dtype)

    dx1_ln, ds2, db2 = _ln_bwd(dxn2, xhat2, rstd2, g2s)
    dln2s_ref[...] += ds2
    dln2b_ref[...] += db2
    dx1 = g + dx1_ln

    # ---- self-attention backward (upstream dx1) ----
    dq_cols, dk_cols, dv_cols = [], [], []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        p = _softmax_rows(_mm_nt(q[:, sl], k[:, sl]) * scale)  # (N, N)
        gh = dx1[:, sl]
        gh_lp = gh.astype(mxu)
        dv_cols.append(_mm_tn(p.astype(mxu), gh_lp))         # (N, dh)
        dp = _mm_nt(gh_lp, v[:, sl])                         # (N, N)
        ds = _softmax_bwd(p, dp) * scale
        ds_lp = ds.astype(mxu)
        dq_cols.append(_mm(ds_lp, k[:, sl]))
        dk_cols.append(_mm_tn(ds_lp, q[:, sl]))
    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_cols, axis=-1),
         jnp.concatenate(dk_cols, axis=-1),
         jnp.concatenate(dv_cols, axis=-1)], axis=-1)        # (N, 3D)

    dqkv_lp = dqkv.astype(mxu)
    dwqkv_ref[...] += _mm_tn(xn1.astype(mxu), dqkv_lp)
    dxn1 = _mm_nt(dqkv_lp, wqkv[...])

    dx_ln, ds1, db1 = _ln_bwd(dxn1, xhat1, rstd1, g1s)
    dln1s_ref[...] += ds1
    dln1b_ref[...] += db1
    dx_ref[0] = (dx1 + dx_ln).astype(dx_ref.dtype)


def _specs(b, n, d, per_batch_shapes, const_shapes):
    batch = [pl.BlockSpec((1, *s), lambda i: (i,) + (0,) * len(s),
                          memory_space=pltpu.VMEM) for s in per_batch_shapes]
    const = lambda i: (0, 0)  # noqa: E731
    cst = [pl.BlockSpec(s, const, memory_space=pltpu.VMEM) for s in const_shapes]
    return batch, cst


def _pallas_fwd(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv, n_heads,
                interpret):
    b, n, d = x.shape
    batch, cst = _specs(b, n, d, [(n, d), (2, d)],
                        [(1, d), (1, d), (d, 3 * d), (1, d), (1, d),
                         (d, d), (d, 2 * d)])
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=n_heads),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=batch + cst,
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, cond, ln1s.reshape(1, d), ln1b.reshape(1, d), wqkv,
      ln2s.reshape(1, d), ln2b.reshape(1, d), wq, wkv)


def _pallas_bwd(x, cond, g, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv, n_heads,
                interpret):
    b, n, d = x.shape
    batch, cst = _specs(b, n, d, [(n, d), (2, d), (n, d)],
                        [(1, d), (1, d), (d, 3 * d), (1, d), (1, d),
                         (d, d), (d, 2 * d)])
    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),          # dx
            jax.ShapeDtypeStruct((b, 2, d), cond.dtype),       # dcond
            jax.ShapeDtypeStruct((1, d), jnp.float32),         # dln1s
            jax.ShapeDtypeStruct((1, d), jnp.float32),         # dln1b
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),     # dWqkv
            jax.ShapeDtypeStruct((1, d), jnp.float32),         # dln2s
            jax.ShapeDtypeStruct((1, d), jnp.float32),         # dln2b
            jax.ShapeDtypeStruct((d, d), jnp.float32),         # dWq
            jax.ShapeDtypeStruct((d, 2 * d), jnp.float32),     # dWkv
        ),
        grid=(b,),
        in_specs=batch + cst,
        out_specs=(
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 2 * d), const, memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, cond, g, ln1s.reshape(1, d), ln1b.reshape(1, d), wqkv,
      ln2s.reshape(1, d), ln2b.reshape(1, d), wq, wkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_attention_pair_vjp(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                             n_heads: int, interpret: bool = False):
    """x2 = (x + SA(LN1 x)) + CA(LN2(x + SA(LN1 x)), cond), fully fused.

    Differentiable w.r.t. all tensor args. Parity with reference
    DecoderBlock lines 136-137 (transformer_blocks.py).
    """
    return _pallas_fwd(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                       n_heads, interpret)


def _vjp_fwd(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv, n_heads,
             interpret):
    y = _pallas_fwd(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                    n_heads, interpret)
    return y, (x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv)


def _vjp_bwd(n_heads, interpret, res, g):
    x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv = res
    (dx, dcond, dln1s, dln1b, dwqkv, dln2s, dln2b, dwq, dwkv) = _pallas_bwd(
        x, cond, g, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv, n_heads, interpret)
    return (dx,
            dcond,
            dln1s.reshape(ln1s.shape).astype(ln1s.dtype),
            dln1b.reshape(ln1b.shape).astype(ln1b.dtype),
            dwqkv.astype(wqkv.dtype),
            dln2s.reshape(ln2s.shape).astype(ln2s.dtype),
            dln2b.reshape(ln2b.shape).astype(ln2b.dtype),
            dwq.astype(wq.dtype),
            dwkv.astype(wkv.dtype))


fused_attention_pair_vjp.defvjp(_vjp_fwd, _vjp_bwd)
