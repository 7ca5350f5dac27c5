"""Differentiable fused FULL decoder layer: one Pallas kernel per pass.

Merges ops/fused_attn_vjp.py and ops/fused_mlp_vjp.py into a single
custom-VJP op covering the whole decoder layer:

    x1 = x + SelfAttn(LN1 x)
    x2 = x1 + CrossAttn(LN2 x1, cond)
    x3 = x2 + Contract(GELU(DW3x3(Expand(LN3 x2))))

Forward is ONE kernel; backward is ONE kernel that recomputes the forward
internals in VMEM (activations never spill to HBM between sub-blocks) and
emits dx, dcond and all 15 parameter grads, accumulating weight-grad
blocks across the batch grid. Versus the two-kernel VJPs this removes one
(B, N, D) HBM round-trip per layer per pass and halves kernel-dispatch
count.

Gradient parity: tests/test_fused_layer_vjp.py (vs jax.grad of the jnp
reference). Enabled with TrainConfig.fused_layer_vjp (auto-on for TPU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer_latent_diffusion_tpu.ops.fused_attn_vjp import (
    _ln_bwd,
    _ln_fwd,
    _mm,
    _mm_nt,
    _mm_tn,
    _softmax_bwd,
    _softmax_rows,
)
from transformer_latent_diffusion_tpu.ops.fused_mlp_vjp import (
    _dw_fwd,
    _dw_input_grad,
    _dw_tap_grads,
    _gelu_f32,
    _gelu_grad_f32,
)

# scoped-VMEM budget for these kernels (v5e has 128MiB); module-level
# so probes can tune it without editing call sites
VMEM_LIMIT_BYTES = 110 * 1024 * 1024

# parameter order used throughout (matches pack order)
PARAM_NAMES = ("ln1s", "ln1b", "wqkv", "ln2s", "ln2b", "wq", "wkv",
               "ln3s", "ln3b", "w1", "b1", "dw", "dwb", "w2", "b2")


def _attn_pair_fwd(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                   n_heads, mxu, want_residuals=False):
    n, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)

    xn1, xhat1, rstd1 = _ln_fwd(x, ln1s, ln1b)
    qkv = _mm(xn1.astype(mxu), wqkv).astype(mxu)
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    cols, p_self = [], []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        p = _softmax_rows(_mm_nt(q[:, sl], k[:, sl]) * scale)
        p_self.append(p)
        cols.append(_mm(p.astype(mxu), v[:, sl]))
    x1 = x + jnp.concatenate(cols, axis=-1)

    xn2, xhat2, rstd2 = _ln_fwd(x1, ln2s, ln2b)
    qc = _mm(xn2.astype(mxu), wq).astype(mxu)
    kv = _mm(cond.astype(mxu), wkv).astype(mxu)
    kc, vc = kv[:, :d], kv[:, d:]
    cols, p_cross = [], []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        p = _softmax_rows(_mm_nt(qc[:, sl], kc[:, sl]) * scale)
        p_cross.append(p)
        cols.append(_mm(p.astype(mxu), vc[:, sl]))
    x2 = x1 + jnp.concatenate(cols, axis=-1)
    if not want_residuals:
        return x2
    # NOTE: the per-head attention probabilities are returned as VALUES,
    # not written to HBM — the custom VJP never stores them between
    # passes (12 x (N, N) f32 residuals are what used to make the
    # 1024-token backward uncompilable). Inside the one backward kernel,
    # handing the recomputed p straight to the grad section skips a
    # second QK^T + softmax per head. Measured neutral on the TPU
    # (0.999x, grads bit-identical — Mosaic already CSE'd the duplicate)
    # but keeps the no-duplicate-work property explicit in the source.
    return x2, (xn1, xhat1, rstd1, q, k, v, x1, xn2, xhat2, rstd2,
                qc, kc, vc, p_self, p_cross)


def _mlp_fwd(x2, ln3s, ln3b, w1, b1, dw9, dwb, w2, b2, hw, mxu,
             want_residuals=False):
    xn3, xhat3, rstd3 = _ln_fwd(x2, ln3s, ln3b)
    h = _mm(xn3.astype(mxu), w1) + b1
    kk = h.shape[-1]
    c = _dw_fwd(h.reshape(hw, hw, kk), dw9, hw) + dwb
    a = _gelu_f32(c).reshape(hw * hw, kk)
    if want_residuals:
        # backward-pass recompute: the contract matmul's output is never
        # used (only the residuals are) — skip its ~1.2 GF/sample
        # explicitly rather than relying on DCE inside the kernel jaxpr.
        return None, (xn3, xhat3, rstd3, h, c, a)
    y = _mm(a.astype(mxu), w2) + b2
    return x2 + y


def _fwd_kernel(x_ref, cond_ref, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                ln3s, ln3b, w1, b1, dw, dwb, w2, b2, o_ref,
                *, n_heads: int, hw: int):
    mxu = wqkv.dtype
    x = x_ref[0].astype(jnp.float32)
    cond = cond_ref[0].astype(jnp.float32)
    x2 = _attn_pair_fwd(
        x, cond, ln1s[0].astype(jnp.float32), ln1b[0].astype(jnp.float32),
        wqkv[...], ln2s[0].astype(jnp.float32), ln2b[0].astype(jnp.float32),
        wq[...], wkv[...], n_heads, mxu)
    x3 = _mlp_fwd(
        x2, ln3s[0].astype(jnp.float32), ln3b[0].astype(jnp.float32),
        w1[...], b1[0].astype(jnp.float32),
        dw[...].astype(jnp.float32), dwb[0].astype(jnp.float32),
        w2[...], b2[0].astype(jnp.float32), hw, mxu)
    o_ref[0] = x3.astype(o_ref.dtype)


def _bwd_kernel(x_ref, cond_ref, g_ref,
                ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                ln3s, ln3b, w1, b1, dw, dwb, w2, b2,
                dx_ref, dcond_ref,
                dln1s_ref, dln1b_ref, dwqkv_ref, dln2s_ref, dln2b_ref,
                dwq_ref, dwkv_ref, dln3s_ref, dln3b_ref, dw1_ref, db1_ref,
                ddw_ref, ddwb_ref, dw2_ref, db2_ref,
                *, n_heads: int, hw: int):
    mxu = wqkv.dtype
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (dln1s_ref, dln1b_ref, dwqkv_ref, dln2s_ref, dln2b_ref,
                    dwq_ref, dwkv_ref, dln3s_ref, dln3b_ref, dw1_ref,
                    db1_ref, ddw_ref, ddwb_ref, dw2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[0].astype(jnp.float32)
    cond = cond_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    n, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    g1s = ln1s[0].astype(jnp.float32)
    g2s = ln2s[0].astype(jnp.float32)
    g3s = ln3s[0].astype(jnp.float32)
    dw9 = dw[...].astype(jnp.float32)

    # ---- recompute forward with residuals ----
    x2, (xn1, xhat1, rstd1, q, k, v, x1, xn2, xhat2, rstd2,
         qc, kc, vc, p_self, p_cross) = _attn_pair_fwd(
        x, cond, g1s, ln1b[0].astype(jnp.float32), wqkv[...],
        g2s, ln2b[0].astype(jnp.float32), wq[...], wkv[...],
        n_heads, mxu, want_residuals=True)
    _, (xn3, xhat3, rstd3, h, c, a) = _mlp_fwd(
        x2, g3s, ln3b[0].astype(jnp.float32), w1[...],
        b1[0].astype(jnp.float32), dw9, dwb[0].astype(jnp.float32),
        w2[...], b2[0].astype(jnp.float32), hw, mxu, want_residuals=True)

    # ---- MLP backward (upstream g) ----
    kk = h.shape[-1]
    g_lp = g.astype(mxu)
    dw2_ref[...] += _mm_tn(a.astype(mxu), g_lp)
    db2_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    da = _mm_nt(g_lp, w2[...])                                # (N, K)
    dc = da.reshape(hw, hw, kk) * _gelu_grad_f32(c)
    ddwb_ref[...] += jnp.sum(dc, axis=(0, 1)).reshape(1, kk)
    tap_grads = _dw_tap_grads(h.reshape(hw, hw, kk), dc, hw)
    for t in range(9):
        ddw_ref[t, :] += tap_grads[t]
    dhid = _dw_input_grad(dc, dw9, hw).reshape(hw * hw, kk)
    dhid_lp = dhid.astype(mxu)
    dw1_ref[...] += _mm_tn(xn3.astype(mxu), dhid_lp)
    db1_ref[...] += jnp.sum(dhid, axis=0, keepdims=True)
    dxn3 = _mm_nt(dhid_lp, w1[...])
    dx2_ln, ds3, db3 = _ln_bwd(dxn3, xhat3, rstd3, g3s)
    dln3s_ref[...] += ds3
    dln3b_ref[...] += db3
    dx2 = g + dx2_ln

    # ---- cross-attention backward (upstream dx2; p from the recompute) ----
    dqc_cols, dkc_cols, dvc_cols = [], [], []
    for hd in range(n_heads):
        sl = slice(hd * dh, (hd + 1) * dh)
        p = p_cross[hd]
        gh_lp = dx2[:, sl].astype(mxu)
        dvc_cols.append(_mm_tn(p.astype(mxu), gh_lp))
        dp = _mm_nt(gh_lp, vc[:, sl])
        ds = _softmax_bwd(p, dp) * scale
        ds_lp = ds.astype(mxu)
        dqc_cols.append(_mm(ds_lp, kc[:, sl]))
        dkc_cols.append(_mm_tn(ds_lp, qc[:, sl]))
    dqc = jnp.concatenate(dqc_cols, axis=-1)
    dkv = jnp.concatenate(
        [jnp.concatenate(dkc_cols, axis=-1),
         jnp.concatenate(dvc_cols, axis=-1)], axis=-1)
    dqc_lp = dqc.astype(mxu)
    dwq_ref[...] += _mm_tn(xn2.astype(mxu), dqc_lp)
    dxn2 = _mm_nt(dqc_lp, wq[...])
    dkv_lp = dkv.astype(mxu)
    dwkv_ref[...] += _mm_tn(cond.astype(mxu), dkv_lp)
    dcond_ref[0] = _mm_nt(dkv_lp, wkv[...]).astype(dcond_ref.dtype)
    dx1_ln, ds2, db2v = _ln_bwd(dxn2, xhat2, rstd2, g2s)
    dln2s_ref[...] += ds2
    dln2b_ref[...] += db2v
    dx1 = dx2 + dx1_ln

    # ---- self-attention backward (upstream dx1; p from the recompute) ----
    dq_cols, dk_cols, dv_cols = [], [], []
    for hd in range(n_heads):
        sl = slice(hd * dh, (hd + 1) * dh)
        p = p_self[hd]
        gh_lp = dx1[:, sl].astype(mxu)
        dv_cols.append(_mm_tn(p.astype(mxu), gh_lp))
        dp = _mm_nt(gh_lp, v[:, sl])
        ds = _softmax_bwd(p, dp) * scale
        ds_lp = ds.astype(mxu)
        dq_cols.append(_mm(ds_lp, k[:, sl]))
        dk_cols.append(_mm_tn(ds_lp, q[:, sl]))
    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_cols, axis=-1),
         jnp.concatenate(dk_cols, axis=-1),
         jnp.concatenate(dv_cols, axis=-1)], axis=-1)
    dqkv_lp = dqkv.astype(mxu)
    dwqkv_ref[...] += _mm_tn(xn1.astype(mxu), dqkv_lp)
    dxn1 = _mm_nt(dqkv_lp, wqkv[...])
    dx_ln, ds1, db1v = _ln_bwd(dxn1, xhat1, rstd1, g1s)
    dln1s_ref[...] += ds1
    dln1b_ref[...] += db1v
    dx_ref[0] = (dx1 + dx_ln).astype(dx_ref.dtype)


def _param_shapes(d, hidden):
    return [(1, d), (1, d), (d, 3 * d), (1, d), (1, d), (d, d), (d, 2 * d),
            (1, d), (1, d), (d, hidden), (1, hidden), (9, hidden),
            (1, hidden), (hidden, d), (1, d)]


def _reshape_params(params):
    """Normalize param list to kernel-ingestible 2D shapes."""
    (ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
     ln3s, ln3b, w1, b1, dw, dwb, w2, b2) = params
    return [ln1s.reshape(1, -1), ln1b.reshape(1, -1), wqkv,
            ln2s.reshape(1, -1), ln2b.reshape(1, -1), wq, wkv,
            ln3s.reshape(1, -1), ln3b.reshape(1, -1), w1,
            b1.reshape(1, -1), dw.reshape(9, -1), dwb.reshape(1, -1),
            w2, b2.reshape(1, -1)]


def _pallas_fwd(x, cond, params, n_heads, hw, interpret):
    b, n, d = x.shape
    hidden = params[9].shape[1]
    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=n_heads, hw=hw),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(s, const, memory_space=pltpu.VMEM)
             for s in _param_shapes(d, hidden)],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, cond, *_reshape_params(params))


def _pallas_bwd(x, cond, g, params, n_heads, hw, interpret):
    b, n, d = x.shape
    hidden = params[9].shape[1]
    const = lambda i: (0, 0)  # noqa: E731
    pshapes = _param_shapes(d, hidden)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads, hw=hw),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((b, n, d), x.dtype),
             jax.ShapeDtypeStruct((b, 2, d), cond.dtype)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in pshapes]),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(s, const, memory_space=pltpu.VMEM) for s in pshapes],
        out_specs=tuple(
            [pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
             pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(s, const, memory_space=pltpu.VMEM)
               for s in pshapes]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, cond, g, *_reshape_params(params))


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19))
def fused_layer_vjp(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                    ln3s, ln3b, w1, b1, dw, dwb, w2, b2,
                    n_heads: int, hw: int, interpret: bool = False):
    """Full decoder layer, fully fused and differentiable.

    Parity with reference DecoderBlock.forward (transformer_blocks.py:135-139).
    dw: (3, 3, hidden) depthwise taps.
    """
    params = [ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
              ln3s, ln3b, w1, b1, dw, dwb, w2, b2]
    return _pallas_fwd(x, cond, params, n_heads, hw, interpret)


def _vjp_fwd_real(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                  ln3s, ln3b, w1, b1, dw, dwb, w2, b2, n_heads, hw, interpret):
    params = [ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
              ln3s, ln3b, w1, b1, dw, dwb, w2, b2]
    y = _pallas_fwd(x, cond, params, n_heads, hw, interpret)
    return y, (x, cond, params)


def _vjp_bwd(n_heads, hw, interpret, res, g):
    x, cond, params = res
    outs = _pallas_bwd(x, cond, g, params, n_heads, hw, interpret)
    dx, dcond = outs[0], outs[1]
    grads = list(outs[2:])
    shaped = []
    for p, gr in zip(params, grads):
        shaped.append(gr.reshape(p.shape).astype(p.dtype))
    return (dx, dcond, *shaped)


fused_layer_vjp.defvjp(_vjp_fwd_real, _vjp_bwd)
