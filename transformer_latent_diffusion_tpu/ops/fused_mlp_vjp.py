"""Differentiable fused sep-conv MLP: Pallas forward AND backward.

Training motivation (measured, batch 256, 12 layers): the sep-conv MLP is
56% of fwd+bwd time because the (B*N, 4D) hidden activation round-trips
HBM between the expand matmul, depthwise conv, GELU and contract matmul —
~2GB of traffic per layer per step. This op keeps the hidden tensor of
one batch element entirely in VMEM in both passes:

  forward:  y = (gelu(dw3x3(x @ W1 + b1)) @ W2 + b2)       [one kernel]
  backward: recomputes the forward inside the kernel (1 extra expand
            matmul is ~10x cheaper than spilling the hidden state) and
            produces dx plus all weight grads, with weight-grad blocks
            accumulated in VMEM across the batch grid.

LayerNorm and the residual add stay outside (cheap at (N, D) width).
Gradients are asserted against jax.grad of the jnp reference
implementation by tests/test_fused_mlp_vjp.py. Used by the training path
when TrainConfig.fused_mlp_vjp is on; inference uses ops/fused_stack.py.
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

from transformer_latent_diffusion_tpu.ops.fused_block import _erf_poly

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _gelu_f32(c):
    return 0.5 * c * (1.0 + _erf_poly(c * _INV_SQRT2))


def _gelu_grad_f32(c):
    phi_big = 0.5 * (1.0 + _erf_poly(c * _INV_SQRT2))      # Phi(c)
    phi_small = jnp.exp(-0.5 * c * c) * _INV_SQRT2PI        # phi(c)
    return phi_big + c * phi_small


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    """a.T @ b with f32 accumulation (a: (k,m), b: (k,n)) -> (m,n)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """a @ b.T (a: (m,k), b: (n,k)) -> (m,n)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dw_fwd(h_f32_grid, dw_f32, hw, flip: bool = False):
    """3x3 depthwise conv on a (hw, hw, K) grid, Mosaic-friendly.

    acc[i,j,c] = sum_{di,dj} h[i+di-1, j+dj-1, c] * w[di*3+dj, c] (zero pad).
    The row (i) shifts ride the free outer axis; the column (j) shifts are
    commuted to the END so only 2 sublane-offset slices are needed instead
    of 6 (measured ~40% faster than the naive 9-slice form on v5e — see
    scripts/microbench_layer.py). flip=True uses reversed taps, which turns
    this into the transposed correlation used by the input gradient.
    """
    pr = jnp.pad(h_f32_grid, ((1, 1), (0, 0), (0, 0)))

    def tap(di, dj):
        idx = di * 3 + dj
        return dw_f32[8 - idx] if flip else dw_f32[idx]

    zs = []
    for dj in range(3):
        zs.append(pr[0:hw] * tap(0, dj)
                  + pr[1:hw + 1] * tap(1, dj)
                  + pr[2:hw + 2] * tap(2, dj))
    # acc[:, j] = z0[:, j-1] + z1[:, j] + z2[:, j+1]  (zero boundary)
    pc0 = jnp.pad(zs[0], ((0, 0), (1, 1), (0, 0)))
    pc2 = jnp.pad(zs[2], ((0, 0), (1, 1), (0, 0)))
    return pc0[:, 0:hw] + zs[1] + pc2[:, 2:hw + 2]


def _dw_input_grad(dc_grid, dw_f32, hw):
    # transposed 3x3 correlation == forward conv with flipped taps
    return _dw_fwd(dc_grid, dw_f32, hw, flip=True)


def _dw_tap_grads(h_grid, dc, hw):
    """Per-tap depthwise weight grads: list of 9 (K,) rows, ddw[di*3+dj].

    Commuted like _dw_fwd: dc is column-shifted twice (2 sublane slices),
    h rides the free outer axis.
    """
    pr = jnp.pad(h_grid, ((1, 1), (0, 0), (0, 0)))
    pd = jnp.pad(dc, ((0, 0), (1, 1), (0, 0)))
    dcs = [pd[:, 2:hw + 2], dc, pd[:, 0:hw]]  # dj = 0, 1, 2
    out = []
    for di in range(3):
        for dj in range(3):
            out.append(jnp.sum(pr[di:di + hw] * dcs[dj], axis=(0, 1)))
    return out


# ------------------------------ forward kernel ------------------------------


def _fwd_kernel(x_ref, w1_ref, b1_ref, dw_ref, dwb_ref, w2_ref, b2_ref,
                o_ref, *, hw: int):
    mxu = w1_ref.dtype
    x = x_ref[0]
    h = _mm(x.astype(mxu), w1_ref[...]) + b1_ref[0].astype(jnp.float32)
    k = h.shape[-1]
    c = _dw_fwd(h.reshape(hw, hw, k), dw_ref[...].astype(jnp.float32), hw)
    c = c + dwb_ref[0].astype(jnp.float32)
    a = _gelu_f32(c).reshape(hw * hw, k).astype(mxu)
    y = _mm(a, w2_ref[...]) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


# ------------------------------ backward kernel -----------------------------


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, dw_ref, dwb_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, ddw_ref, ddwb_ref, dw2_ref, db2_ref,
                *, hw: int):
    mxu = w1_ref.dtype
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        ddwb_ref[...] = jnp.zeros_like(ddwb_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[0].astype(mxu)                                # (N, D)
    g = g_ref[0].astype(jnp.float32)                        # (N, D)
    dw_f32 = dw_ref[...].astype(jnp.float32)                # (9, K)

    # --- recompute forward intermediates in VMEM ---
    h = _mm(x, w1_ref[...]) + b1_ref[0].astype(jnp.float32)  # (N, K) f32
    k = h.shape[-1]
    c = _dw_fwd(h.reshape(hw, hw, k), dw_f32, hw) \
        + dwb_ref[0].astype(jnp.float32)                     # (hw,hw,K)
    a = _gelu_f32(c).reshape(hw * hw, k)                     # (N, K) f32

    # --- contract matmul grads ---
    g_lp = g.astype(mxu)
    dw2_ref[...] += _mm_tn(a.astype(mxu), g_lp)              # (K, D)
    db2_ref[...] += jnp.sum(g, axis=0, keepdims=True)        # (1, D)
    da = _mm_nt(g_lp, w2_ref[...])                           # (N, K) f32

    # --- gelu + depthwise grads ---
    dc = (da.reshape(hw, hw, k) * _gelu_grad_f32(c))         # (hw,hw,K)
    ddwb_ref[...] += jnp.sum(dc, axis=(0, 1)).reshape(1, k)
    tap_grads = _dw_tap_grads(h.reshape(hw, hw, k), dc, hw)
    for t in range(9):
        ddw_ref[t, :] += tap_grads[t]
    dh = _dw_input_grad(dc, dw_f32, hw).reshape(hw * hw, k)  # (N, K) f32

    # --- expand matmul grads ---
    dh_lp = dh.astype(mxu)
    dw1_ref[...] += _mm_tn(x, dh_lp)                         # (D, K)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dx_ref[0] = _mm_nt(dh_lp, w1_ref[...]).astype(dx_ref.dtype)


def _pallas_fwd(x, w1, b1, dw, dwb, w2, b2, hw, interpret):
    b, n, d = x.shape
    hidden = w1.shape[1]
    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hw=hw),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), dw.reshape(9, -1), dwb.reshape(1, -1),
      w2, b2.reshape(1, -1))


def _pallas_bwd(x, g, w1, b1, dw, dwb, w2, hw, interpret):
    b, n, d = x.shape
    hidden = w1.shape[1]
    const = lambda i: (0, 0)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, hw=hw),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),        # dx
            jax.ShapeDtypeStruct((d, hidden), jnp.float32),  # dW1
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),  # db1
            jax.ShapeDtypeStruct((9, hidden), jnp.float32),  # ddw
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),  # ddwb
            jax.ShapeDtypeStruct((hidden, d), jnp.float32),  # dW2
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # db2
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, g, w1, b1.reshape(1, -1), dw.reshape(9, -1), dwb.reshape(1, -1), w2)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mlp_sepconv_vjp(x, w1, b1, dw, dwb, w2, b2, hw: int,
                          interpret: bool = False):
    """y = gelu(dw3x3(x @ W1 + b1) + dwb) @ W2 + b2, fully fused.

    x: (B, N, D) with N == hw*hw; dw: (3, 3, hidden) (or (9, hidden)).
    Differentiable w.r.t. all tensor args.
    """
    return _pallas_fwd(x, w1, b1, dw.reshape(9, -1), dwb, w2, b2, hw, interpret)


def _vjp_fwd(x, w1, b1, dw, dwb, w2, b2, hw, interpret):
    y = _pallas_fwd(x, w1, b1, dw.reshape(9, -1), dwb, w2, b2, hw, interpret)
    return y, (x, w1, b1, dw, dwb, w2, b2)


def _vjp_bwd(hw, interpret, res, g):
    x, w1, b1, dw, dwb, w2, b2 = res
    dx, dw1, db1, ddw, ddwb, dw2, db2 = _pallas_bwd(
        x, g, w1, b1, dw.reshape(9, -1), dwb, w2, hw, interpret)
    return (dx,
            dw1.astype(w1.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            ddw.reshape(dw.shape).astype(dw.dtype),
            ddwb.reshape(dwb.shape).astype(dwb.dtype),
            dw2.astype(w2.dtype),
            db2.reshape(b2.shape).astype(b2.dtype))


fused_mlp_sepconv_vjp.defvjp(_vjp_fwd, _vjp_bwd)
