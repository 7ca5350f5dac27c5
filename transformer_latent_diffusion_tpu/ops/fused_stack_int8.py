"""W8A8 int8 variant of the fused decoder-layer stack (inference only).

The v5e MXU runs int8 at 2x the bf16 rate; measured end-to-end on this
chip the expand+contract matmul pair goes from 134 to 191 TFLOP/s with
per-row dynamic activation quantization included (scripts/
microbench_int8.py). This kernel applies W8A8 to the four large
projections of each decoder layer — QKV, cross-attention Q, MLP expand
and MLP contract (together ~85% of the FLOPs) — and keeps everything
else in the bf16/f32 scheme of ops/fused_stack.py: f32 LayerNorm /
softmax / depthwise+GELU, bf16 attention score and PV matmuls, bf16
length-2 cond-KV projection.

Quantization scheme: per-output-channel symmetric int8 weights
(scales computed once at prepare time by `pack_layer_stack_int8`),
per-row (per-token) dynamic symmetric int8 activations quantized
in-kernel, int32 accumulation, f32 dequant epilogue fused with the bias
add. This trades exact bf16 parity for speed — the engine is opt-in via
`FusedEngine(..., quantize="int8")` and asserted against the bf16 path
at loose tolerance by tests/test_fused_int8.py.

Reference semantics covered: one full DecoderBlock per layer
(/root/reference/tld/transformer_blocks.py:116-139).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer_latent_diffusion_tpu.ops.fused_block import (
    _gelu_exact,
    _ln_f32,
    _mm,
)
from transformer_latent_diffusion_tpu.ops.fused_mlp_vjp import _dw_fwd
from transformer_latent_diffusion_tpu.ops.fused_stack import (
    _mha,
    pack_layer_stack,
)


def _rowquant(x_f32):
    """Per-row symmetric int8 quantization. Returns (int8 values, f32
    per-row scale)."""
    absmax = jnp.max(jnp.abs(x_f32), axis=-1, keepdims=True)
    rscale = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    return jnp.round(x_f32 * (1.0 / rscale)).astype(jnp.int8), rscale


def _mm_i8(xq, wq_i8):
    """int8 x int8 -> int32 MXU matmul."""
    return jax.lax.dot_general(xq, wq_i8, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _qmm(x_f32, wq_i8, colscale_f32):
    """W8A8 matmul with f32 dequant epilogue: x @ W (both quantized)."""
    xq, rs = _rowquant(x_f32)
    acc = _mm_i8(xq, wq_i8)
    return acc.astype(jnp.float32) * rs * colscale_f32


def _layer_stack_int8_kernel(x_ref, cond_ref,
                             ln1s, ln1b, wqkv, sqkv, ln2s, ln2b, wq, sq, wkv,
                             ln3s, ln3b, w1, s1, b1, dw, dwb, w2, s2, b2,
                             o_ref, *, n_layers: int, n_heads: int, hw: int,
                             mxu):
    x = x_ref[0].astype(jnp.float32)                      # (N, D)
    cond = cond_ref[0]                                    # (2, D)
    n, d = x.shape

    for l in range(n_layers):
        # ---- self attention (QKV projection in int8) ----
        xn = _ln_f32(x, ln1s[l].astype(jnp.float32), ln1b[l].astype(jnp.float32))
        qkv = _qmm(xn, wqkv[l], sqkv[l].astype(jnp.float32)).astype(mxu)
        x = x + _mha(qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:], n_heads, mxu)

        # ---- cross attention (Q in int8; tiny cond KV in mxu dtype) ----
        xn2 = _ln_f32(x, ln2s[l].astype(jnp.float32), ln2b[l].astype(jnp.float32))
        qc = _qmm(xn2, wq[l], sq[l].astype(jnp.float32)).astype(mxu)
        kv = _mm(cond.astype(mxu), wkv[l]).astype(mxu)    # (2, 2D)
        x = x + _mha(qc, kv[:, :d], kv[:, d:], n_heads, mxu)

        # ---- sep-conv MLP (expand/contract in int8) ----
        xn3 = _ln_f32(x, ln3s[l].astype(jnp.float32), ln3b[l].astype(jnp.float32))
        hmat = _qmm(xn3, w1[l], s1[l].astype(jnp.float32)) \
            + b1[l].astype(jnp.float32)
        hid = hmat.shape[-1]
        dwl = dw[l].astype(jnp.float32)                   # (9, hid)
        acc = _dw_fwd(hmat.reshape(hw, hw, hid), dwl, hw)
        acc = acc + dwb[l].astype(jnp.float32)
        act = _gelu_exact(acc).reshape(hw * hw, hid)
        x = x + _qmm(act, w2[l], s2[l].astype(jnp.float32)) \
            + b2[l].astype(jnp.float32)

    o_ref[0] = x.astype(o_ref.dtype)


def fused_layer_stack_int8(x, cond, stack: Dict[str, Any], hw: int,
                           n_heads: int, interpret: bool = False):
    """Run K stacked decoder layers in one pallas call, W8A8 int8.

    x: (B, N, D); cond: (B, 2, D); stack from `pack_layer_stack_int8`.
    """
    b, n, d = x.shape
    k_layers = stack["wqkv"].shape[0]
    mxu = stack["wkv"].dtype

    order = ["ln1s", "ln1b", "wqkv", "sqkv", "ln2s", "ln2b", "wq", "sq",
             "wkv", "ln3s", "ln3b", "w1", "s1", "b1", "dw", "dwb",
             "w2", "s2", "b2"]
    args = [stack[name] for name in order]

    def const_spec(arr):
        shape = arr.shape
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    weight_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in args)
    # int8 weights are half the bytes of bf16, but the int32 accumulators
    # and f32 dequant intermediates are LARGER than the bf16 kernel's —
    # give the scratch a much bigger share or the compiler spills.
    vmem_limit = min(120 * 1024 * 1024, weight_bytes + 72 * 1024 * 1024)

    return pl.pallas_call(
        functools.partial(_layer_stack_int8_kernel, n_layers=k_layers,
                          n_heads=n_heads, hw=hw, mxu=mxu),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const_spec(a) for a in args],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x, cond, *args)


def _colquant(w) -> tuple:
    """Per-output-channel symmetric int8 weight quantization."""
    wf = w.astype(jnp.float32)
    cscale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-8) \
        * (1.0 / 127.0)
    wq = jnp.round(wf * (1.0 / cscale)).astype(jnp.int8)
    return wq, cscale


def pack_layer_stack_int8(params: Dict[str, Any], layer_indices: List[int],
                          dtype) -> Dict[str, Any]:
    """Like fused_stack.pack_layer_stack, plus int8 quantization of the
    four large projections (wqkv, wq, w1, w2) with per-column scales."""
    stack = pack_layer_stack(params, layer_indices, dtype)
    out = dict(stack)
    for name, scale_name in (("wqkv", "sqkv"), ("wq", "sq"),
                             ("w1", "s1"), ("w2", "s2")):
        wq, cs = jax.vmap(_colquant)(stack[name])
        out[name] = wq
        out[scale_name] = cs
    return out
