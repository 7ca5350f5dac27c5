"""Multi-layer fused Pallas kernel: K decoder layers per pallas_call.

Motivation (measured on the target runtime): each dispatched op costs
~0.7ms fixed regardless of size, so a 12-layer model executed as ~40 ops
is overhead-bound. This kernel packs K complete decoder layers — LN1 ->
QKV -> self-attention -> +res -> LN2 -> cond-KV projection -> length-2
cross-attention -> +res -> LN3 -> expand -> 3x3 depthwise -> GELU ->
contract -> +res, K times — into ONE pallas_call with all K layers'
weights stacked and VMEM-resident (v5e VMEM is large; the default 16MB
scoped limit is raised via CompilerParams). A 12-layer forward becomes 3
kernel launches instead of ~40 ops.

Numerics: f32 LayerNorm/softmax/accumulation; bf16 (or input dtype) MXU
operands. GELU uses an erf polynomial (|err|<1.5e-7) since Mosaic lacks
erf. Inference-only; training uses the XLA path. Parity asserted by
tests/test_fused_kernels.py.
"""

from __future__ import annotations

import functools
import math
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
    _mm_t,
)
from transformer_latent_diffusion_tpu.ops.fused_mlp_vjp import _dw_fwd


def _mha(q, k, v, n_heads: int, mxu):
    """Per-head softmax(q k^T / sqrt(dh)) v with f32 softmax.

    q: (Nq, D); k, v: (Nk, D) in mxu dtype -> f32 (Nq, D).
    """
    d = q.shape[-1]
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    cols = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = _mm_t(q[:, sl], k[:, sl]) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(mxu)
        cols.append(_mm(p, v[:, sl]))
    return jnp.concatenate(cols, axis=-1)


def _layer_stack_kernel(x_ref, cond_ref,
                        ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
                        ln3s, ln3b, w1, b1, dw, dwb, w2, b2,
                        o_ref, *, n_layers: int, n_heads: int, hw: int):
    mxu = wqkv.dtype
    x = x_ref[0].astype(jnp.float32)                      # (N, D)
    cond = cond_ref[0]                                    # (2, D)
    n, d = x.shape

    for l in range(n_layers):
        # ---- self attention ----
        xn = _ln_f32(x, ln1s[l].astype(jnp.float32), ln1b[l].astype(jnp.float32))
        qkv = _mm(xn.astype(mxu), wqkv[l]).astype(mxu)    # (N, 3D)
        x = x + _mha(qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:], n_heads, mxu)

        # ---- cross attention (cond KV projected in-kernel) ----
        xn2 = _ln_f32(x, ln2s[l].astype(jnp.float32), ln2b[l].astype(jnp.float32))
        qc = _mm(xn2.astype(mxu), wq[l]).astype(mxu)      # (N, D)
        kv = _mm(cond.astype(mxu), wkv[l]).astype(mxu)    # (2, 2D)
        x = x + _mha(qc, kv[:, :d], kv[:, d:], n_heads, mxu)

        # ---- sep-conv MLP ----
        xn3 = _ln_f32(x, ln3s[l].astype(jnp.float32), ln3b[l].astype(jnp.float32))
        hmat = _mm(xn3.astype(mxu), w1[l]) + b1[l].astype(jnp.float32)
        hmat = hmat.astype(mxu)
        hid = hmat.shape[-1]
        dwl = dw[l].astype(jnp.float32)                   # (9, hid)
        acc = _dw_fwd(hmat.astype(jnp.float32).reshape(hw, hw, hid), dwl, hw)
        acc = acc + dwb[l].astype(jnp.float32)
        act = _gelu_exact(acc).reshape(hw * hw, hid).astype(mxu)
        x = x + _mm(act, w2[l]) + b2[l].astype(jnp.float32)

    o_ref[0] = x.astype(o_ref.dtype)


def fused_layer_stack(x, cond, stack: Dict[str, Any], hw: int, n_heads: int,
                      interpret: bool = False):
    """Run K stacked decoder layers in one pallas call.

    x: (B, N, D); cond: (B, 2, D); stack: dict of per-layer-stacked weights
    from `pack_layer_stack` (leading dim K on every array).
    """
    b, n, d = x.shape
    k_layers = stack["wqkv"].shape[0]
    hidden = stack["w1"].shape[-1]

    order = ["ln1s", "ln1b", "wqkv", "ln2s", "ln2b", "wq", "wkv",
             "ln3s", "ln3b", "w1", "b1", "dw", "dwb", "w2", "b2"]
    args = [stack[name] for name in order]

    def const_spec(arr):
        shape = arr.shape
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    weight_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in args)
    # generous VMEM budget: stacked weights + activations + headroom
    vmem_limit = min(120 * 1024 * 1024,
                     weight_bytes + 24 * 1024 * 1024)

    return pl.pallas_call(
        functools.partial(_layer_stack_kernel, n_layers=k_layers,
                          n_heads=n_heads, hw=hw),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const_spec(a) for a in args],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=k_layers * (2 * b * n * d * (3 * d + d + 2 * d)
                              + 4 * b * n * n * d + 4 * b * n * d * hidden),
            bytes_accessed=2 * x.size * x.dtype.itemsize + weight_bytes,
            transcendentals=k_layers * b * n * (n + 10 * hidden // d),
        ),
        interpret=interpret,
    )(x, cond, *args)


def pack_layer_stack(params: Dict[str, Any], layer_indices: List[int],
                     dtype) -> Dict[str, Any]:
    """Stack the per-layer weights of `layer_indices` along a new leading
    axis, in the layout _layer_stack_kernel expects."""
    tb = params["denoiser_trans_block"]

    def get(i):
        blk = tb[f"decoder_block_{i}"]
        return {
            "ln1s": blk["norm1"]["scale"].reshape(1, -1),
            "ln1b": blk["norm1"]["bias"].reshape(1, -1),
            "wqkv": blk["self_attention"]["qkv_linear"]["kernel"].astype(dtype),
            "ln2s": blk["norm2"]["scale"].reshape(1, -1),
            "ln2b": blk["norm2"]["bias"].reshape(1, -1),
            "wq": blk["cross_attention"]["q_linear"]["kernel"].astype(dtype),
            "wkv": blk["cross_attention"]["kv_linear"]["kernel"].astype(dtype),
            "ln3s": blk["norm3"]["scale"].reshape(1, -1),
            "ln3b": blk["norm3"]["bias"].reshape(1, -1),
            "w1": blk["mlp"]["expand"]["kernel"].astype(dtype),
            "b1": blk["mlp"]["expand"]["bias"].reshape(1, -1),
            "dw": blk["mlp"]["depthwise_kernel"][:, :, 0, :].reshape(9, -1).astype(dtype),
            "dwb": blk["mlp"]["depthwise_bias"].reshape(1, -1),
            "w2": blk["mlp"]["contract"]["kernel"].astype(dtype),
            "b2": blk["mlp"]["contract"]["bias"].reshape(1, -1),
        }

    per_layer = [get(i) for i in layer_indices]
    return {
        key: jnp.stack([pl_[key] for pl_ in per_layer], axis=0)
        for key in per_layer[0]
    }
