"""Attention ops: Pallas fused flash-attention kernel for TPU + XLA fallback.

The reference reaches fused attention through
`torch.nn.functional.scaled_dot_product_attention`
(/root/reference/tld/transformer_blocks.py:37). Here the TPU-native
equivalent is a Pallas kernel that keeps the (N, N) score matrix in VMEM
with float32 accumulation, fused softmax, and bf16-friendly tiling.

Shapes in this framework are (batch, seq, dim) at module level and
(batch, heads, seq, head_dim) inside the op. Denoiser sequence lengths are
small-to-medium (64..4096 tokens), so each (batch, head) slice's K/V fits
comfortably in VMEM; the kernel tiles over query blocks only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   dropout_rate: float = 0.0,
                   dropout_rng=None) -> jax.Array:
    """Reference-path attention in pure XLA (always correct, differentiable).

    q: (B, H, Nq, Dh), k/v: (B, H, Nk, Dh). Softmax in float32.

    dropout_rate > 0 (with an rng) applies dropout to the attention
    PROBABILITIES before the value matmul, with the kept entries scaled
    by 1/(1-p) — the exact semantics of torch SDPA's dropout_p
    (reference transformer_blocks.py:37,44-45). Train-only: samplers and
    eval never pass an rng.
    """
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return out


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch*head, q-block) program: full K/V in VMEM, f32 softmax.

    MXU operands stay in the INPUT dtype (bf16 under a bf16 model — f32
    operands issue at a fraction of the bf16 MXU rate; measured 1.75x
    end-to-end on this kernel at 4096 tokens) with f32 accumulation via
    preferred_element_type. For bf16 inputs QK^T is bit-identical to the
    old f32-upcast version (bf16 values are exact in f32); only the
    f32->bf16 cast of the probabilities before PV differs, the same
    scheme the fused layer engine uses.
    """
    q = q_ref[0]                      # (bq, dh), input dtype
    k = k_ref[0]                      # (nk, dh)
    v = v_ref[0]                      # (nk, dh)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                         # (bq, nk) f32

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    z = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / z).astype(v.dtype)

    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block",))
def _pallas_attention(q: jax.Array, k: jax.Array, v: jax.Array, q_block: int = 256):
    """Fused attention via Pallas. q/k/v: (B, H, N, Dh) with modest N."""
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    bh = b * h
    q_block = min(q_block, nq)

    qf = q.reshape(bh, nq, dh)
    kf = k.reshape(bh, nk, dh)
    vf = v.reshape(bh, nk, dh)

    scale = 1.0 / (dh ** 0.5)
    grid = (bh, pl.cdiv(nq, q_block))

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, nq, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq * nk * dh,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize * 2,
            transcendentals=bh * nq * nk,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, nq, dh)


def _pallas_ok(q: jax.Array, k: jax.Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    nq, dh = q.shape[-2], q.shape[-1]
    nk = k.shape[-2]
    # Tiny K/V sequences (length-2 cross-attention) are plain matmuls;
    # sublane tiling also wants >=8 rows.
    return nk >= 8 and nq >= 8 and dh % 8 == 0


@jax.custom_vjp
def _attention_core(q, k, v):
    if _pallas_ok(q, k):
        return _pallas_attention(q, k, v)
    return _xla_attention(q, k, v)


def _attention_fwd(q, k, v):
    return _attention_core(q, k, v), (q, k, v)


def _chunked_attention_bwd(q, k, v, g, q_chunk: int):
    """Flash-style backward: recompute softmax per q-chunk so the full
    (B, H, Nq, Nk) probability tensor is never materialized.

    At 4096 tokens that tensor is ~13GB f32 at batch 16 — it is what
    bounds hi-res training batch size. One scan pass over q-chunks
    computes dq for the chunk and accumulates dk/dv. f32 softmax and
    accumulation (same numerics as _xla_attention's grad)."""
    b, h, nq, dh = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    n_chunks = nq // q_chunk

    qc = q.reshape(b, h, n_chunks, q_chunk, dh).transpose(2, 0, 1, 3, 4)
    gc = g.reshape(b, h, n_chunks, q_chunk, dh).transpose(2, 0, 1, 3, 4)

    def step(carry, inp):
        dk_acc, dv_acc = carry
        q_i, g_i = inp                                    # (B, H, qc, Dh)
        # NB: f32 operands here are deliberate. The bf16-operand variant
        # (cast ds/p to bf16 before the grad matmuls, like the forward
        # kernel) was measured 10x SLOWER inside this scan on-chip
        # (31 s/step vs 3.4 at 1024px batch 16 — XLA lowers the mixed-
        # dtype scan body pathologically). Do not "optimize" it back.
        s = jnp.einsum("bhqd,bhkd->bhqk", q_i, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)                    # f32 (B,H,qc,Nk)
        g32 = g_i.astype(jnp.float32)
        dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        ds = ds * scale
        dq_i = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
        dk_acc = dk_acc + jnp.einsum("bhqk,bhqd->bhkd", ds,
                                     q_i.astype(jnp.float32))
        dv_acc = dv_acc + jnp.einsum("bhqk,bhqd->bhkd", p, g32)
        return (dk_acc, dv_acc), dq_i

    zeros = jnp.zeros(k.shape, jnp.float32)
    (dk, dv), dq = jax.lax.scan(step, (zeros, zeros), (qc, gc))
    dq = dq.transpose(1, 2, 0, 3, 4).reshape(b, h, nq, dh)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# softmax row-sums as MXU ones-matmuls instead of VPU lane-reduces:
# measured 1.156x on the fused 256-token train kernels
# (scripts/probe_train_softmax.py) but 0.37x — a 2.7x SLOWDOWN — in
# these flash backward kernels at 1024 tokens
# (scripts/probe_highres_softmax.py: 600 -> 1618 ms/step at 512px,
# batch 64). The trick only pays at small row counts; keep the VPU
# reduces here. Flag + helper retained for same-process A/B probes.
_ROWSUM_VIA_MXU = False


def _rowsum(a):
    """(n, k) f32 -> (n, 1) row-sum; MXU ones-matmul when enabled."""
    if not _ROWSUM_VIA_MXU:
        return jnp.sum(a, axis=-1, keepdims=True)
    ones = jnp.ones((a.shape[-1], 128), jnp.float32)
    return jax.lax.dot_general(
        a, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[:, :1]


def _flash_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                      *, scale: float):
    """One (batch*head) program: the whole (N, N) score/probability set
    lives in VMEM (fine up to ~2048 tokens with a raised vmem limit), so
    dq/dk/dv come out of one softmax recompute with zero HBM spill.
    bf16 MXU operands, f32 softmax/accumulation — the same scheme as the
    forward kernel."""
    q = q_ref[0]                      # (n, dh), input dtype
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / _rowsum(e)                                    # f32 (n, n)

    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - _rowsum(p * dp))
    ds_lp = (ds * scale).astype(q.dtype)
    p_lp = p.astype(v.dtype)

    dq_ref[0] = jax.lax.dot_general(
        ds_lp, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds_lp, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p_lp, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention_bwd(q, k, v, g, interpret: bool = False):
    b, h, n, dh = q.shape
    bh = b * h
    qf, kf, vf, gf = (x.reshape(bh, n, dh) for x in (q, k, v, g))
    spec = pl.BlockSpec((1, n, dh), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=1.0 / (dh ** 0.5)),
        out_shape=tuple(jax.ShapeDtypeStruct((bh, n, dh), x.dtype)
                        for x in (q, k, v)),
        grid=(bh,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n * n * dh,
            bytes_accessed=7 * bh * n * dh * qf.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf)
    return tuple(o.reshape(b, h, n, dh) for o in outs)


def _flash_bwd_tiled_kernel(q_ref, k_ref, v_ref, g_ref,
                            dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                            *, scale: float, q_block: int):
    """Tiled variant for long sequences (4096 tokens): full K/V stay in
    VMEM but scores are recomputed per q-block, with dk/dv accumulated
    in f32 VMEM scratch — VMEM stays ~30MB where the untiled kernel
    would need ~3 full (N, N) f32 buffers (~200MB)."""
    k = k_ref[0]
    v = v_ref[0]
    n = k.shape[0]
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)
    for i in range(n // q_block):
        sl = pl.ds(i * q_block, q_block)
        q_b = q_ref[0, sl, :]
        g_b = g_ref[0, sl, :]
        s = jax.lax.dot_general(q_b, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / _rowsum(e)
        dp = jax.lax.dot_general(g_b, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - _rowsum(p * dp))
        ds_lp = (ds * scale).astype(q_b.dtype)
        p_lp = p.astype(v.dtype)
        dq_ref[0, sl, :] = jax.lax.dot_general(
            ds_lp, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_acc[...] += jax.lax.dot_general(
            ds_lp, q_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_acc[...] += jax.lax.dot_general(
            p_lp, g_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def _pallas_attention_bwd_tiled(q, k, v, g, q_block: int = 512,
                                interpret: bool = False):
    b, h, n, dh = q.shape
    bh = b * h
    qf, kf, vf, gf = (x.reshape(bh, n, dh) for x in (q, k, v, g))
    spec = pl.BlockSpec((1, n, dh), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_flash_bwd_tiled_kernel,
                          scale=1.0 / (dh ** 0.5), q_block=q_block),
        out_shape=tuple(jax.ShapeDtypeStruct((bh, n, dh), x.dtype)
                        for x in (q, k, v)),
        grid=(bh,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        scratch_shapes=[pltpu.VMEM((n, dh), jnp.float32),
                        pltpu.VMEM((n, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n * n * dh,
            bytes_accessed=7 * bh * n * dh * qf.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf)
    return tuple(o.reshape(b, h, n, dh) for o in outs)


# the Pallas one-program-per-(batch, head) backward holds the full
# (N, N) f32 score set in VMEM — gate by token count; the tiled variant
# handles longer sequences
_PALLAS_BWD_MAX_TOKENS = 2048
_PALLAS_BWD_TILED_MAX_TOKENS = 8192

# chunk the backward only when the one-shot recompute's materialized
# f32 probability tensor would not fit comfortably in HBM: the one-shot
# is faster per-sample (measured: 1024px batch 8 one-shot 6.6 samples/s
# vs chunked 4.8 at batch 16), so it stays preferred whenever it fits
_BWD_ONE_SHOT_MAX_P_BYTES = 6 * 1024**3
_BWD_Q_CHUNK = 512


def _attention_bwd(res, g):
    q, k, v = res
    b, h, nq, _ = q.shape
    nk = k.shape[-2]
    # nq % 128 == 0: Mosaic tile alignment — a non-aligned length like
    # 520 would pass the other gates but fail to compile with no XLA
    # fallback (model shapes are powers of two, so this is a safety net)
    if (_pallas_ok(q, k) and nq == nk and nq <= _PALLAS_BWD_MAX_TOKENS
            and nq >= 512 and nq % 128 == 0):
        return _pallas_attention_bwd(q, k, v, g)
    if (_pallas_ok(q, k) and nq == nk and nq % 512 == 0
            and nq <= _PALLAS_BWD_TILED_MAX_TOKENS):
        return _pallas_attention_bwd_tiled(q, k, v, g)
    p_bytes = b * h * nq * nk * 4
    if (p_bytes > _BWD_ONE_SHOT_MAX_P_BYTES and nq % _BWD_Q_CHUNK == 0
            and nq == nk):
        return _chunked_attention_bwd(q, k, v, g, _BWD_Q_CHUNK)
    # small cases: one-shot recompute via the XLA path (fully fused)
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


_attention_core.defvjp(_attention_fwd, _attention_bwd)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_heads: int,
    use_pallas: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jax.Array:
    """Headsplit + scaled-dot-product attention + merge.

    Parity with reference MHAttention (transformer_blocks.py:24-48):
    non-causal, no mask; dropout_rate/dropout_rng = torch SDPA's
    dropout_p on the attention probabilities (train-only — the flash
    kernel does not support it, so an active dropout routes to the XLA
    path). q/k/v: (B, N, D) -> (B, N, D).
    """
    b, nq, d = q.shape
    nk = k.shape[1]
    dh = d // n_heads
    qh = q.reshape(b, nq, n_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, n_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, n_heads, dh).transpose(0, 2, 1, 3)

    dropout_on = dropout_rate > 0.0 and dropout_rng is not None
    if use_pallas and not dropout_on:
        out = _attention_core(qh, kh, vh)
    else:
        out = _xla_attention(qh, kh, vh, dropout_rate if dropout_on else 0.0,
                             dropout_rng)

    return out.transpose(0, 2, 1, 3).reshape(b, nq, d)
