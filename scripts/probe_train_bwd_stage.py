"""Per-stage roofline of the fused-layer TRAIN BACKWARD kernel.

VERDICT r2 #3: bwd = 25.3 ms vs fwd = 9.2 ms per layer at batch 256
(2.75x, where the naive fwd+grads FLOP ratio is 2x). This probe measures
where the backward's time actually goes by timing ablated variants of
ops/fused_layer_vjp._bwd_kernel on the real TPU, same-process:

  fwd        the production forward kernel (baseline sanity)
  full       the production backward kernel
  recompute  forward-recompute-with-residuals only (every residual
             consumed by a cheap reduction so Mosaic cannot DCE it)
  no_self    full minus the self-attention grad section
  no_mlp     full minus the MLP grad section
  no_cross   full minus the cross-attention grad section

Analytic FLOP accounting (N=256, d=768, K=3072, 12 heads, per sample
per layer): fwd 3.84 GF; bwd = recompute 2.63 GF (fwd minus the skipped
contract matmul) + MLP grads 4.86 GF + self-attn grads 2.21 GF +
cross-attn grads 0.61 GF = 10.31 GF = 2.68x fwd. If the measured ratio
~= the FLOP ratio, the backward already runs at forward efficiency and
the "missing" train MFU is the recompute tax — structural unless
residuals can be stored, which on this chip's ~90 GB/s HBM they cannot
(storing qkv+x1+x2+h+c costs ~10 MB/sample/layer => ~30 GB of traffic
per batch-256 step ~= 340 ms, vs ~6 ms/layer of recompute MXU time).

Usage: python scripts/probe_train_bwd_stage.py [--batch 256] [--reps 20]
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from transformer_latent_diffusion_tpu.ops import fused_layer_vjp as fl  # noqa: E402
from transformer_latent_diffusion_tpu.ops.fused_attn_vjp import (  # noqa: E402
    _ln_bwd,
    _mm,
    _mm_nt,
    _mm_tn,
    _softmax_bwd,
)
from transformer_latent_diffusion_tpu.ops.fused_mlp_vjp import (  # noqa: E402
    _dw_input_grad,
    _dw_tap_grads,
    _gelu_grad_f32,
)

N, D, K, HEADS, HW = 256, 768, 3072, 12, 16


def _consume(ref, arr):
    """Keep `arr` alive against DCE with a cheap reduce-add into a grad
    ref (VPU reduction, negligible next to the kernel's matmuls)."""
    ref[...] += jnp.full(ref.shape, jnp.sum(arr), ref.dtype)


def make_bwd_kernel(mode):
    """Production _bwd_kernel with grad sections gated by `mode`; the
    forward recompute is always intact (ablations must not let Mosaic
    DCE the recompute that the real kernel pays for).

    mode == "bf16res": the full backward, but every recompute residual
    is stored bf16 and upcast at use — halves the live-VMEM footprint
    of the recompute stage (the per-stage table's weakest link) at the
    cost of casts + ~3 digits on the softmax/LN/GELU grad inputs.
    Measures whether VMEM pressure (not FLOPs) is what holds the
    backward at ~98 TFLOPS."""

    def kernel(x_ref, cond_ref, g_ref,
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
            for ref in (dln1s_ref, dln1b_ref, dwqkv_ref, dln2s_ref,
                        dln2b_ref, dwq_ref, dwkv_ref, dln3s_ref, dln3b_ref,
                        dw1_ref, db1_ref, ddw_ref, ddwb_ref, dw2_ref,
                        db2_ref):
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

        # ---- recompute forward with residuals (always) ----
        x2, (xn1, xhat1, rstd1, q, k, v, x1, xn2, xhat2, rstd2,
             qc, kc, vc, p_self, p_cross) = fl._attn_pair_fwd(
            x, cond, g1s, ln1b[0].astype(jnp.float32), wqkv[...],
            g2s, ln2b[0].astype(jnp.float32), wq[...], wkv[...],
            n_heads, mxu, want_residuals=True)
        _, (xn3, xhat3, rstd3, h, c, a) = fl._mlp_fwd(
            x2, g3s, ln3b[0].astype(jnp.float32), w1[...],
            b1[0].astype(jnp.float32), dw9, dwb[0].astype(jnp.float32),
            w2[...], b2[0].astype(jnp.float32), hw, mxu,
            want_residuals=True)

        if mode == "bf16res":
            # store residuals bf16 (rstd stays f32); the grad sections
            # below consume them via mixed-dtype promotion / the f32-
            # accumulating _mm helpers, so no other code changes needed
            down = lambda t: t.astype(jnp.bfloat16)  # noqa: E731
            (xn1, xhat1, q, k, v, x1, xn2, xhat2, qc, kc, vc,
             xn3, xhat3, h, c, a) = map(down, (
                 xn1, xhat1, q, k, v, x1, xn2, xhat2, qc, kc, vc,
                 xn3, xhat3, h, c, a))
            p_self = [down(p) for p in p_self]
            p_cross = [down(p) for p in p_cross]

        if mode == "recompute":
            # consume everything; no grad math
            dx_ref[0] = x2.astype(dx_ref.dtype)
            dcond_ref[0] = cond.astype(dcond_ref.dtype)
            for ref, arr in ((dln1s_ref, xn1), (dln1b_ref, xhat1),
                             (dwqkv_ref, q), (dln2s_ref, xn2),
                             (dln2b_ref, xhat2), (dwq_ref, qc),
                             (dwkv_ref, kc), (dln3s_ref, xn3),
                             (dln3b_ref, xhat3), (dw1_ref, h),
                             (db1_ref, c), (ddw_ref, a),
                             (ddwb_ref, x1), (dw2_ref, v)):
                _consume(ref, arr)
            _consume(db2_ref, sum(jnp.sum(p) for p in p_self)
                     + sum(jnp.sum(p) for p in p_cross)
                     + jnp.sum(rstd1) + jnp.sum(rstd2) + jnp.sum(rstd3)
                     + jnp.sum(vc))
            return

        # ---- MLP backward ----
        kk = h.shape[-1]
        if mode != "no_mlp":
            g_lp = g.astype(mxu)
            dw2_ref[...] += _mm_tn(a.astype(mxu), g_lp)
            db2_ref[...] += jnp.sum(g, axis=0, keepdims=True)
            da = _mm_nt(g_lp, w2[...])
            # erf poly needs f32: Mosaic has no bf16 vector compare
            dc = da.reshape(hw, hw, kk) * _gelu_grad_f32(
                c.astype(jnp.float32))
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
        else:
            # keep the MLP recompute alive, skip its grad math
            for ref, arr in ((dw1_ref, h), (db1_ref, c), (ddw_ref, a),
                             (dln3s_ref, xn3), (dln3b_ref, xhat3)):
                _consume(ref, arr)
            dx2 = g

        # ---- cross-attention backward ----
        if mode != "no_cross":
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
        else:
            dcond_ref[0] = cond.astype(dcond_ref.dtype)
            for ref, arr in ((dwq_ref, qc), (dwkv_ref, kc),
                             (dln2s_ref, xn2), (dln2b_ref, xhat2)):
                _consume(ref, arr)
            _consume(db2_ref, sum(jnp.sum(p) for p in p_cross)
                     + jnp.sum(vc))
            dx1 = dx2

        # ---- self-attention backward ----
        if mode != "no_self":
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
        else:
            for ref, arr in ((dwqkv_ref, q), (dln1s_ref, xn1),
                             (dln1b_ref, xhat1)):
                _consume(ref, arr)
            _consume(db2_ref, sum(jnp.sum(p) for p in p_self)
                     + jnp.sum(k) + jnp.sum(v))
            dx_ref[0] = dx1.astype(dx_ref.dtype)

    return kernel


def pallas_bwd_variant(mode, x, cond, g, params):
    b, n, d = x.shape
    hidden = params[9].shape[1]
    const = lambda i: (0, 0)  # noqa: E731
    pshapes = fl._param_shapes(d, hidden)
    return pl.pallas_call(
        functools.partial(make_bwd_kernel(mode), n_heads=HEADS, hw=HW),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((b, n, d), x.dtype),
             jax.ShapeDtypeStruct((b, 2, d), cond.dtype)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in pshapes]),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(s, const, memory_space=pltpu.VMEM)
             for s in pshapes],
        out_specs=tuple(
            [pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, 2, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(s, const, memory_space=pltpu.VMEM)
               for s in pshapes]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fl.VMEM_LIMIT_BYTES),
        interpret=False,
    )(x, cond, g, *fl._reshape_params(params))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    b = args.batch
    print(f"backend={jax.default_backend()} batch={b}", flush=True)

    rng = np.random.default_rng(0)
    mxu = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, N, D)), mxu)
    cond = jnp.asarray(rng.standard_normal((b, 2, D)), mxu)
    g = jnp.asarray(rng.standard_normal((b, N, D)), mxu)
    # params in the public fused_layer_vjp layouts (vectors flat, the
    # depthwise taps as (3,3,K)); _reshape_params normalizes for kernels
    pub = []
    for s in fl._param_shapes(D, K):
        if s[0] == 1:
            arr = rng.standard_normal(s[1])
        elif s == (9, K):
            arr = rng.standard_normal((3, 3, K))
        else:
            arr = rng.standard_normal(s)
        pub.append(jnp.asarray(arr * 0.02, mxu))

    def timed(label, fn, *inputs):
        out = fn(*inputs)
        jax.tree.map(lambda t: t.block_until_ready(), out)
        s = sum(float(jnp.sum(o.astype(jnp.float32))) for o in
                (out if isinstance(out, (tuple, list)) else [out]))
        assert np.isfinite(s), f"{label}: non-finite output"
        t0 = time.time()
        outs = [fn(*inputs) for _ in range(args.reps)]
        leaf = (outs[-1][0] if isinstance(outs[-1], (tuple, list))
                else outs[-1])
        float(jnp.sum(leaf.astype(jnp.float32)))  # one sync for the queue
        dt = (time.time() - t0) / args.reps
        print(f"{label:>10}: {dt * 1e3:7.2f} ms", flush=True)
        return dt

    fwd = jax.jit(lambda x, c: fl._pallas_fwd(x, c, pub, HEADS, HW, False))
    t_fwd = timed("fwd", fwd, x, cond)

    times = {}
    for mode in ("full", "bf16res", "recompute", "no_mlp", "no_cross",
                 "no_self"):
        fn = jax.jit(lambda a, b_, c_, m=mode:
                     pallas_bwd_variant(m, a, b_, c_, pub))
        times[mode] = timed(mode, fn, x, cond, g)

    full = times["full"]
    print("\n--- shares (full - ablated) ---")
    for mode in ("no_mlp", "no_cross", "no_self"):
        share = full - times[mode]
        print(f"{mode[3:]:>6} grads: {share * 1e3:6.2f} ms "
              f"({100 * share / full:4.1f}% of bwd)")
    print(f"recompute  : {times['recompute'] * 1e3:6.2f} ms "
          f"({100 * times['recompute'] / full:4.1f}% of bwd)")
    print(f"bwd/fwd    : {full / t_fwd:.2f}x (FLOP ratio 2.68x)")

    # per-stage achieved TFLOPS (analytic GF per sample per layer)
    gf = {"fwd": 3.84, "full": 10.31, "recompute": 2.63}
    for k_, v in times.items():
        if k_ in gf:
            print(f"{k_:>10}: {gf[k_] * b / v / 1e3:6.1f} TFLOPS")
    print(f"{'fwd':>10}: {gf['fwd'] * b / t_fwd / 1e3:6.1f} TFLOPS")


if __name__ == "__main__":
    main()
