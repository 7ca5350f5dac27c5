"""Probe: does an int8 MXU matmul pair in Pallas beat bf16 on this chip?

Times the denoiser's MLP matmul pair y = (x @ W1) @ W2 with
x (256, 768), W1 (768, 3072), W2 (3072, 768) over a batch-256 grid —
bf16 vs W8A8 int8 (per-row dynamic activation quant, per-column weight
scales, f32 dequant epilogue — exactly what a quantized engine would
run). Output shape == input shape so iterations chain through lax.scan
(no CSE hazard). Decides whether a quantized inference engine is worth
building.

Usage: python scripts/microbench_int8.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B, N, D, K = 256, 256, 768, 3072
FLOPS_PER_CALL = 2 * B * N * D * K * 2  # two matmuls


def _mm(a, b, pt):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=pt)


def _bf16_kernel(x_ref, w1_ref, w2_ref, o_ref):
    h = _mm(x_ref[0], w1_ref[...], jnp.float32).astype(jnp.bfloat16)
    o_ref[0] = _mm(h, w2_ref[...], jnp.float32).astype(o_ref.dtype)


def _rowquant(x_f32):
    absmax = jnp.max(jnp.abs(x_f32), axis=-1, keepdims=True)
    rscale = jnp.maximum(absmax, 1e-6) / 127.0
    return jnp.round(x_f32 / rscale).astype(jnp.int8), rscale


def _int8_kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    xq, rs = _rowquant(x)
    h = _mm(xq, w1_ref[...], jnp.int32).astype(jnp.float32) \
        * rs * s1_ref[0].astype(jnp.float32)
    hq, rs2 = _rowquant(h)
    o_ref[0] = (_mm(hq, w2_ref[...], jnp.int32).astype(jnp.float32)
                * rs2 * s2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def make_fn(kind, weights):
    const = lambda i: (0, 0)  # noqa: E731
    if kind == "bf16":
        w1, w2 = weights
        specs = [pl.BlockSpec((D, K), const, memory_space=pltpu.VMEM),
                 pl.BlockSpec((K, D), const, memory_space=pltpu.VMEM)]
        kernel = _bf16_kernel
    else:
        w1, s1, w2, s2 = weights
        specs = [pl.BlockSpec((D, K), const, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, K), const, memory_space=pltpu.VMEM),
                 pl.BlockSpec((K, D), const, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM)]
        kernel = _int8_kernel

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] + specs,
            out_specs=pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, *weights)

    return run


def time_chained(fn, x, iters, tag):
    @jax.jit
    def chained(x):
        def body(c, _):
            return fn(c), 0.0
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    t0 = time.time()
    out = chained(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    first = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = chained(out)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / (reps * iters)
    print(f"{tag:8s} {dt * 1e3:8.3f} ms/call  "
          f"{FLOPS_PER_CALL / dt / 1e12:7.1f} TFLOP/s  (first {first:.1f}s)",
          flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, D)) * 0.1, jnp.bfloat16)
    w1f = (rng.standard_normal((D, K)) * 0.02).astype(np.float32)
    w2f = (rng.standard_normal((K, D)) * 0.02).astype(np.float32)

    s1 = np.abs(w1f).max(axis=0) / 127.0
    s2 = np.abs(w2f).max(axis=0) / 127.0
    w1q = jnp.asarray(np.round(w1f / s1).astype(np.int8))
    w2q = jnp.asarray(np.round(w2f / s2).astype(np.int8))
    bf_weights = (jnp.asarray(w1f, jnp.bfloat16), jnp.asarray(w2f, jnp.bfloat16))
    i8_weights = (w1q, jnp.asarray(s1.reshape(1, K)),
                  w2q, jnp.asarray(s2.reshape(1, D)))

    try:
        y8 = make_fn("int8", i8_weights)(x).astype(jnp.float32)
        yb = make_fn("bf16", bf_weights)(x).astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(y8 - yb)) / (jnp.max(jnp.abs(yb)) + 1e-9))
        print(f"int8 lowers OK; max rel err vs bf16: {rel:.3e}", flush=True)
    except Exception as e:
        print(f"int8 FAILED to lower: {type(e).__name__}: {e}", flush=True)
        return

    time_chained(make_fn("bf16", bf_weights), x, 10, "bf16")
    time_chained(make_fn("int8", i8_weights), x, 10, "int8")


if __name__ == "__main__":
    main()
