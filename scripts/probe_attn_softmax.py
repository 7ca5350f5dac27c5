"""Flash-attention softmax variants at 4096 tokens (same-process A/B).

The 1024px (4096-token) path is softmax-bound in the flash kernel. Two
exact-math rewrites to test:
  exp2     exp(x) == exp2(x * log2 e) — native pow2 may beat exp
  postdiv  (e @ v) / z instead of (e / z) @ v — a (bq, dh) division
           replaces a (bq, nk) one (64 vs 4096 columns)

Usage: python scripts/probe_attn_softmax.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, use_exp2, postdiv):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    if use_exp2:
        e = jnp.exp2((s - m) * LOG2E)
    else:
        e = jnp.exp(s - m)
    z = jnp.sum(e, axis=-1, keepdims=True)
    if postdiv:
        out = jax.lax.dot_general(e.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) / z
    else:
        p = (e / z).astype(v.dtype)
        out = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def attn(q, k, v, use_exp2, postdiv, q_block=256):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    bh = b * h
    qf, kf, vf = (x.reshape(bh, -1, dh) for x in (q, k, v))
    return pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / dh ** 0.5,
                          use_exp2=use_exp2, postdiv=postdiv),
        out_shape=jax.ShapeDtypeStruct((bh, nq, dh), q.dtype),
        grid=(bh, pl.cdiv(nq, q_block)),
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
    )(qf, kf, vf).reshape(b, h, nq, dh)


def main():
    n = 4096
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (4, 12, n, 64), jnp.bfloat16)
               for kk in ks)
    ref = None
    for tag, e2, pd in (("exp,prediv (current)", False, False),
                        ("exp2,prediv", True, False),
                        ("exp,postdiv", False, True),
                        ("exp2,postdiv", True, True)):
        f = jax.jit(functools.partial(attn, use_exp2=e2, postdiv=pd))
        out = f(q, k, v)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(20):
            out = f(q, k, v)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.time() - t0) / 20
        if ref is None:
            ref = out
        d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                  - ref.astype(jnp.float32))))
        print(f"{tag:24s} {dt * 1e3:7.2f} ms  maxdiff {d:.1e}", flush=True)


if __name__ == "__main__":
    main()

# Measured (v5e tunnel, 20 reps, after the bf16-operand fix):
#   exp,prediv (current)  4.86 ms
#   exp2,prediv           4.91 ms
#   exp,postdiv           4.75 ms
#   exp2,postdiv          4.96 ms
# All within run noise -> DEAD END: Mosaic's exp lowering is already
# fast and the (bq, nk) division is not a bottleneck. Keep exp+prediv.
# (The bf16-operand change itself was the real win: 6.22 -> 4.86 ms.)
