"""Is an int8 VAE decoder worth building on this chip?

Times a 3x3 conv three ways at the two dominant decoder shapes:
  (a) bf16 `lax.conv_general_dilated` (the current VAE path),
  (b) int8 conv via `lax.conv_general_dilated` with int32 accumulation,
  (c) int8 conv as 9 shifted (BHW, Cin) @ (Cin, Cout) matmuls (guaranteed
      MXU-int8 lowering even if XLA's integer conv is not).

The v5e MXU runs int8 at 2x the bf16 rate; if (b) or (c) realizes ~2x,
an opt-in W8A8 VAE decode saves ~70ms of the 142ms decode in the int8
engine mode.

Usage: python scripts/microbench_int8_conv.py [--batch 32]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp


def timed(tag, fn, *args, reps=10):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / reps
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    b = args.batch
    key = jax.random.PRNGKey(0)

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    for (res, ch) in [(256, 128), (128, 256), (64, 512)]:
        x = jax.random.normal(key, (b, res, res, ch), dtype=jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, ch, ch), dtype=jnp.bfloat16) * 0.05
        xq = jnp.round(x.astype(jnp.float32) * 16).astype(jnp.int8)
        wq = jnp.round(w.astype(jnp.float32) * 64).astype(jnp.int8)
        macs = b * res * res * ch * ch * 9

        @jax.jit
        def conv_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        @jax.jit
        def conv_i8(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        @functools.partial(jax.jit, static_argnums=())
        def conv_i8_shift(x, w):
            # pad H/W by 1, take 9 shifted views, matmul each tap
            bb, h, ww_, c = x.shape
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((bb, h, ww_, w.shape[-1]), dtype=jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    view = jax.lax.dynamic_slice(
                        xp, (0, dy, dx, 0), (bb, h, ww_, c))
                    acc = acc + jax.lax.dot_general(
                        view, w[dy, dx], (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            return acc

        t_bf = timed("bf16", conv_bf16, x, w)
        try:
            t_i8 = timed("i8conv", conv_i8, xq, wq)
        except Exception as e:
            print(f"int8 conv failed: {type(e).__name__}: {e}")
            t_i8 = float("inf")
        t_sh = timed("i8shift", conv_i8_shift, xq, wq)
        print(f"{ch}@{res}^2: bf16 {t_bf*1e3:7.2f} ms ({macs*2/t_bf/1e12:5.1f} TF) | "
              f"i8conv {t_i8*1e3:7.2f} ms ({macs*2/t_i8/1e12:5.1f} TOPS) | "
              f"i8shift {t_sh*1e3:7.2f} ms ({macs*2/t_sh/1e12:5.1f} TOPS)",
              flush=True)


if __name__ == "__main__":
    main()
