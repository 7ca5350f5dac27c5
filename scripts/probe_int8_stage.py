"""Per-stage profile of the W8A8 int8 inference engine (VERDICT r1 #4).

Ablates the REAL engine kernels (ops/fused_stack.py and
ops/fused_stack_int8.py — no rewritten variants, which proved to have
their own Mosaic scheduling artifacts) by monkeypatching single helper
functions before building the engine:

  bf16            the exact engine (baseline)
  int8            the current W8A8 engine
  int8-staticq    _rowquant replaced with a static-scale quantizer
                  (no absmax reduce / divide): isolates the dynamic
                  activation-quantization overhead
  bf16-noattn     _mha replaced with an identity on q: isolates the
                  per-head (256,64) attention cost in the bf16 kernel
  int8-noattn     same ablation on the int8 kernel

Each timing runs the REAL 50-step sampling scan (DiffusionGenerator,
vae=None, the exact bench.py denoiser path) at the flagship shape, so
compiles ride the warm cache and sync overhead is ~2%. Numbers go to
docs/DESIGN.md's int8 analysis.

Usage: python scripts/probe_int8_stage.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transformer_latent_diffusion_tpu.configs import DenoiserConfig  # noqa: E402
from transformer_latent_diffusion_tpu.models import Denoiser  # noqa: E402
from transformer_latent_diffusion_tpu.utils import init_denoiser_params  # noqa: E402
from transformer_latent_diffusion_tpu.ops import fused_stack  # noqa: E402
from transformer_latent_diffusion_tpu.ops import fused_stack_int8  # noqa: E402

B = 64


def _static_rowquant(x_f32):
    """Per-tensor static-scale int8 quantization (calibration stand-in)."""
    scale = 0.0625  # static; values here are unit-ish
    xq = jnp.round(jnp.clip(x_f32, -127 * scale, 127 * scale)
                   * (1.0 / scale)).astype(jnp.int8)
    return xq, jnp.full(x_f32.shape[:-1] + (1,), scale, jnp.float32)


def _identity_mha(q, k, v, n_heads, mxu):
    return q.astype(jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    cli = ap.parse_args()

    cfg = DenoiserConfig(image_size=32, noise_embed_dims=256, patch_size=2,
                         embed_dim=768, dropout=0, n_layers=12,
                         text_emb_size=768)
    model = Denoiser(**cfg.__dict__, dtype=jnp.bfloat16)
    params = init_denoiser_params(model, cfg)
    rng = np.random.default_rng(0)
    from bench import denoiser_flops_per_call

    flops = denoiser_flops_per_call(cfg, B)

    orig_rowquant = fused_stack_int8._rowquant
    orig_mha_bf16 = fused_stack._mha
    orig_mha_int8 = fused_stack_int8._mha

    n_iter = 50
    labels = jnp.asarray(rng.standard_normal((32, 768)), jnp.float32)

    def run_case(name, quant, patch_quant=False, patch_mha=False):
        from transformer_latent_diffusion_tpu.models.fast_denoiser import (
            make_fused_apply,
        )
        from transformer_latent_diffusion_tpu.sampling import (
            DiffusionGenerator,
        )

        fused_stack_int8._rowquant = (_static_rowquant if patch_quant
                                      else orig_rowquant)
        fused_stack._mha = _identity_mha if patch_mha else orig_mha_bf16
        fused_stack_int8._mha = (_identity_mha if patch_mha
                                 else orig_mha_int8)
        try:
            eng = make_fused_apply(cfg, compute_dtype=jnp.bfloat16,
                                   quantize=quant)
            gen = DiffusionGenerator(model=model, params=params, vae=None,
                                     model_dtype=jnp.bfloat16,
                                     fast_apply=eng)

            def run(seed):
                _, lat = gen.generate(
                    labels=labels, n_iter=n_iter, num_imgs=32,
                    class_guidance=6, seed=seed, img_size=cfg.image_size,
                    sharp_f=0, bright_f=0, use_ddpm_plus=False)
                return float(jnp.sum(lat))

            t0 = time.time()
            run(0)
            print(f"{name}: compiled in {time.time() - t0:.0f}s", flush=True)
            reps = 3
            t0 = time.time()
            for i in range(reps):
                run(i + 1)
            dt = (time.time() - t0) / reps / n_iter  # per denoiser fwd
            print(f"{name:13s} {dt * 1e3:7.2f} ms/fwd  "
                  f"{flops / dt / 1e12:6.1f} TFLOPS(matmul-equiv)",
                  flush=True)
            return dt
        finally:
            fused_stack_int8._rowquant = orig_rowquant
            fused_stack._mha = orig_mha_bf16
            fused_stack_int8._mha = orig_mha_int8

    r = {}
    r["bf16"] = run_case("bf16", None)
    r["int8"] = run_case("int8", "int8")
    r["int8-staticq"] = run_case("int8-staticq", "int8", patch_quant=True)
    r["bf16-noattn"] = run_case("bf16-noattn", None, patch_mha=True)
    r["int8-noattn"] = run_case("int8-noattn", "int8", patch_mha=True)

    print(f"\nengine speedup int8/bf16:        {r['bf16'] / r['int8']:.3f}x")
    print(f"dynamic-quant overhead:          "
          f"{(r['int8'] - r['int8-staticq']) * 1e3:.2f} ms/fwd "
          f"({100 * (r['int8'] - r['int8-staticq']) / r['int8']:.0f}% of int8)")
    print(f"attention cost bf16:             "
          f"{(r['bf16'] - r['bf16-noattn']) * 1e3:.2f} ms/fwd "
          f"({100 * (r['bf16'] - r['bf16-noattn']) / r['bf16']:.0f}%)")
    print(f"attention cost int8:             "
          f"{(r['int8'] - r['int8-noattn']) * 1e3:.2f} ms/fwd "
          f"({100 * (r['int8'] - r['int8-noattn']) / r['int8']:.0f}%)")
    print(f"projection-only speedup (noattn): "
          f"{r['bf16-noattn'] / r['int8-noattn']:.3f}x")


if __name__ == "__main__":
    main()
