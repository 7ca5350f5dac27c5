"""Fused Pallas kernel numerics vs the linen (XLA) path.

Runs the kernels in interpreter mode on CPU; the same code compiles via
Mosaic on TPU (exercised by bench.py and the TPU driver)."""

from dataclasses import asdict

import jax
import jax.numpy as jnp
import numpy as np

from transformer_latent_diffusion_tpu.configs import DenoiserConfig
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.models.fast_denoiser import make_fused_apply
from transformer_latent_diffusion_tpu.utils import init_denoiser_params


def test_fused_apply_matches_linen():
    cfg = DenoiserConfig()  # tiny: d=128, 3 layers, 8x8 grid
    model = Denoiser(**asdict(cfg))
    params = init_denoiser_params(model, cfg)

    rng = np.random.default_rng(0)
    b = 4
    x = jnp.asarray(rng.standard_normal((b, 4, cfg.image_size, cfg.image_size)),
                    dtype=jnp.float32)
    nl = jnp.asarray(rng.uniform(0.01, 0.99, (b, 1)), dtype=jnp.float32)
    label = jnp.asarray(rng.standard_normal((b, cfg.text_emb_size)),
                        dtype=jnp.float32)

    want = jax.jit(lambda p, *a: model.apply({"params": p}, *a))(params, x, nl, label)

    fused = make_fused_apply(cfg, compute_dtype=jnp.float32, interpret=True)
    got = fused(params, x, nl, label)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-3)


def test_fused_apply_bf16_matches_linen_bf16():
    """The bf16 fused engine must track the bf16 linen path at ulp level
    (bf16-vs-f32 divergence itself is a property of the dtype, not the
    kernels, and is large on an untrained random-scale model)."""
    cfg = DenoiserConfig()
    model32 = Denoiser(**asdict(cfg))
    params = init_denoiser_params(model32, cfg)
    model16 = Denoiser(**asdict(cfg), dtype=jnp.bfloat16)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, cfg.image_size, cfg.image_size)),
                    dtype=jnp.float32)
    nl = jnp.full((2, 1), 0.5, dtype=jnp.float32)
    label = jnp.asarray(rng.standard_normal((2, cfg.text_emb_size)),
                        dtype=jnp.float32)

    want = np.asarray(
        jax.jit(lambda p, *a: model16.apply({"params": p}, *a))(params, x, nl, label))
    fused = make_fused_apply(cfg, compute_dtype=jnp.bfloat16, interpret=True)
    got = np.asarray(fused(params, x, nl, label))
    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) < 0.02 * scale + 1e-3
