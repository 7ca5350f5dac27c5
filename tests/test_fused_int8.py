"""Opt-in W8A8 int8 fused engine vs the exact-parity paths.

Interpret mode on CPU; the same kernel compiles via Mosaic on TPU.
Int8 is lossy by design, so the gate is loose elementwise tolerance plus
high cosine similarity against the f32 linen output — enough to catch
wiring/scale bugs while allowing quantization error.
"""

from dataclasses import asdict

import jax
import jax.numpy as jnp
import numpy as np

from transformer_latent_diffusion_tpu.configs import DenoiserConfig
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.models.fast_denoiser import make_fused_apply
from transformer_latent_diffusion_tpu.utils import init_denoiser_params


def _cosine(a, b):
    a = a.ravel().astype(np.float64)
    b = b.ravel().astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_int8_engine_tracks_linen():
    cfg = DenoiserConfig()  # tiny: d=128, 3 layers, 8x8 grid
    model = Denoiser(**asdict(cfg))
    params = init_denoiser_params(model, cfg)

    rng = np.random.default_rng(7)
    b = 4
    x = jnp.asarray(rng.standard_normal((b, 4, cfg.image_size, cfg.image_size)),
                    dtype=jnp.float32)
    nl = jnp.asarray(rng.uniform(0.01, 0.99, (b, 1)), dtype=jnp.float32)
    label = jnp.asarray(rng.standard_normal((b, cfg.text_emb_size)),
                        dtype=jnp.float32)

    want = np.asarray(
        jax.jit(lambda p, *a: model.apply({"params": p}, *a))(params, x, nl, label))

    engine = make_fused_apply(cfg, compute_dtype=jnp.float32, interpret=True,
                              quantize="int8")
    got = np.asarray(engine(params, x, nl, label))

    assert got.shape == want.shape
    assert np.isfinite(got).all()
    # quantization-lossy path: direction must match, magnitude loosely
    assert _cosine(got, want) > 0.995, _cosine(got, want)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.15 * scale


def test_int8_prepare_is_reusable():
    """prepare() output feeds apply_prepared repeatedly (sampling loop
    contract) and the packed int8 weights have the expected dtypes."""
    cfg = DenoiserConfig()
    model = Denoiser(**asdict(cfg))
    params = init_denoiser_params(model, cfg)
    engine = make_fused_apply(cfg, compute_dtype=jnp.float32, interpret=True,
                              quantize="int8")
    prepared = engine.prepare(params)
    for g in prepared["groups"]:
        for name in ("wqkv", "wq", "w1", "w2"):
            assert g[name].dtype == jnp.int8
        for name in ("sqkv", "sq", "s1", "s2"):
            assert g[name].dtype == jnp.float32

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, cfg.image_size, cfg.image_size)),
                    dtype=jnp.float32)
    nl = jnp.full((2, 1), 0.5, dtype=jnp.float32)
    label = jnp.asarray(rng.standard_normal((2, cfg.text_emb_size)),
                        dtype=jnp.float32)
    y1 = engine.apply_prepared(prepared, x, nl, label)
    y2 = engine.apply_prepared(prepared, x, nl, label)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
