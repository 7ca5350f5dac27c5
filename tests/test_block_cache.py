"""Delta-DiT-style block caching on the fused engine (opt-in lossy
inference acceleration, arXiv:2406.01125 pattern).

Interpret mode on CPU. Gates: refresh-every-step must be EXACT vs the
uncached engine; interval-2 must stay close on a tiny model and the
default path must be untouched.
"""

from dataclasses import asdict

import jax.numpy as jnp
import numpy as np

from transformer_latent_diffusion_tpu.configs import DenoiserConfig
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.models.fast_denoiser import make_fused_apply
from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
from transformer_latent_diffusion_tpu.utils import init_denoiser_params


def _setup():
    cfg = DenoiserConfig()  # tiny: d=128, 3 layers, 8x8 grid
    model = Denoiser(**asdict(cfg))
    params = init_denoiser_params(model, cfg)
    engine = make_fused_apply(cfg, compute_dtype=jnp.float32, interpret=True)
    return cfg, model, params, engine


def test_cached_refresh_matches_uncached():
    cfg, model, params, engine = _setup()
    rng = np.random.default_rng(0)
    b = 2
    x = jnp.asarray(rng.standard_normal((b, 4, cfg.image_size, cfg.image_size)),
                    dtype=jnp.float32)
    nl = jnp.full((b, 1), 0.5, dtype=jnp.float32)
    label = jnp.asarray(rng.standard_normal((b, cfg.text_emb_size)),
                        dtype=jnp.float32)

    prepared = engine.prepare(params)
    want = engine.apply_prepared(prepared, x, nl, label)

    s, e = engine.cache_span()
    assert 0 <= s < e <= len(prepared["groups"])

    n_tok = (cfg.image_size // cfg.patch_size) ** 2
    delta0 = jnp.zeros((b, n_tok, cfg.embed_dim), jnp.float32)
    got, delta = engine.apply_prepared_cached(
        prepared, x, nl, label, delta0, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    assert np.abs(np.asarray(delta)).max() > 0  # real span contribution

    # skip step with the captured delta == full recompute at the SAME
    # inputs (the cached span contribution is exactly delta)
    got2, delta2 = engine.apply_prepared_cached(
        prepared, x, nl, label, delta, jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(delta2), np.asarray(delta))


def test_generate_with_cache_interval():
    cfg, model, params, engine = _setup()
    gen = DiffusionGenerator(model=model, params=params, vae=None,
                             fast_apply=engine)
    labels = jnp.ones((2, cfg.text_emb_size))
    kw = dict(labels=labels, num_imgs=2, img_size=cfg.image_size,
              n_iter=6, seed=3, sharp_f=0, bright_f=0, use_ddpm_plus=False)

    _, exact = gen.generate(**kw)
    _, cached1 = gen.generate(**kw, cache_interval=1)
    # interval 1 == the exact path bit-for-bit (same math, same scan)
    np.testing.assert_allclose(np.asarray(cached1), np.asarray(exact),
                               atol=1e-6, rtol=1e-6)

    _, cached2 = gen.generate(**kw, cache_interval=2)
    a = np.asarray(exact).ravel()
    b = np.asarray(cached2).ravel()
    assert np.isfinite(b).all()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.95, cos  # lossy but must stay close on a tiny model
