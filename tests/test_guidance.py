"""Guidance quality knobs: cfg_rescale (Lin et al. 2023) and
guidance_interval (Kynkäänniemi et al. 2024) — beyond-reference
additions to the CFG combine (reference diffusion.py:122-125 is the
plain lerp, which stays the bit-exact default).
"""

from dataclasses import asdict

import jax.numpy as jnp
import numpy as np
import pytest

from transformer_latent_diffusion_tpu.configs import DenoiserConfig
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.sampling import (
    DiffusionGenerator,
    cfg_combine,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

TINY = DenoiserConfig(image_size=16, embed_dim=64, n_layers=2,
                      noise_embed_dims=64)


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       dtype=jnp.float32)


def test_cfg_combine_unit():
    cond, uncond = _rand((4, 4, 8, 8), 0), _rand((4, 4, 8, 8), 1)

    # default = reference lerp, scalar and per-image-vector guidance
    base = cfg_combine(cond, uncond, 3.0)
    np.testing.assert_allclose(base, 3.0 * cond - 2.0 * uncond, rtol=1e-6)
    gvec = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    pervec = cfg_combine(cond, uncond, gvec)
    np.testing.assert_allclose(
        np.asarray(pervec)[2], np.asarray(3.0 * cond - 2.0 * uncond)[2],
        rtol=1e-6)

    # rescale=1 -> per-sample std of the output equals the cond half's
    full = cfg_combine(cond, uncond, 7.0, cfg_rescale=1.0)
    std_c = np.std(np.asarray(cond).reshape(4, -1), axis=1)
    std_o = np.std(np.asarray(full).reshape(4, -1), axis=1)
    np.testing.assert_allclose(std_o, std_c, rtol=1e-3)
    # rescale=0 is exactly the base combine
    np.testing.assert_array_equal(
        np.asarray(cfg_combine(cond, uncond, 7.0, cfg_rescale=0.0)),
        np.asarray(cfg_combine(cond, uncond, 7.0)))
    # rescale=0.5 is the midpoint blend
    half = cfg_combine(cond, uncond, 7.0, cfg_rescale=0.5)
    b7 = cfg_combine(cond, uncond, 7.0)
    np.testing.assert_allclose(np.asarray(half),
                               0.5 * np.asarray(full) + 0.5 * np.asarray(b7),
                               rtol=1e-5)

    # interval gating: inside -> combined, outside -> cond unchanged
    inside = cfg_combine(cond, uncond, 3.0, sigma=jnp.float32(0.5),
                         guidance_interval=(0.2, 0.8))
    np.testing.assert_array_equal(np.asarray(inside), np.asarray(base))
    outside = cfg_combine(cond, uncond, 3.0, sigma=jnp.float32(0.9),
                          guidance_interval=(0.2, 0.8))
    np.testing.assert_array_equal(np.asarray(outside), np.asarray(cond))
    # boundary is inclusive
    edge = cfg_combine(cond, uncond, 3.0, sigma=jnp.float32(0.8),
                       guidance_interval=(0.2, 0.8))
    np.testing.assert_array_equal(np.asarray(edge), np.asarray(base))


@pytest.fixture(scope="module")
def gen():
    model = Denoiser(**asdict(TINY))
    params = init_denoiser_params(model, TINY)
    return DiffusionGenerator(model=model, params=params, vae=None)


def test_sampler_neutral_knobs_exact(gen):
    """cfg_rescale=0 + guidance_interval=None go through the identical
    compiled scan (same cache entry) — latents are bit-equal."""
    labels = _rand((2, 768), 2)
    _, a = gen.generate(labels, n_iter=6, num_imgs=2, seed=3,
                        img_size=TINY.image_size, class_guidance=3.0)
    _, b = gen.generate(labels, n_iter=6, num_imgs=2, seed=3,
                        img_size=TINY.image_size, class_guidance=3.0,
                        cfg_rescale=0.0, guidance_interval=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampler_interval_never_active_equals_g1(gen):
    """A guidance interval that never matches the schedule == sampling
    with class_guidance=1 (pure cond)."""
    labels = _rand((2, 768), 4)
    _, g1 = gen.generate(labels, n_iter=6, num_imgs=2, seed=5,
                         img_size=TINY.image_size, class_guidance=1.0)
    _, gated = gen.generate(labels, n_iter=6, num_imgs=2, seed=5,
                            img_size=TINY.image_size, class_guidance=5.0,
                            guidance_interval=(0.0, 0.0))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(gated), atol=1e-5)


def test_sampler_knobs_change_output_and_validate(gen):
    labels = _rand((2, 768), 6)
    kw = dict(n_iter=6, num_imgs=2, seed=7, img_size=TINY.image_size,
              class_guidance=6.0)
    _, base = gen.generate(labels, **kw)
    _, resc = gen.generate(labels, cfg_rescale=0.7, **kw)
    _, gated = gen.generate(labels, guidance_interval=(0.3, 0.9), **kw)
    assert not np.allclose(np.asarray(base), np.asarray(resc))
    assert not np.allclose(np.asarray(base), np.asarray(gated))
    assert np.isfinite(np.asarray(resc)).all()
    assert np.isfinite(np.asarray(gated)).all()

    with pytest.raises(ValueError):
        gen.generate(labels, cfg_rescale=1.5, **kw)
    with pytest.raises(ValueError):
        gen.generate(labels, guidance_interval=(0.8, 0.2), **kw)


def test_pipeline_passthrough():
    """generate_image_from_text forwards the knobs (tiny random towers)."""
    from transformer_latent_diffusion_tpu.configs import (
        ClipConfig,
        LTDConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.sampling import DiffusionTransformer

    cfg = LTDConfig(vae_cfg=VaeConfig(block_out_channels=(8, 16),
                                      layers_per_block=1),
                    clip_cfg=ClipConfig(width=64, heads=2, layers=2),
                    denoiser_cfg=TINY)
    dt = DiffusionTransformer(cfg)
    base = dt.generate_array_from_text("a cat", num_imgs=2, seed=7, n_iter=4,
                                       class_guidance=6.0)
    knob = dt.generate_array_from_text("a cat", num_imgs=2, seed=7, n_iter=4,
                                       class_guidance=6.0, cfg_rescale=0.8,
                                       guidance_interval=(0.1, 0.95))
    assert base.shape == knob.shape
    assert not np.array_equal(base, knob)
