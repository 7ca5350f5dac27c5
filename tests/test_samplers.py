"""Sampler-family tests (beyond reference — the reference ships DDIM +
DPM++(2M) only, diffusion.py:54-85): Heun second-order sampler and the
alternative noise-level spacings (cosine / karras)."""

from dataclasses import asdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_latent_diffusion_tpu.configs import DenoiserConfig
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.sampling import (
    DiffusionGenerator,
    make_noise_levels,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

SMALL = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                       noise_embed_dims=64)


def _small_gen():
    model = Denoiser(**asdict(SMALL))
    params = init_denoiser_params(model, SMALL)
    return DiffusionGenerator(model=model, params=params, vae=None)


def test_noise_schedule_kinds():
    for kind in ("poly", "cosine", "karras"):
        lv = make_noise_levels(16, kind=kind)
        assert lv.shape == (16,)
        assert lv[0] == 0.99
        assert (np.diff(lv) < 0).all(), kind  # strictly decreasing
        assert lv[-1] > 0
    # karras spans the same endpoints as the reference poly exponent=1
    # schedule (0.99 top after clamp, 1/n bottom)
    k = make_noise_levels(16, kind="karras")
    p = make_noise_levels(16, kind="poly", exponent=1.0)
    np.testing.assert_allclose(k[-1], p[-1], rtol=1e-12)
    # in interpolation-coefficient space karras concentrates steps at
    # HIGH noise relative to the uniform reference spacing
    assert np.median(k) > np.median(p)
    c = make_noise_levels(16, kind="cosine")
    assert np.median(c) > np.median(p)
    with pytest.raises(ValueError):
        make_noise_levels(16, kind="quadratic")
    # n_iter=1 (one-step consistency regime) is reachable for every
    # kind; karras used to divide by zero there (ADVICE r3)
    for kind in ("poly", "cosine", "karras"):
        lv = make_noise_levels(1, kind=kind)
        assert lv.shape == (1,) and lv[0] == 0.99, kind


class _ConstX0Model:
    """Oracle that always predicts the same clean latent: the sampling
    ODE dx/ds = (x - x0)/s is then linear with exact solution on every
    straight-line segment, so Euler (= the DDIM update) is exact and
    Heun must agree with it to float precision."""

    n_channels = 4
    objective = "x0"
    use_pallas = False
    image_size = 8

    def apply(self, variables, x, noises, labels, pos_embed_override=None):
        x0 = variables["params"]["x0"]
        return jnp.broadcast_to(x0[None], x.shape)


def test_heun_exact_on_constant_oracle():
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8))
    gen = DiffusionGenerator(model=_ConstX0Model(), params={"x0": x0},
                             vae=None)
    labels = jnp.ones((2, 768))
    kw = dict(labels=labels, num_imgs=2, img_size=8, n_iter=6, seed=3,
              sharp_f=0, bright_f=0, class_guidance=3)
    _, ddim = gen.generate(sampler="ddim", **kw)
    _, heun = gen.generate(sampler="heun", **kw)
    np.testing.assert_allclose(np.asarray(heun), np.asarray(ddim),
                               rtol=1e-5, atol=1e-5)


class _AffineX0Model(_ConstX0Model):
    """x0_hat = 0.5 x + b: the sampling ODE dx/ds = (0.5 x - b)/s is
    smooth and state-dependent (Euler is NOT exact), with a well-defined
    flow — the cleanest testbed for convergence order (a random-weight
    denoiser's ODE is chaotic and defeats order measurements)."""

    def apply(self, variables, x, noises, labels, pos_embed_override=None):
        b = variables["params"]["x0"]
        return 0.5 * x + jnp.broadcast_to(b[None], x.shape)


def test_heun_second_order_convergence():
    """Heun at the same grid must land much closer to a fine-grid
    reference solution than the first-order DDIM update — the defining
    property of a second-order sampler. Also checked at matched NFE
    (heun k steps = 2k denoiser calls ~ ddim 2k steps)."""
    b = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8))
    gen = DiffusionGenerator(model=_AffineX0Model(), params={"x0": b},
                             vae=None)
    labels = jnp.ones((2, 768))
    kw = dict(labels=labels, num_imgs=2, img_size=8, seed=5, sharp_f=0,
              bright_f=0, class_guidance=3)
    # fixed-ENDPOINT grids: n_iter-derived schedules end at 1/n, so a
    # finer grid would also solve FURTHER — pass explicit levels so only
    # the interior resolution varies and solver order is what's
    # measured. The bottom stays at 0.3: this ODE's solution is
    # 2b + C*sqrt(s), whose curvature blows up near s=0 and pushes both
    # solvers out of the asymptotic regime at 9 steps.
    def levels(n):
        return np.linspace(0.99, 0.3, n)

    _, ref = gen.generate(sampler="ddim", noise_levels=levels(513), **kw)
    ref = np.asarray(ref)

    def err(sampler, n_iter):
        _, lat = gen.generate(sampler=sampler,
                              noise_levels=levels(n_iter), **kw)
        return float(np.sqrt(np.mean((np.asarray(lat) - ref) ** 2)))

    e_ddim = err("ddim", 9)
    e_heun = err("heun", 9)  # same grid, 2x the denoiser calls
    assert e_heun < 0.2 * e_ddim, (e_heun, e_ddim)
    # matched NFE: 5 heun steps = 10 calls vs 9 ddim steps = 9 calls
    assert err("heun", 5) < e_ddim
    # halving h quarters heun's error (order 2) but only halves ddim's
    assert err("heun", 17) < 0.35 * e_heun
    assert 0.3 * e_ddim < err("ddim", 17) < 0.7 * e_ddim


def test_sampler_kwarg_backcompat():
    gen = _small_gen()
    labels = jnp.ones((1, 768))
    kw = dict(labels=labels, num_imgs=1, img_size=8, n_iter=4, seed=7,
              sharp_f=0, bright_f=0)
    _, a = gen.generate(use_ddpm_plus=False, **kw)
    _, b = gen.generate(sampler="ddim", **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, c = gen.generate(use_ddpm_plus=True, **kw)
    _, d = gen.generate(sampler="dpm", **kw)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))
    # a non-None sampler overrides use_ddpm_plus
    _, e = gen.generate(sampler="ddim", use_ddpm_plus=True, **kw)
    np.testing.assert_array_equal(np.asarray(e), np.asarray(a))


def test_schedule_reachable_from_generate():
    gen = _small_gen()
    labels = jnp.ones((1, 768))
    kw = dict(labels=labels, num_imgs=1, img_size=8, n_iter=4, seed=7,
              sharp_f=0, bright_f=0)
    _, poly = gen.generate(schedule="poly", **kw)
    _, karras = gen.generate(schedule="karras", **kw)
    _, cosine = gen.generate(schedule="cosine", **kw)
    for lat in (poly, karras, cosine):
        assert np.isfinite(np.asarray(lat)).all()
    assert np.abs(np.asarray(poly) - np.asarray(karras)).max() > 1e-5
    assert np.abs(np.asarray(poly) - np.asarray(cosine)).max() > 1e-5


def test_pipeline_sampler_plumbing():
    """sampler/schedule reach the scan through the public
    DiffusionTransformer API and actually change the output."""
    from tests.test_diffusion import tiny_ltd_config
    from transformer_latent_diffusion_tpu.sampling import (
        DiffusionTransformer,
    )

    dt = DiffusionTransformer(tiny_ltd_config())
    kw = dict(num_imgs=1, seed=3, n_iter=4, class_guidance=3)
    base = dt.generate_array_from_text("a cat", **kw)
    heun = dt.generate_array_from_text("a cat", sampler="heun", **kw)
    karras = dt.generate_array_from_text("a cat", schedule="karras", **kw)
    assert base.shape == heun.shape == karras.shape
    assert (base != heun).any()
    assert (base != karras).any()
    img = dt.generate_image_from_text("a cat", sampler="heun",
                                      schedule="cosine", **kw)
    assert img.size[0] > 0


def test_sampler_validation_errors():
    gen = _small_gen()
    labels = jnp.ones((1, 768))
    kw = dict(labels=labels, num_imgs=1, img_size=8, n_iter=4)
    with pytest.raises(ValueError, match="unknown sampler"):
        gen.generate(sampler="euler_a", **kw)
    with pytest.raises(ValueError, match="unknown noise schedule"):
        gen.generate(schedule="sigmoid", **kw)
    init = jnp.zeros((1, 4, 8, 8))
    with pytest.raises(ValueError, match="inpainting"):
        gen.generate(sampler="heun", init_latents=init,
                     mask=jnp.ones((1, 4, 8, 8)), **kw)
    with pytest.raises(ValueError, match="fresh_noise"):
        gen.generate(sampler="heun", fresh_noise=True, **kw)
    with pytest.raises(ValueError, match="block caching"):
        gen.generate(sampler="heun", cache_interval=2, **kw)


def test_eta_endpoints_match_ddim_and_fresh_noise():
    """eta-stochastic DDIM interpolates exactly between the two existing
    samplers: eta=0 is the deterministic DDIM update, eta=1 is the
    fresh-noise ancestral path (same per-image noise streams), so both
    endpoints must be bit-equal to the code they claim to be."""
    gen = _small_gen()
    labels = jnp.ones((2, 768))
    kw = dict(labels=labels, num_imgs=2, img_size=8, n_iter=5, seed=9,
              sharp_f=0, bright_f=0, class_guidance=3)
    _, ddim = gen.generate(sampler="ddim", **kw)
    _, eta0 = gen.generate(sampler="ddim", eta=0.0, **kw)
    np.testing.assert_array_equal(np.asarray(eta0), np.asarray(ddim))
    _, fresh = gen.generate(fresh_noise=True, use_ddpm_plus=False, **kw)
    _, eta1 = gen.generate(sampler="ddim", eta=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(eta1), np.asarray(fresh))


def test_eta_mid_deterministic_and_distinct():
    gen = _small_gen()
    labels = jnp.ones((1, 768))
    kw = dict(labels=labels, num_imgs=1, img_size=8, n_iter=5, seed=9,
              sharp_f=0, bright_f=0, class_guidance=3)
    _, a = gen.generate(sampler="ddim", eta=0.5, **kw)
    _, b = gen.generate(sampler="ddim", eta=0.5, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()
    _, d0 = gen.generate(sampler="ddim", **kw)
    _, d1 = gen.generate(sampler="ddim", eta=1.0, **kw)
    assert np.abs(np.asarray(a) - np.asarray(d0)).max() > 1e-5
    assert np.abs(np.asarray(a) - np.asarray(d1)).max() > 1e-5
    # a different seed moves the fresh-noise stream, not just the init
    _, c = gen.generate(sampler="ddim", eta=0.5, **{**kw, "seed": 10})
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-5


def test_eta_validation_errors():
    gen = _small_gen()
    labels = jnp.ones((1, 768))
    kw = dict(labels=labels, num_imgs=1, img_size=8, n_iter=4)
    with pytest.raises(ValueError, match="eta must be in"):
        gen.generate(sampler="ddim", eta=1.5, **kw)
    with pytest.raises(ValueError, match="stochastic DDIM"):
        gen.generate(eta=0.5, **kw)  # default sampler is DPM++
    with pytest.raises(ValueError, match="stochastic DDIM"):
        gen.generate(sampler="heun", eta=0.5, **kw)
    with pytest.raises(ValueError, match="fresh_noise IS eta=1"):
        gen.generate(sampler="ddim", eta=0.5, fresh_noise=True, **kw)
    init = jnp.zeros((1, 4, 8, 8))
    with pytest.raises(ValueError, match="inpainting"):
        gen.generate(sampler="ddim", eta=0.5, init_latents=init,
                     mask=jnp.ones((1, 4, 8, 8)), **kw)


def test_pipeline_eta_plumbing():
    from tests.test_diffusion import tiny_ltd_config
    from transformer_latent_diffusion_tpu.sampling import (
        DiffusionTransformer,
    )

    dt = DiffusionTransformer(tiny_ltd_config())
    kw = dict(num_imgs=1, seed=3, n_iter=4, class_guidance=3)
    base = dt.generate_array_from_text("a cat", sampler="ddim", **kw)
    stoch = dt.generate_array_from_text("a cat", sampler="ddim", eta=0.75,
                                        **kw)
    assert base.shape == stoch.shape
    assert (base != stoch).any()


def test_nonnative_sampling_matches_resized_params():
    """Sampling a non-native img_size resizes the pos table inside the
    sampler (DiffusionGenerator.pos_resize default) and must equal a
    natively-sized model running upsample_denoiser_params weights — the
    identical bilinear map multi-resolution TRAINING applies, so a
    multires model samples its trained sizes consistently.
    pos_resize=False keeps the legacy reference slice semantics."""
    from dataclasses import asdict, replace

    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.train.highres import (
        upsample_denoiser_params,
    )
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg16 = DenoiserConfig(image_size=16, embed_dim=64, n_layers=2,
                           noise_embed_dims=64)
    model16 = Denoiser(**asdict(cfg16))
    params = init_denoiser_params(model16, cfg16)
    gen16 = DiffusionGenerator(model=model16, params=params, vae=None)
    labels = jnp.ones((2, 768))
    kw = dict(labels=labels, num_imgs=2, n_iter=4, seed=7, sharp_f=0,
              bright_f=0)

    _, lat_a = gen16.generate(img_size=8, **kw)
    assert lat_a.shape == (2, 4, 8, 8)

    cfg8 = replace(cfg16, image_size=8)
    params8 = upsample_denoiser_params(params, 16, 8,
                                       patch_size=cfg16.patch_size)
    gen8 = DiffusionGenerator(model=Denoiser(**asdict(cfg8)),
                              params=params8, vae=None)
    _, lat_b = gen8.generate(img_size=8, **kw)
    np.testing.assert_allclose(np.asarray(lat_a), np.asarray(lat_b),
                               rtol=2e-5, atol=2e-5)

    # LARGER than native also works without params surgery now
    _, lat_up = gen16.generate(img_size=32, **kw)
    assert lat_up.shape == (2, 4, 32, 32)
    assert np.isfinite(np.asarray(lat_up)).all()

    # legacy slice semantics stay reachable and differ from the resize
    gen_slice = DiffusionGenerator(model=model16, params=params, vae=None,
                                   pos_resize=False)
    _, lat_c = gen_slice.generate(img_size=8, **kw)
    assert np.abs(np.asarray(lat_c) - np.asarray(lat_a)).max() > 1e-5
