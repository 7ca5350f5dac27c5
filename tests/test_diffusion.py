"""Generation-path tests — mirrors reference tests/test_diffuser.py
(test_diffusion_generator, test_full_generation_pipeline) on tiny configs
with random weights (hermetic: no hub downloads)."""

from dataclasses import asdict

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image

from transformer_latent_diffusion_tpu.configs import (
    ClipConfig,
    DenoiserConfig,
    LTDConfig,
    VaeConfig,
)
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.models.clip import FlaxClip
from transformer_latent_diffusion_tpu.models.vae import FlaxVae
from transformer_latent_diffusion_tpu.sampling import (
    DiffusionGenerator,
    DiffusionTransformer,
    make_noise_levels,
    make_step_coeffs,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

denoiser_cfg = DenoiserConfig(n_channels=4)

# tiny towers so the suite stays fast on CPU
tiny_vae = dict(block_out_channels=(8, 16), layers_per_block=1)
tiny_clip = dict(width=64, heads=2, layers=2, embed_dim=768)


def tiny_ltd_config() -> LTDConfig:
    from transformer_latent_diffusion_tpu.configs import ClipVisionConfig

    return LTDConfig(
        denoiser_cfg=denoiser_cfg,
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
        clip_cfg=ClipConfig(width=64, heads=2, layers=2, embed_dim=768),
        # tiny image tower so best-of-N paths stay CPU-fast (lazy — only
        # built when a test actually ranks candidates)
        clip_vision_cfg=ClipVisionConfig(image_size=32, patch_size=8,
                                         width=32, heads=2, layers=2),
        use_pallas=False,
    )


def test_noise_schedule_parity():
    lv = make_noise_levels(15, exponent=1.0)
    assert lv[0] == 0.99
    assert len(lv) == 15
    np.testing.assert_allclose(lv[1:], 1 - np.arange(1, 15) / 15, atol=1e-12)
    c1, c2 = make_step_coeffs(lv, use_ddpm_plus=False)
    assert (c1 == 1).all() and (c2 == 0).all()
    c1p, c2p = make_step_coeffs(lv, use_ddpm_plus=True)
    assert c1p[0] == 1 and c2p[0] == 0
    np.testing.assert_allclose(c1p[1:] + c2p[1:], 1.0, atol=1e-12)
    assert (c2p[1:] < 0).all()  # DPM++ extrapolates past x0_prev


def test_diffusion_generator():
    num_imgs = 2
    model = Denoiser(**asdict(denoiser_cfg))
    params = init_denoiser_params(model, denoiser_cfg)
    vae = FlaxVae.create(**tiny_vae, sample_size=denoiser_cfg.image_size * 8)

    labels = jax.random.uniform(
        jax.random.PRNGKey(0), (num_imgs, denoiser_cfg.text_emb_size))
    diffuser = DiffusionGenerator(model=model, params=params, vae=vae)

    out, latent = diffuser.generate(
        labels=labels,
        num_imgs=num_imgs,
        img_size=denoiser_cfg.image_size,
        class_guidance=3,
        seed=1,
        n_iter=5,
        exponent=1,
        scale_factor=8,
        sharp_f=0,
        bright_f=0,
    )
    assert latent.shape == (num_imgs, 4, denoiser_cfg.image_size, denoiser_cfg.image_size)
    # tiny VAE has 2 blocks -> x2 spatial upsample (real sdxl config: 4 blocks -> x8)
    assert out.shape == (num_imgs, 3, denoiser_cfg.image_size * 2, denoiser_cfg.image_size * 2)
    assert jnp.isfinite(out).all() and jnp.isfinite(latent).all()


def test_generation_is_seed_deterministic():
    model = Denoiser(**asdict(denoiser_cfg))
    params = init_denoiser_params(model, denoiser_cfg)
    diffuser = DiffusionGenerator(model=model, params=params, vae=None)
    labels = jnp.ones((1, denoiser_cfg.text_emb_size))
    kw = dict(labels=labels, num_imgs=1, img_size=denoiser_cfg.image_size,
              n_iter=4, sharp_f=0, bright_f=0)
    _, a = diffuser.generate(seed=7, **kw)
    _, b = diffuser.generate(seed=7, **kw)
    _, c = diffuser.generate(seed=8, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4


def test_sharp_bright_shifts():
    model = Denoiser(**asdict(denoiser_cfg))
    params = init_denoiser_params(model, denoiser_cfg)
    diffuser = DiffusionGenerator(model=model, params=params, vae=None)
    labels = jnp.ones((1, denoiser_cfg.text_emb_size))
    kw = dict(labels=labels, num_imgs=1, img_size=denoiser_cfg.image_size,
              n_iter=3, seed=0)
    _, base = diffuser.generate(sharp_f=0.0, bright_f=0.0, **kw)
    _, shifted = diffuser.generate(sharp_f=0.25, bright_f=0.5, **kw)
    diff = np.asarray(shifted) - np.asarray(base)
    np.testing.assert_allclose(diff[:, 3], 0.25, atol=1e-5)
    np.testing.assert_allclose(diff[:, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(diff[:, 1:3], 0.0, atol=1e-5)


def test_vae_roundtrip_shapes():
    vae = FlaxVae.create(**tiny_vae, sample_size=32)
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 32, 32)) * 2 - 1
    lat = vae.encode(img)
    # one downsample per extra block: (8,16) -> factor 2
    assert lat.shape == (2, 4, 16, 16)
    dec = vae.decode(lat)
    assert dec.shape == (2, 3, 32, 32)
    assert jnp.isfinite(dec).all()


def test_clip_encode_text():
    clip_model = FlaxClip.create(**tiny_clip)
    emb = clip_model.encode_text(["a cute cat", "a dog"])
    assert emb.shape == (2, 768)
    emb2 = clip_model.encode_text(["a cute cat", "a dog"])
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(emb2))
    # different prompts produce different embeddings
    assert np.abs(np.asarray(emb)[0] - np.asarray(emb)[1]).max() > 1e-4


def test_generate_best_of():
    """Best-of-N CLIP re-ranking: top_k images are the argsort of the
    per-candidate CLIP scores over the SAME candidate batch (seed-
    reproducible), shapes/ordering/validation pinned."""
    import pytest

    from transformer_latent_diffusion_tpu.configs import ClipVisionConfig

    cfg = tiny_ltd_config()
    cfg.clip_vision_cfg = ClipVisionConfig(
        image_size=32, patch_size=8, width=32, heads=2, layers=2,
        embed_dim=768)
    dt = DiffusionTransformer(cfg)
    kw = dict(seed=3, n_iter=4, class_guidance=4.0)
    candidates = dt.generate_array_from_text("a cat", num_imgs=4, **kw)
    best, scores = dt.generate_best_of("a cat", n_candidates=4, top_k=2,
                                       return_scores=True, **kw)
    assert best.shape == (2,) + candidates.shape[1:]
    assert best.dtype == np.uint8
    assert scores[0] >= scores[1]
    # returned images are actual candidates, in score order
    cand_list = [candidates[i].tobytes() for i in range(4)]
    assert best[0].tobytes() in cand_list
    assert best[1].tobytes() in cand_list
    # deterministic
    best2 = dt.generate_best_of("a cat", n_candidates=4, top_k=2, **kw)
    np.testing.assert_array_equal(best, best2)

    with pytest.raises(ValueError):
        dt.generate_best_of(["a", "b"], n_candidates=2)
    with pytest.raises(ValueError):
        dt.generate_best_of("a cat", n_candidates=2, top_k=3)


def test_full_generation_pipeline():
    """End-to-end text->image API. Parity: reference test_diffuser.py:88-93
    plus BASELINE config #1 ('a cute cat')."""
    dt = DiffusionTransformer(tiny_ltd_config())
    out = dt.generate_image_from_text(prompt="a cute cat")
    assert isinstance(out, PIL.Image.Image)
    # 1 image, 16px latent * 2 (tiny-VAE upsample) + 2*4 padding
    assert out.size == (denoiser_cfg.image_size * 2 + 8,) * 2


def test_generate_uint8_output_matches_float_path():
    """generate(output="uint8") must produce exactly the uint8 pixels
    the float path yields after the host-side to_pil quantization."""
    from transformer_latent_diffusion_tpu.models.vae import FlaxVae
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator

    cfg = denoiser_cfg
    model = Denoiser(**cfg.__dict__)
    params = init_denoiser_params(model, cfg)
    vae = FlaxVae.create(block_out_channels=(8, 16), layers_per_block=1)
    gen = DiffusionGenerator(model=model, params=params, vae=vae)
    labels = jnp.ones((2, cfg.text_emb_size))
    kw = dict(labels=labels, num_imgs=2, img_size=cfg.image_size,
              n_iter=4, seed=5, sharp_f=0, bright_f=0)

    f_img, f_lat = gen.generate(**kw)
    u_img, u_lat = gen.generate(**kw, output="uint8")

    np.testing.assert_array_equal(np.asarray(f_lat), np.asarray(u_lat))
    ref = np.clip((np.asarray(f_img, dtype=np.float32) + 1.0) * 0.5, 0, 1)
    ref = (ref * 255.0 + 0.5).astype(np.uint8)          # to_pil math, NCHW
    got = np.asarray(u_img).transpose(0, 3, 1, 2)        # NHWC -> NCHW
    np.testing.assert_array_equal(got, ref)


def test_interpolation_strip():
    """interpolate() (reference README's notebook-only 'Clip
    interpolation Examples' as a first-class API): slerp endpoints must
    reproduce the plain single-prompt generations, since every frame
    shares one seeded init noise and t=0/1 return the exact embeddings."""
    dt = DiffusionTransformer(tiny_ltd_config())
    n = 3
    strip = dt.interpolate("a cat", "a dog", n_frames=n, n_iter=4, seed=7)
    assert isinstance(strip, PIL.Image.Image)
    px = denoiser_cfg.image_size * 2  # tiny-VAE upsample factor 2
    assert strip.size == (n * px + (n + 1) * 4, px + 8)

    solo_a = dt.generate_image_from_text("a cat", seed=7, n_iter=4)
    solo_b = dt.generate_image_from_text("a dog", seed=7, n_iter=4)

    def frame(i):
        x = 4 + i * (px + 4)
        return np.asarray(strip.crop((x, 4, x + px, 4 + px)), dtype=np.int16)

    def inner(img):
        return np.asarray(img.crop((4, 4, 4 + px, 4 + px)), dtype=np.int16)

    # +-1 uint8: batched-vs-solo XLA scheduling changes floats slightly
    assert np.abs(frame(0) - inner(solo_a)).max() <= 1
    assert np.abs(frame(n - 1) - inner(solo_b)).max() <= 1
    # interior frames are new images, not a copy of either endpoint
    assert np.abs(frame(1) - frame(0)).max() > 1
    assert np.abs(frame(1) - frame(n - 1)).max() > 1


def test_interpolation_seed_axis():
    """Noise-space interpolation (the README's 'interpolate in the
    random normal latent space' property of the deterministic DDIM map):
    slerp endpoints must reproduce the two plain seeded generations."""
    import pytest

    dt = DiffusionTransformer(tiny_ltd_config())
    n = 3
    strip = dt.interpolate("a cat", seed=7, seed_b=9, n_frames=n, n_iter=4)
    px = denoiser_cfg.image_size * 2
    assert strip.size == (n * px + (n + 1) * 4, px + 8)

    solo_a = dt.generate_image_from_text("a cat", seed=7, n_iter=4)
    solo_b = dt.generate_image_from_text("a cat", seed=9, n_iter=4)

    def frame(i):
        x = 4 + i * (px + 4)
        return np.asarray(strip.crop((x, 4, x + px, 4 + px)), dtype=np.int16)

    def inner(img):
        return np.asarray(img.crop((4, 4, 4 + px, 4 + px)), dtype=np.int16)

    assert np.abs(frame(0) - inner(solo_a)).max() <= 1
    assert np.abs(frame(n - 1) - inner(solo_b)).max() <= 1

    with pytest.raises(ValueError, match="nothing to interpolate"):
        dt.interpolate("a cat", n_frames=3)
