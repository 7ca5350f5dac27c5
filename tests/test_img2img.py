"""img2img + negative-prompt CFG (beyond reference; the reference CFG
always uses the zero vector for the uncond half — diffusion.py:122-125 —
and has no image-conditioned start)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_latent_diffusion_tpu.configs import (
    ClipConfig,
    DenoiserConfig,
    LTDConfig,
    VaeConfig,
)
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
from transformer_latent_diffusion_tpu.sampling.diffusion import (
    make_noise_levels,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

CFG = DenoiserConfig()  # tiny reference default: 16px latent, d=128


@pytest.fixture(scope="module")
def gen():
    model = Denoiser(**CFG.__dict__)
    params = init_denoiser_params(model, CFG)
    return DiffusionGenerator(model=model, params=params, vae=None)


def _labels(n=2, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (n, CFG.text_emb_size))


def test_negative_labels_zero_equals_default(gen):
    labels = _labels()
    _, base = gen.generate(labels=labels, n_iter=4, num_imgs=2, seed=3,
                           img_size=CFG.image_size, sharp_f=0, bright_f=0)
    _, neg = gen.generate(labels=labels, n_iter=4, num_imgs=2, seed=3,
                          img_size=CFG.image_size, sharp_f=0, bright_f=0,
                          negative_labels=np.zeros((2, CFG.text_emb_size)))
    assert jnp.array_equal(base, neg)


def test_negative_equal_to_cond_makes_guidance_inert(gen):
    # when uncond == cond, g*c + (1-g)*u == c for every g: the guidance
    # scale must not change the output at all
    labels = _labels()
    outs = [
        gen.generate(labels=labels, n_iter=4, num_imgs=2, seed=3,
                     img_size=CFG.image_size, sharp_f=0, bright_f=0,
                     class_guidance=g, negative_labels=labels)[1]
        for g in (2.0, 8.0)
    ]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               atol=1e-5)


def test_img2img_matches_manual_schedule_slice(gen):
    """generate(init_latents, strength) == the same scan started by hand
    from sigma0*noise + (1-sigma0)*init on the sliced schedule."""
    labels = _labels()
    init = jax.random.normal(jax.random.PRNGKey(7),
                             (2, CFG.n_channels, CFG.image_size,
                              CFG.image_size))
    n_iter, strength, seed = 6, 0.5, 11
    _, got = gen.generate(labels=labels, n_iter=n_iter, num_imgs=2,
                          seed=seed, img_size=CFG.image_size, sharp_f=0,
                          bright_f=0, init_latents=init, strength=strength)

    full = make_noise_levels(n_iter, 1.0)
    n_skip = int(round((1.0 - strength) * (len(full) - 1)))
    tail = full[n_skip:]
    noise = jax.random.normal(jax.random.PRNGKey(seed), init.shape,
                              dtype=jnp.float32)
    x_t = float(tail[0]) * noise + (1.0 - float(tail[0])) * init
    _, want = gen.generate(labels=labels, num_imgs=2, seed=seed,
                           img_size=CFG.image_size, sharp_f=0, bright_f=0,
                           seeds=x_t, noise_levels=tail, clamp_first=False)
    assert jnp.array_equal(got, want)
    assert n_skip > 0  # the slice actually shortened the schedule


def test_img2img_broadcasts_single_init_to_batch(gen):
    labels = _labels(3)
    init = jax.random.normal(jax.random.PRNGKey(9),
                             (1, CFG.n_channels, CFG.image_size,
                              CFG.image_size))
    _, out = gen.generate(labels=labels, n_iter=4, num_imgs=3, seed=1,
                          img_size=CFG.image_size, sharp_f=0, bright_f=0,
                          init_latents=init, strength=0.6)
    assert out.shape == (3, CFG.n_channels, CFG.image_size, CFG.image_size)
    # different noise draws -> genuinely different variations
    assert not jnp.array_equal(out[0], out[1])


def test_img2img_rejects_bad_strength(gen):
    with pytest.raises(ValueError, match="strength"):
        gen.generate(labels=_labels(), n_iter=4, num_imgs=2,
                     img_size=CFG.image_size,
                     init_latents=np.zeros(
                         (2, CFG.n_channels, CFG.image_size,
                          CFG.image_size)),
                     strength=0.0)


def test_inpaint_mask_ones_equals_img2img(gen):
    labels = _labels()
    init = jax.random.normal(jax.random.PRNGKey(7),
                             (2, CFG.n_channels, CFG.image_size,
                              CFG.image_size))
    kw = dict(labels=labels, n_iter=4, num_imgs=2, seed=3,
              img_size=CFG.image_size, sharp_f=0, bright_f=0,
              init_latents=init, strength=0.8)
    _, plain = gen.generate(**kw)
    _, masked = gen.generate(mask=np.ones((1, 1, CFG.image_size,
                                           CFG.image_size)), **kw)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(plain),
                               atol=1e-6)


def test_inpaint_keeps_unmasked_region_exactly(gen):
    labels = _labels()
    init = jax.random.normal(jax.random.PRNGKey(7),
                             (2, CFG.n_channels, CFG.image_size,
                              CFG.image_size))
    s = CFG.image_size
    mask = np.zeros((1, 1, s, s), np.float32)
    mask[..., : s // 2, :] = 1.0  # regenerate top half only
    _, out = gen.generate(labels=labels, n_iter=4, num_imgs=2, seed=3,
                          img_size=s, sharp_f=0, bright_f=0,
                          init_latents=init, mask=mask)
    out = np.asarray(out)
    np.testing.assert_array_equal(out[..., s // 2:, :],
                                  np.asarray(init)[..., s // 2:, :])
    assert not np.allclose(out[..., : s // 2, :],
                           np.asarray(init)[..., : s // 2, :])


def test_inpaint_keep_region_exact_under_sharp_bright(gen):
    """sharp_f/bright_f channel shifts apply only inside the mask — the
    keep region must stay bit-exact even with nonzero shifts."""
    labels = _labels()
    init = jax.random.normal(jax.random.PRNGKey(7),
                             (2, CFG.n_channels, CFG.image_size,
                              CFG.image_size))
    s = CFG.image_size
    mask = np.zeros((1, 1, s, s), np.float32)
    mask[..., : s // 2, :] = 1.0
    _, out = gen.generate(labels=labels, n_iter=4, num_imgs=2, seed=3,
                          img_size=s, sharp_f=0.2, bright_f=-0.1,
                          init_latents=init, mask=mask)
    out = np.asarray(out)
    np.testing.assert_array_equal(out[..., s // 2:, :],
                                  np.asarray(init)[..., s // 2:, :])


def test_inpaint_accepts_2d_mask_with_shifts(gen):
    """generate() documents mask as broadcastable to the latent shape:
    a plain (S,S) mask must behave exactly like its (1,1,S,S) reshape,
    including the masked sharp/bright shift path."""
    labels = _labels()
    init = jax.random.normal(jax.random.PRNGKey(7),
                             (2, CFG.n_channels, CFG.image_size,
                              CFG.image_size))
    s = CFG.image_size
    m2d = np.zeros((s, s), np.float32)
    m2d[: s // 2] = 1.0
    kw = dict(labels=labels, n_iter=4, num_imgs=2, seed=3, img_size=s,
              sharp_f=0.2, bright_f=-0.1, init_latents=init)
    _, got = gen.generate(mask=m2d, **kw)
    _, want = gen.generate(mask=m2d[None, None], **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got)[..., s // 2:, :],
                                  np.asarray(init)[..., s // 2:, :])


def test_inpaint_requires_init(gen):
    with pytest.raises(ValueError, match="mask requires init_latents"):
        gen.generate(labels=_labels(), n_iter=4, num_imgs=2,
                     img_size=CFG.image_size,
                     mask=np.ones((1, 1, CFG.image_size, CFG.image_size)))


def test_img2img_and_inpaint_compose_with_mesh(gen):
    """Mesh-sharded (batch-DP GSPMD) generation supports init_latents,
    strength, mask and negative_labels like the single-device path."""
    from transformer_latent_diffusion_tpu.parallel import create_mesh

    labels = _labels(8)
    init = jax.random.normal(jax.random.PRNGKey(7),
                             (8, CFG.n_channels, CFG.image_size,
                              CFG.image_size))
    s = CFG.image_size
    mask = np.zeros((1, 1, s, s), np.float32)
    mask[..., : s // 2, :] = 1.0
    neg = np.asarray(_labels(8, seed=5))
    kw = dict(labels=labels, n_iter=4, num_imgs=8, seed=3, img_size=s,
              sharp_f=0, bright_f=0, init_latents=init, strength=0.8,
              mask=mask, negative_labels=neg)
    _, want = gen.generate(**kw)

    from transformer_latent_diffusion_tpu.models import Denoiser

    sharded = DiffusionGenerator(
        model=Denoiser(**CFG.__dict__), params=gen.params, vae=None,
        mesh=create_mesh())
    _, got = sharded.generate(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pipeline_image_to_image_and_negative_prompt():
    cfg = LTDConfig(
        denoiser_cfg=CFG,
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
        clip_cfg=ClipConfig(width=64, heads=2, layers=2),
    )
    from transformer_latent_diffusion_tpu.sampling import (
        DiffusionTransformer,
    )

    pipe = DiffusionTransformer(cfg)
    px = CFG.image_size * 2  # tiny 2-block test VAE downsamples by 2
    src = np.random.default_rng(0).integers(
        0, 255, size=(px, px, 3), dtype=np.uint8)
    img = pipe.image_to_image(src, "a cute cat", strength=0.5, n_iter=4,
                              seed=5)
    assert img.size == (px + 8, px + 8)  # one tile + 4px grid padding
    again = pipe.image_to_image(src, "a cute cat", strength=0.5, n_iter=4,
                                seed=5)
    assert np.array_equal(np.asarray(img), np.asarray(again))

    neg = pipe.generate_image_from_text(
        "a cute cat", n_iter=4, seed=5, negative_prompt="blurry")
    base = pipe.generate_image_from_text("a cute cat", n_iter=4, seed=5)
    assert neg.size == base.size
    assert not np.array_equal(np.asarray(neg), np.asarray(base))

    wrong = np.zeros((px * 2, px * 2, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="resize"):
        pipe.image_to_image(wrong, "x", n_iter=4)

    # non-square must fail the same way (not an opaque broadcast error
    # deep in the sampler: only the width used to be checked)
    nonsquare = np.zeros((px * 2, px, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="resize"):
        pipe.image_to_image(nonsquare, "x", n_iter=4)

    # inpaint: image-space mask max-pools to the latent grid
    mask = np.zeros((px, px), dtype=np.uint8)
    mask[: px // 2] = 255
    out = pipe.inpaint(src, mask, "a cute cat", n_iter=4, seed=5)
    assert out.size == (px + 8, px + 8)
    again = pipe.inpaint(src, mask, "a cute cat", n_iter=4, seed=5)
    assert np.array_equal(np.asarray(out), np.asarray(again))

    # distinct prompts per image in one call
    multi = pipe.generate_image_from_text(
        ["a cute cat", "a red car", "a tree", "a boat"], n_iter=4, seed=5)
    assert multi.size == (2 * px + 12, 2 * px + 12)  # 2x2 grid
