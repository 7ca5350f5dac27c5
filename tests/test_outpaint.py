"""Outpainting model support (beyond the repo'd reference code: the
reference README's "Outpainting model" section describes an 8-input-
channel fine-tune of the 101M model with the new patchify parameters
zero-initialised, applied repeatedly to extend a scene — the code lives
in the author's notebooks; here it is first-class).

Covers: zero-init channel-widening surgery (exact-equality contract),
the sampler's context_latents path, and the outpaint canvas API.
"""

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
from transformer_latent_diffusion_tpu.models import (
    Denoiser,
    expand_input_channels,
)
from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

CFG = DenoiserConfig()  # tiny: 16px latent, 4 channels, d=128
WIDE = DenoiserConfig(input_channels=2 * CFG.n_channels)


def _inputs(batch=2, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (batch, CFG.n_channels, CFG.image_size,
                               CFG.image_size))
    noise = jax.random.uniform(k2, (batch, 1), minval=0.01, maxval=0.99)
    label = jax.random.normal(k3, (batch, CFG.text_emb_size))
    return x, noise, label


def test_expand_input_channels_zero_init_is_exact():
    """The widened model must produce bit-equal output to the original
    for ANY context content (the new patch rows are zeros) — the
    reference's zero-init conv-widening trick, README 'Outpainting'."""
    base = Denoiser(**CFG.__dict__)
    params = init_denoiser_params(base, CFG)
    x, noise, label = _inputs()
    want = base.apply({"params": params}, x, noise, label)

    wide_params = expand_input_channels(
        params, CFG.n_channels, WIDE.input_channels, CFG.patch_size)
    wide = Denoiser(**WIDE.__dict__)
    ctx = jax.random.normal(jax.random.PRNGKey(9), x.shape) * 3.0
    got = wide.apply({"params": wide_params},
                     jnp.concatenate([x, ctx], axis=1), noise, label)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # original tree untouched (surgery returns a copy)
    assert params["denoiser_trans_block"]["patch_proj"]["kernel"].shape[0] \
        == CFG.n_channels * CFG.patch_size**2


def test_expand_input_channels_validates():
    base = Denoiser(**CFG.__dict__)
    params = init_denoiser_params(base, CFG)
    with pytest.raises(ValueError, match="shrink"):
        expand_input_channels(params, CFG.n_channels, 2, CFG.patch_size)
    with pytest.raises(ValueError, match="input rows"):
        expand_input_channels(params, 8, 16, CFG.patch_size)


@pytest.fixture(scope="module")
def wide_gen():
    model = Denoiser(**WIDE.__dict__)
    params = init_denoiser_params(model, WIDE)
    return DiffusionGenerator(model=model, params=params, vae=None)


def _labels(n=1, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (n, CFG.text_emb_size))


def test_generate_context_default_is_zeros(wide_gen):
    """A widened model sampled without context must equal explicit
    zero context (the 'fully unknown' conditioning)."""
    kw = dict(labels=_labels(), n_iter=4, num_imgs=1, seed=3,
              img_size=CFG.image_size, sharp_f=0, bright_f=0)
    _, base = wide_gen.generate(**kw)
    _, zeros = wide_gen.generate(
        context_latents=np.zeros((1, CFG.n_channels, CFG.image_size,
                                  CFG.image_size)), **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(zeros))
    assert base.shape == (1, CFG.n_channels, CFG.image_size, CFG.image_size)


def test_generate_context_reaches_the_model(wide_gen):
    """With non-zero patch rows (random-init widened model), different
    context must change the output — proving the channels are wired
    through every scan step."""
    kw = dict(labels=_labels(), n_iter=4, num_imgs=1, seed=3,
              img_size=CFG.image_size, sharp_f=0, bright_f=0)
    ctx = np.asarray(jax.random.normal(
        jax.random.PRNGKey(7),
        (1, CFG.n_channels, CFG.image_size, CFG.image_size)))
    _, a = wide_gen.generate(context_latents=ctx, **kw)
    _, b = wide_gen.generate(**kw)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_context_on_plain_model_raises():
    model = Denoiser(**CFG.__dict__)
    params = init_denoiser_params(model, CFG)
    gen = DiffusionGenerator(model=model, params=params, vae=None)
    with pytest.raises(ValueError, match="widened-input"):
        gen.generate(labels=_labels(), n_iter=4, num_imgs=1,
                     img_size=CFG.image_size, sharp_f=0, bright_f=0,
                     context_latents=np.zeros(
                         (1, 4, CFG.image_size, CFG.image_size)))


def test_outpaint_api(tmp_path):
    """outpaint(): panorama grows by (1-overlap) tiles per step; plain
    models are rejected with the fine-tune recipe in the message."""
    from transformer_latent_diffusion_tpu.sampling import (
        DiffusionTransformer,
    )

    wide_cfg = LTDConfig(
        denoiser_cfg=WIDE,
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
        clip_cfg=ClipConfig(width=64, heads=2, layers=2),
        use_pallas=False,
    )
    dt = DiffusionTransformer(wide_cfg)
    px = CFG.image_size * 2  # tiny-VAE factor 2
    src = np.random.default_rng(0).integers(
        0, 255, size=(px, px, 3), dtype=np.uint8)

    pan = dt.outpaint(src, "a field", n_tiles=2, overlap=0.5, n_iter=3)
    assert pan.size == (px + 2 * (px // 2), px)  # W grows, H fixed

    down = dt.outpaint(src, "a field", n_tiles=1, direction="down",
                       overlap=0.25, n_iter=3)
    assert down.size == (px, px + 3 * px // 4)

    left = dt.outpaint(src, "a field", n_tiles=1, direction="left",
                       overlap=0.5, n_iter=3)
    assert left.size == (px + px // 2, px)
    # the original pixels are preserved on the non-extended side
    np.testing.assert_array_equal(
        np.asarray(pan)[:, :px], src)
    np.testing.assert_array_equal(
        np.asarray(left)[:, -px:], src)

    plain = LTDConfig(
        denoiser_cfg=CFG,
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
        clip_cfg=ClipConfig(width=64, heads=2, layers=2),
        use_pallas=False,
    )
    with pytest.raises(ValueError, match="widened-input"):
        DiffusionTransformer(plain).outpaint(src, "x", n_iter=3)


def test_outpaint_training(tmp_path):
    """Fine-tune recipe end-to-end: widen a (tiny) trained model's params
    with zero-init surgery, then train 2 epochs with outpaint=True."""
    from tests.test_training import _model_cfg
    from transformer_latent_diffusion_tpu.train import main

    base = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                          noise_embed_dims=64)
    wide = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                          noise_embed_dims=64,
                          input_channels=2 * base.n_channels)
    bp = init_denoiser_params(Denoiser(**base.__dict__), base)
    wp = expand_input_channels(bp, base.n_channels, wide.input_channels,
                               base.patch_size)

    cfg = _model_cfg(tmp_path, denoiser=wide, img_size=8, outpaint=True)
    result = main(cfg, init_params=wp)
    assert result["global_step"] == 4
    assert all(np.isfinite(result["losses"]))


def test_outpaint_config_validation(tmp_path):
    from tests.test_training import _model_cfg
    from transformer_latent_diffusion_tpu.train import main

    with pytest.raises(ValueError, match="input_channels"):
        main(_model_cfg(tmp_path, outpaint=True))
    with pytest.raises(ValueError, match="outpaint=False"):
        main(_model_cfg(tmp_path,
                        denoiser=DenoiserConfig(input_channels=8)))
