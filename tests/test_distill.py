"""Consistency distillation (train/distill.py) — the reference's open
TODO "how to speed up generation even more - LCMs?" as a first-class
feature. Tests the boundary-condition parametrization, the distillation
loop, and few-step fresh-noise sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_latent_diffusion_tpu.configs import (
    DataConfig,
    DenoiserConfig,
    ModelConfig,
    TrainConfig,
    VaeConfig,
)
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
from transformer_latent_diffusion_tpu.train import (
    consistency_apply,
    distill_consistency,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

CFG = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                     noise_embed_dims=64)


@pytest.fixture(scope="module")
def model_and_params():
    model = Denoiser(**CFG.__dict__)
    return model, init_denoiser_params(model, CFG)


def test_consistency_boundary(model_and_params):
    """f(x, 0) == x exactly; f(x, 1) == raw network output."""
    model, params = model_and_params
    f = consistency_apply(model)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (2, CFG.n_channels, CFG.image_size, CFG.image_size))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, CFG.text_emb_size))
    zero = jnp.zeros((2, 1))
    np.testing.assert_array_equal(
        np.asarray(f(params, x, zero, y)), np.asarray(x))
    one = jnp.ones((2, 1))
    raw = model.apply({"params": params}, x, one, y)
    np.testing.assert_allclose(np.asarray(f(params, x, one, y)),
                               np.asarray(raw), atol=1e-6)


def _distill_cfg(tmp_path, n=48, **train_kw):
    rng = np.random.default_rng(0)
    lp = str(tmp_path / "latents.npy")
    tp = str(tmp_path / "text.npy")
    vp = str(tmp_path / "val.npy")
    np.save(lp, rng.standard_normal(
        (n, 4, CFG.image_size, CFG.image_size)).astype(np.float32))
    np.save(tp, rng.standard_normal((n, CFG.text_emb_size)).astype(np.float32))
    np.save(vp, rng.standard_normal((8, CFG.text_emb_size)).astype(np.float32))
    defaults = dict(n_epoch=2, batch_size=16, save_model=False,
                    use_wandb=False, lr=1e-3)
    defaults.update(train_kw)
    return ModelConfig(
        data_config=DataConfig(latent_path=lp, text_emb_path=tp, val_path=vp),
        denoiser_config=CFG,
        train_config=TrainConfig(**defaults),
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
    )


def test_distillation_and_fewstep_sampling(tmp_path, model_and_params):
    model, teacher = model_and_params
    cfg = _distill_cfg(tmp_path, n_epoch=8)
    out = distill_consistency(cfg, teacher, n_schedule=16, guidance=2.0)
    assert out["global_step"] == 8 * 3
    losses = out["losses"]
    assert all(np.isfinite(losses))
    # the student starts AT the teacher, which is not self-consistent:
    # optimization must reduce the consistency gap
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    # few-step fresh-noise sampling with the distilled weights
    gen = DiffusionGenerator(model=model, params=out["ema_params"],
                             vae=None, fast_apply=consistency_apply(model))
    labels = jax.random.normal(jax.random.PRNGKey(2), (2, CFG.text_emb_size))
    kw = dict(labels=labels, num_imgs=2, img_size=CFG.image_size,
              class_guidance=1, seed=5, sharp_f=0, bright_f=0,
              use_ddpm_plus=False, fresh_noise=True)
    _, a = gen.generate(n_iter=2, **kw)
    assert a.shape == (2, 4, CFG.image_size, CFG.image_size)
    assert np.isfinite(np.asarray(a)).all()
    # deterministic per seed (fresh noise comes from a folded PRNG)
    _, a2 = gen.generate(n_iter=2, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    # more steps = different trajectory, still finite
    _, b = gen.generate(n_iter=4, **kw)
    assert np.isfinite(np.asarray(b)).all()
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_distillation_label_dropout_and_sampler_cfg(tmp_path,
                                                    model_and_params):
    """The guidance-1 recipe (VERDICT r4 #1): label_dropout keeps the
    student's unconditional branch trained, and classifier-free
    guidance applied SAMPLER-SIDE on the consistency student runs and
    actually steers the output."""
    model, teacher = model_and_params
    cfg = _distill_cfg(tmp_path, n_epoch=4)
    out = distill_consistency(cfg, teacher, n_schedule=16, guidance=1.0,
                              label_dropout=0.25)
    assert all(np.isfinite(out["losses"]))
    # dropout changes the training signal: different result than the
    # same seed without it
    out0 = distill_consistency(cfg, teacher, n_schedule=16, guidance=1.0)
    la = jax.tree_util.tree_leaves(out["ema_params"])
    lb = jax.tree_util.tree_leaves(out0["ema_params"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-7
               for a, b in zip(la, lb))

    gen = DiffusionGenerator(model=model, params=out["ema_params"],
                             vae=None, fast_apply=consistency_apply(model))
    labels = jax.random.normal(jax.random.PRNGKey(2), (2, CFG.text_emb_size))
    kw = dict(labels=labels, num_imgs=2, img_size=CFG.image_size,
              seed=5, sharp_f=0, bright_f=0, use_ddpm_plus=False,
              fresh_noise=True, n_iter=2)
    _, g1 = gen.generate(class_guidance=1.0, **kw)
    _, g3 = gen.generate(class_guidance=3.0, **kw)
    assert np.isfinite(np.asarray(g3)).all()
    # CFG extrapolates cond vs uncond: a real steering effect
    assert np.abs(np.asarray(g3) - np.asarray(g1)).max() > 1e-5


def test_fresh_noise_validations(model_and_params):
    model, params = model_and_params
    gen = DiffusionGenerator(model=model, params=params, vae=None)
    labels = jnp.ones((1, CFG.text_emb_size))
    kw = dict(labels=labels, num_imgs=1, img_size=CFG.image_size,
              n_iter=3, sharp_f=0, bright_f=0)
    with pytest.raises(ValueError, match="use_ddpm_plus"):
        gen.generate(fresh_noise=True, **kw)
    with pytest.raises(ValueError, match="inpainting"):
        gen.generate(fresh_noise=True, use_ddpm_plus=False,
                     init_latents=np.zeros((1, 4, CFG.image_size,
                                            CFG.image_size)),
                     mask=np.ones((CFG.image_size, CFG.image_size)), **kw)
    # ancestral-style sampling on an ordinary denoiser: works, seeded
    _, a = gen.generate(fresh_noise=True, use_ddpm_plus=False, seed=4, **kw)
    _, b = gen.generate(fresh_noise=True, use_ddpm_plus=False, seed=4, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, c = gen.generate(fresh_noise=True, use_ddpm_plus=False, seed=6, **kw)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


def test_consistency_apply_preserves_engine_protocol():
    """consistency_apply over the fused engine must keep the prepare
    protocol (packing hoisted out of the scan) and match the plain
    linen-wrapper output (engine in CPU interpret mode)."""
    from transformer_latent_diffusion_tpu.models.fast_denoiser import (
        make_fused_apply,
    )

    cfg = DenoiserConfig()  # fused engine supports the default tiny cfg
    model = Denoiser(**cfg.__dict__)
    params = init_denoiser_params(model, cfg)
    engine = make_fused_apply(cfg, compute_dtype=jnp.float32,
                              interpret=True)
    wrapped = consistency_apply(model, inner=engine)
    assert hasattr(wrapped, "prepare") and hasattr(wrapped, "apply_prepared")

    x = jax.random.normal(jax.random.PRNGKey(0),
                          (2, cfg.n_channels, cfg.image_size, cfg.image_size))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.text_emb_size))
    nl = jnp.full((2, 1), 0.7)
    got = wrapped.apply_prepared(wrapped.prepare(params), x, nl, y)
    want = consistency_apply(model)(params, x, nl, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=0)
    # callable protocol too
    np.testing.assert_allclose(np.asarray(wrapped(params, x, nl, y)),
                               np.asarray(got), atol=1e-6, rtol=0)
