"""Prediction-objective tests: "x0" (reference), "eps", "v"
(rectified-flow velocity) — DenoiserConfig.objective.

The reference trains x0-prediction only (train.py:166-167); the TPU
framework adds noise- and velocity-prediction as first-class objectives.
The conversion math (sampling.diffusion.prediction_to_x0) is affine in
the prediction, so every sampler variant works unchanged; these tests
pin the algebra, the sampler equivalence, the loss targets, and the
train/distill integration.
"""

from dataclasses import asdict, replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_latent_diffusion_tpu.configs import (
    DenoiserConfig,
)
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
from transformer_latent_diffusion_tpu.sampling.diffusion import (
    prediction_to_x0,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

TINY = DenoiserConfig(image_size=16, embed_dim=64, n_layers=2,
                      noise_embed_dims=64)


def test_prediction_to_x0_algebra():
    """Each objective's conversion exactly inverts the forward relation
    x_t = s*eps + (1-s)*x0 for scalar and per-sample sigma."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((4, 4, 8, 8)), dtype=jnp.float32)
    eps = jnp.asarray(rng.standard_normal((4, 4, 8, 8)), dtype=jnp.float32)
    for sigma in (0.37, jnp.asarray(rng.uniform(0.05, 0.95, (4, 1)),
                                    dtype=jnp.float32)):
        s = jnp.asarray(sigma, dtype=jnp.float32)
        s4 = s.reshape(-1, 1, 1, 1) if s.ndim else s
        x_t = s4 * eps + (1.0 - s4) * x0
        np.testing.assert_allclose(
            prediction_to_x0(x0, x_t, sigma, "x0"), x0, atol=0)
        np.testing.assert_allclose(
            prediction_to_x0(eps, x_t, sigma, "eps"), x0, atol=1e-5)
        np.testing.assert_allclose(
            prediction_to_x0(eps - x0, x_t, sigma, "v"), x0, atol=1e-5)
    with pytest.raises(ValueError):
        prediction_to_x0(x0, x_t, 0.5, "score")


def _wrapped_apply(model, kind):
    """Re-express an x0 model's predictions in another objective's
    units (pure post-hoc reparametrization — identical information)."""

    def apply(params, x, noise_level, labels):
        x0 = model.apply({"params": params}, x, noise_level, labels)
        s = noise_level.reshape(-1, 1, 1, 1).astype(x.dtype)
        if kind == "v":
            return (x - x0) / s
        if kind == "eps":
            return (x - (1.0 - s) * x0) / s
        return x0

    return apply


@pytest.mark.parametrize("kind", ["v", "eps"])
def test_sampler_equivalence_across_objectives(kind):
    """Sampling an x0 model and sampling the SAME model re-expressed in
    v/eps units (with the matching prediction_type) yield the same
    latents — DDIM and DPM++ both."""
    model = Denoiser(**asdict(TINY))
    params = init_denoiser_params(model, TINY)
    labels = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 768)),
        dtype=jnp.float32)

    base = DiffusionGenerator(model=model, params=params, vae=None)
    wrapped = DiffusionGenerator(
        model=model, params=params, vae=None,
        fast_apply=_wrapped_apply(model, kind), prediction_type=kind)

    for ddpm_plus in (False, True):
        _, lat_a = base.generate(labels, n_iter=6, num_imgs=2, seed=3,
                                 img_size=TINY.image_size,
                                 class_guidance=2.5,
                                 use_ddpm_plus=ddpm_plus)
        _, lat_b = wrapped.generate(labels, n_iter=6, num_imgs=2, seed=3,
                                    img_size=TINY.image_size,
                                    class_guidance=2.5,
                                    use_ddpm_plus=ddpm_plus)
        np.testing.assert_allclose(np.asarray(lat_a), np.asarray(lat_b),
                                   atol=2e-4)


def test_loss_targets_differ_and_match_objective():
    """build_loss_fn regresses onto the objective's target: with the
    same rng the three objectives disagree, and a stub model that
    predicts zeros recovers the analytic x0 loss mean((x/scale)^2)."""
    from transformer_latent_diffusion_tpu.configs import TrainConfig
    from transformer_latent_diffusion_tpu.train.train import build_loss_fn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 4, 16, 16)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 768)), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    tcfg = TrainConfig()

    class StubZero:
        dropout = 0
        mlp_class = "sep_conv"

        def __init__(self, objective):
            self.objective = objective

        def apply(self, variables, x_noisy, noise_level, label,
                  deterministic=True, rngs=None):
            return jnp.zeros_like(x_noisy)

    losses = {}
    for kind in ("x0", "eps", "v"):
        loss_fn = build_loss_fn(StubZero(kind), tcfg, vae_scale_factor=2.0)
        losses[kind] = float(loss_fn({}, x, y, key))
    # zero prediction, x0 target -> loss is exactly mean((x/2)^2)
    np.testing.assert_allclose(losses["x0"], float(jnp.mean((x / 2.0) ** 2)),
                               rtol=1e-6)
    assert len({round(v, 6) for v in losses.values()}) == 3

    with pytest.raises(ValueError):
        build_loss_fn(StubZero("score"), tcfg, vae_scale_factor=1.0)


class _StubInfoZero:
    """Stub denoiser that predicts the SAME information (x0_pred = 0)
    expressed in each objective's units — used to pin that min-SNR
    weighting is exactly objective-invariant."""

    dropout = 0
    mlp_class = "sep_conv"

    def __init__(self, objective):
        self.objective = objective

    def apply(self, variables, x_noisy, noise_level, label,
              deterministic=True, rngs=None):
        if self.objective == "x0":
            return jnp.zeros_like(x_noisy)
        s = noise_level[:, :, None, None].astype(x_noisy.dtype)
        # x0_pred = 0  <=>  eps_pred = x_t/s  <=>  v_pred = x_t/s
        return x_noisy / s


def test_min_snr_weighting_objective_invariant():
    """With loss_weighting='min_snr', the loss of a model predicting
    identical information is IDENTICAL across x0/eps/v objectives (the
    x0-space weight is converted by the exact error Jacobian), and the
    x0 value matches the analytic mean(w * per-sample mean((x/scale)^2))."""
    from transformer_latent_diffusion_tpu.configs import TrainConfig
    from transformer_latent_diffusion_tpu.train.train import (
        build_loss_fn,
        sample_beta,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((16, 4, 16, 16)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((16, 768)), dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    tcfg = TrainConfig(loss_weighting="min_snr", min_snr_gamma=5.0)

    losses = {
        kind: float(build_loss_fn(_StubInfoZero(kind), tcfg,
                                  vae_scale_factor=2.0)({}, x, y, key))
        for kind in ("x0", "eps", "v")
    }
    np.testing.assert_allclose(losses["eps"], losses["x0"], rtol=1e-5)
    np.testing.assert_allclose(losses["v"], losses["x0"], rtol=1e-5)

    # analytic expectation (replays build_loss_fn's rng split + Beta draw)
    r_beta = jax.random.split(key, 5)[0]
    s = sample_beta(r_beta, tcfg.beta_a, tcfg.beta_b, (16, 1))
    w = jnp.minimum(jnp.square((1.0 - s) / s), 5.0)[:, 0]
    per = jnp.mean(jnp.square(x / 2.0), axis=(1, 2, 3))
    np.testing.assert_allclose(losses["x0"], float(jnp.mean(w * per)),
                               rtol=1e-5)

    with pytest.raises(ValueError):
        build_loss_fn(_StubInfoZero("x0"),
                      TrainConfig(loss_weighting="p2"), vae_scale_factor=1.0)


def test_training_smoke_min_snr(tmp_path):
    """2-epoch train.main smoke with min-SNR weighting on."""
    from tests.test_training import _model_cfg
    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=TINY, img_size=TINY.image_size)
    cfg.train_config.loss_weighting = "min_snr"
    result = main(cfg)
    assert result["global_step"] == 4
    assert all(np.isfinite(result["losses"]))


def test_offset_noise():
    """TrainConfig.offset_noise adds a per-(sample,channel) broadcast
    component to the corruption noise; the eps target uses the SAME
    effective noise (self-consistency), pinned by exact rng replay."""
    from transformer_latent_diffusion_tpu.configs import TrainConfig
    from transformer_latent_diffusion_tpu.train.train import build_loss_fn

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((8, 4, 16, 16)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 768)), dtype=jnp.float32)
    key = jax.random.PRNGKey(11)

    # zero-prediction eps-objective stub: loss == mean(effective_noise^2)
    class StubZero:
        dropout = 0
        mlp_class = "sep_conv"
        objective = "eps"

        def apply(self, variables, x_noisy, noise_level, label,
                  deterministic=True, rngs=None):
            return jnp.zeros_like(x_noisy)

    loss = float(build_loss_fn(StubZero(), TrainConfig(offset_noise=0.5),
                               vae_scale_factor=1.0)({}, x, y, key))
    # exact replay of the loss_fn's draws
    r_noise = jax.random.split(key, 5)[1]
    eps = jax.random.normal(r_noise, x.shape, dtype=x.dtype)
    z = jax.random.normal(jax.random.fold_in(r_noise, 1),
                          (8, 4, 1, 1), dtype=x.dtype)
    np.testing.assert_allclose(
        loss, float(jnp.mean((eps + 0.5 * z) ** 2)), rtol=1e-6)

    # offset=0 stays bit-identical to the pre-feature path
    base = float(build_loss_fn(StubZero(), TrainConfig(),
                               vae_scale_factor=1.0)({}, x, y, key))
    np.testing.assert_allclose(base, float(jnp.mean(eps ** 2)), rtol=1e-6)


def test_training_smoke_offset_noise(tmp_path):
    from tests.test_training import _model_cfg
    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=TINY, img_size=TINY.image_size)
    cfg.train_config.offset_noise = 0.1
    result = main(cfg)
    assert result["global_step"] == 4
    assert all(np.isfinite(result["losses"]))


@pytest.mark.parametrize("kind", ["v", "eps"])
def test_training_smoke_objective(tmp_path, kind):
    """2-epoch train.main smoke per objective (mirrors test_training)."""
    from tests.test_training import _model_cfg
    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=replace(TINY, objective=kind),
                     img_size=TINY.image_size)
    result = main(cfg)
    assert result["global_step"] == 4
    assert all(np.isfinite(result["losses"]))


def test_consistency_apply_converts_objective():
    """consistency_apply on a v-expressed network equals
    consistency_apply on the underlying x0 network."""
    from transformer_latent_diffusion_tpu.train.distill import (
        consistency_apply,
    )

    model = Denoiser(**asdict(TINY))
    params = init_denoiser_params(model, TINY)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 16)), dtype=jnp.float32)
    nl = jnp.asarray(rng.uniform(0.1, 0.9, (2, 1)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 768)), dtype=jnp.float32)

    f_x0 = consistency_apply(model)(params, x, nl, y)
    f_v = consistency_apply(model, inner=_wrapped_apply(model, "v"),
                            objective="v")(params, x, nl, y)
    np.testing.assert_allclose(np.asarray(f_x0), np.asarray(f_v), atol=1e-5)
    # wrapper advertises x0-style output so the sampler won't re-convert
    assert consistency_apply(model, objective="v").output_objective == "x0"


def test_distill_smoke_v_objective(tmp_path):
    """Consistency distillation runs on a v-objective teacher."""
    from tests.test_training import _model_cfg
    from transformer_latent_diffusion_tpu.train.distill import (
        distill_consistency,
    )

    dcfg = replace(TINY, objective="v")
    cfg = _model_cfg(tmp_path, denoiser=dcfg, img_size=TINY.image_size,
                     n_epoch=1, batch_size=32)
    model = Denoiser(**asdict(dcfg))
    teacher = init_denoiser_params(model, dcfg)
    out = distill_consistency(cfg, teacher, n_schedule=8)
    assert out["global_step"] == 2
    assert all(np.isfinite(out["losses"]))
