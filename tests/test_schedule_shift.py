"""Resolution-dependent schedule shift (beyond reference; Esser et al.
2024 §5.3.2 — the SD3 timestep shift). This repo's corruption
`x = s*eps + (1-s)*x0` is the linear-interpolation schedule the shift
was derived for, so the map s' = k*s/(1+(k-1)*s) applies verbatim:
sampling-side via generate(schedule_shift=...), training-side via
TrainConfig.schedule_shift (per-bucket "auto" in multires runs)."""

from dataclasses import asdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_latent_diffusion_tpu.configs import (
    DenoiserConfig,
    TrainConfig,
)
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.sampling import (
    DiffusionGenerator,
    make_noise_levels,
    shift_noise_levels,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

SMALL = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                       noise_embed_dims=64)


def _small_gen():
    model = Denoiser(**asdict(SMALL))
    params = init_denoiser_params(model, SMALL)
    return DiffusionGenerator(model=model, params=params, vae=None)


def test_shift_map_properties():
    lv = make_noise_levels(16)
    # identity at shift=1
    np.testing.assert_allclose(shift_noise_levels(lv, 1.0), lv, rtol=1e-12)
    # fixed points 0 and 1
    ends = shift_noise_levels(np.array([0.0, 1.0]), 3.0)
    np.testing.assert_allclose(ends, [0.0, 1.0], atol=1e-15)
    # spot value: k=2, s=0.5 -> 2*0.5/(1+0.5) = 2/3
    np.testing.assert_allclose(shift_noise_levels(np.array([0.5]), 2.0),
                               [2.0 / 3.0], rtol=1e-12)
    # k>1 raises every interior level (more time at high noise); k<1 lowers
    up = shift_noise_levels(lv, 2.0)
    dn = shift_noise_levels(lv, 0.5)
    assert (up[1:] > lv[1:]).all() and (dn[1:] < lv[1:]).all()
    # monotone: strictly-decreasing grids stay strictly decreasing
    assert (np.diff(up) < 0).all() and (np.diff(dn) < 0).all()
    # inverse: shifting by k then 1/k is the identity
    np.testing.assert_allclose(shift_noise_levels(up, 0.5), lv, rtol=1e-12)
    with pytest.raises(ValueError, match="must be > 0"):
        shift_noise_levels(lv, 0.0)


def test_generate_schedule_shift():
    gen = _small_gen()
    labels = jnp.ones((1, 768))
    kw = dict(labels=labels, num_imgs=1, img_size=8, n_iter=4, seed=7,
              sharp_f=0, bright_f=0)
    _, base = gen.generate(**kw)
    # shift=None and shift=1.0 are bit-equal to the default path
    _, one = gen.generate(schedule_shift=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(base))
    # "auto" at the native size is the identity too
    _, auto = gen.generate(schedule_shift="auto", **kw)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(base))
    # a real shift changes the trajectory and equals the explicit levels
    _, sh = gen.generate(schedule_shift=2.0, **kw)
    assert np.abs(np.asarray(sh) - np.asarray(base)).max() > 1e-5
    lv = shift_noise_levels(make_noise_levels(4), 2.0)
    _, manual = gen.generate(noise_levels=lv, clamp_first=False, **kw)
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(manual))
    # "auto" at 2x the native size == explicit shift 2.0
    kw16 = dict(kw, img_size=16)
    _, auto16 = gen.generate(schedule_shift="auto", **kw16)
    _, exp16 = gen.generate(schedule_shift=2.0, **kw16)
    np.testing.assert_array_equal(np.asarray(auto16), np.asarray(exp16))


def test_pipeline_schedule_shift_plumbing():
    from tests.test_diffusion import tiny_ltd_config
    from transformer_latent_diffusion_tpu.sampling import (
        DiffusionTransformer,
    )

    dt = DiffusionTransformer(tiny_ltd_config())
    kw = dict(num_imgs=1, seed=3, n_iter=4, class_guidance=3)
    base = dt.generate_array_from_text("a cat", **kw)
    sh = dt.generate_array_from_text("a cat", schedule_shift=2.0, **kw)
    assert base.shape == sh.shape
    assert (base != sh).any()


def test_deployment_schedule_shift():
    """LTDConfig.schedule_shift: deployment-level default for t2i
    sampling — equal to passing the same value per call, overridden by
    an explicit per-call value, mirrored by the micro-batcher, rejected
    on consistency deployments."""
    from dataclasses import replace as dc_replace

    from tests.test_diffusion import tiny_ltd_config
    from transformer_latent_diffusion_tpu.sampling import (
        DiffusionTransformer,
    )

    cfg = tiny_ltd_config()
    dt_plain = DiffusionTransformer(cfg)
    dt_shift = DiffusionTransformer(dc_replace(cfg, schedule_shift=2.0))
    kw = dict(num_imgs=1, seed=3, n_iter=4, class_guidance=3)
    a = dt_plain.generate_array_from_text("a cat", schedule_shift=2.0,
                                          **kw)
    b = dt_shift.generate_array_from_text("a cat", **kw)
    np.testing.assert_array_equal(a, b)
    base = dt_plain.generate_array_from_text("a cat", **kw)
    assert (b != base).any()
    # per-call value overrides the deployment default...
    c = dt_shift.generate_array_from_text("a cat", schedule_shift=3.0,
                                          **kw)
    d = dt_plain.generate_array_from_text("a cat", schedule_shift=3.0,
                                          **kw)
    np.testing.assert_array_equal(c, d)
    # ...including 1.0 as the explicit escape hatch back to no shift
    e = dt_shift.generate_array_from_text("a cat", schedule_shift=1.0,
                                          **kw)
    np.testing.assert_array_equal(e, base)

    # the micro-batcher ships the deployment default with t2i groups
    from transformer_latent_diffusion_tpu.serve.batcher import MicroBatcher

    seen = []
    orig = dt_shift.diffuser.generate

    def spy(*args, **kwargs):
        seen.append(kwargs.get("schedule_shift"))
        return orig(*args, **kwargs)

    dt_shift.diffuser.generate = spy
    mb = MicroBatcher(dt_shift, max_batch=2, max_wait_ms=10.0)
    try:
        img = mb.generate("a cat", n_iter=4, timeout=120)
        assert img.size[0] > 0
    finally:
        mb.close()
        dt_shift.diffuser.generate = orig
    assert seen == [2.0], seen

    with pytest.raises(ValueError, match="consistency"):
        DiffusionTransformer(dc_replace(cfg, schedule_shift=2.0,
                                        consistency=True))
    with pytest.raises(ValueError, match="must be > 0"):
        DiffusionTransformer(dc_replace(cfg, schedule_shift=-1.0))


def _loss(tcfg, grid=8, seed=0):
    model = Denoiser(**asdict(SMALL))
    params = init_denoiser_params(model, SMALL)
    from transformer_latent_diffusion_tpu.train.train import build_loss_fn

    loss_fn = build_loss_fn(model, tcfg, vae_scale_factor=1.0)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (4, 4, grid, grid))
    y = jax.random.normal(jax.random.fold_in(rng, 2), (4, 768))
    return float(loss_fn(params, x, y, rng))


def test_train_schedule_shift():
    base = _loss(TrainConfig())
    # off / 1.0 / "auto"-on-native-bucket are all bit-identical
    assert _loss(TrainConfig(schedule_shift=1.0)) == base
    assert _loss(TrainConfig(schedule_shift="auto")) == base
    # a real shift changes the drawn corruption levels (and the loss)
    assert _loss(TrainConfig(schedule_shift=2.0)) != base
    # "auto" on a 2x bucket == explicit 2.0 on that bucket (the model's
    # native grid is 8 -> a 16px batch resolves to shift 2)
    assert (_loss(TrainConfig(schedule_shift="auto"), grid=16)
            == _loss(TrainConfig(schedule_shift=2.0), grid=16))
    # and differs from the unshifted 16px bucket
    assert (_loss(TrainConfig(schedule_shift="auto"), grid=16)
            != _loss(TrainConfig(), grid=16))
    with pytest.raises(ValueError, match="schedule_shift"):
        _loss(TrainConfig(schedule_shift=-1.0))


def test_config_roundtrip_schedule_shift():
    import json
    from dataclasses import asdict as dc_asdict

    from transformer_latent_diffusion_tpu.configs import config_to_json

    for val in (None, 2.0, "auto"):
        tcfg = TrainConfig(schedule_shift=val)
        back = TrainConfig(**json.loads(config_to_json(tcfg)))
        assert back.schedule_shift == val
        assert dc_asdict(back) == dc_asdict(tcfg)
