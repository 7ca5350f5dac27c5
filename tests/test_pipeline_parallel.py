"""Pipeline parallelism (GPipe over the decoder stack) — beyond the
reference's DDP-only distributed story. GPipe has no stale weights, so
outputs AND gradients must exactly match sequential execution."""

from dataclasses import asdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_latent_diffusion_tpu.configs import DenoiserConfig
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.parallel import (
    MODEL_AXIS,
    PipelinedDenoiser,
    create_mesh,
    merge_block_params,
    split_block_params,
    stacked_block_shardings,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

CFG = DenoiserConfig(image_size=16, embed_dim=128, n_layers=4,
                     noise_embed_dims=64)


@pytest.fixture(scope="module")
def model_and_params():
    model = Denoiser(**asdict(CFG))
    params = init_denoiser_params(model, CFG)
    return model, params


def _inputs(b=8):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 4, 16, 16)), jnp.float32)
    nl = jnp.asarray(rng.uniform(0.1, 0.9, (b, 1)), jnp.float32)
    lab = jnp.asarray(rng.standard_normal((b, CFG.text_emb_size)),
                      jnp.float32)
    return x, nl, lab


def test_split_merge_roundtrip(model_and_params):
    _, params = model_and_params
    outer, stacked = split_block_params(params, CFG.n_layers)
    assert "decoder_block_0" not in outer["denoiser_trans_block"]
    for leaf in jax.tree.leaves(stacked):
        assert leaf.shape[0] == CFG.n_layers
    back = merge_block_params(outer, stacked, CFG.n_layers)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), str(kp))


def test_pipeline_forward_matches_sequential(model_and_params):
    """4 stages x 4 microbatches on the (2,4) mesh == plain forward."""
    model, params = model_and_params
    x, nl, lab = _inputs()
    want = model.apply({"params": params}, x, nl, lab)

    mesh = create_mesh((2, 4))
    pp = PipelinedDenoiser(CFG, mesh, n_microbatches=4)
    got = jax.jit(pp)(params, x, nl, lab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    # stage weights actually land on the 'model' axis
    _, stacked = split_block_params(params, CFG.n_layers)
    sh = stacked_block_shardings(stacked, mesh)
    assert all(s.spec == (MODEL_AXIS,) for s in jax.tree.leaves(sh))


def test_pipeline_grads_match_sequential(model_and_params):
    """GPipe has no stale weights: training gradients are identical."""
    model, params = model_and_params
    x, nl, lab = _inputs()
    mesh = create_mesh((2, 4))
    pp = PipelinedDenoiser(CFG, mesh, n_microbatches=4)

    def loss_seq(p):
        return jnp.mean((model.apply({"params": p}, x, nl, lab) - x) ** 2)

    def loss_pp(p):
        return jnp.mean((pp(p, x, nl, lab) - x) ** 2)

    g_seq = jax.jit(jax.grad(loss_seq))(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_seq)[0],
            jax.tree_util.tree_flatten_with_path(g_pp)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4, err_msg=str(kp))


def test_pipeline_training(tmp_path):
    """train.main with pipeline_parallel=True on a (2,4) mesh: the loss
    math is unchanged, so losses match the plain GSPMD mesh run."""
    from tests.test_training import SMALL_DENOISER, _model_cfg  # noqa: F401
    from transformer_latent_diffusion_tpu.train import main

    # SMALL_DENOISER has 2 layers; (4, 2) mesh -> 2 stages x 4-way DP
    kw = dict(denoiser=SMALL_DENOISER, img_size=8, n_epoch=1,
              mesh_shape=(4, 2), compute_dtype="float32")
    r_pp = main(_model_cfg(tmp_path, pipeline_parallel=True,
                           pipeline_microbatches=4, **kw))
    r_tp = main(_model_cfg(tmp_path, **kw))
    assert all(np.isfinite(r_pp["losses"]))
    np.testing.assert_allclose(r_pp["losses"], r_tp["losses"],
                               rtol=1e-4, atol=1e-5)


def test_pipeline_parallel_sampling(model_and_params):
    """DiffusionGenerator(pipeline_fn=...): GPipe stages inside the
    50-step sampling scan match the unsharded sampler exactly."""
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator

    model, params = model_and_params
    labels = jnp.asarray(
        np.random.default_rng(3).standard_normal((8, CFG.text_emb_size)),
        jnp.float32)
    kw = dict(labels=labels, num_imgs=8, img_size=CFG.image_size, n_iter=4,
              seed=5, sharp_f=0, bright_f=0, use_ddpm_plus=False)

    _, want = DiffusionGenerator(model=model, params=params,
                                 vae=None).generate(**kw)

    mesh = create_mesh((2, 4))
    pp = PipelinedDenoiser(CFG, mesh, n_microbatches=2)
    _, got = DiffusionGenerator(model=model, params=params, vae=None,
                                mesh=mesh, pipeline_fn=pp).generate(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pipeline_parallel_public_api():
    """LTDConfig(pipeline_parallel=True): text-to-image pixels match the
    single-device pipeline within float-scheduling tolerance."""
    from transformer_latent_diffusion_tpu.configs import (
        ClipConfig,
        LTDConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.sampling.pipeline import (
        DiffusionTransformer,
    )

    def cfg(**kw):
        return LTDConfig(
            denoiser_cfg=CFG,
            vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
            clip_cfg=ClipConfig(width=64, heads=2, layers=2),
            use_pallas=False, **kw)

    want = DiffusionTransformer(cfg()).generate_image_from_text(
        "a pipeline", num_imgs=4, seed=7, n_iter=4)
    got = DiffusionTransformer(
        cfg(mesh_shape=(2, 4), pipeline_parallel=True,
            pipeline_microbatches=2),
    ).generate_image_from_text("a pipeline", num_imgs=4, seed=7, n_iter=4)
    a, b = np.asarray(want).astype(int), np.asarray(got).astype(int)
    assert np.abs(a - b).max() <= 1


def test_pipeline_rejects_bad_config():
    mesh = create_mesh((2, 4))
    with pytest.raises(AssertionError):
        PipelinedDenoiser(
            DenoiserConfig(image_size=16, embed_dim=128, n_layers=3,
                           noise_embed_dims=64), mesh)  # 3 % 4 != 0


def test_pipeline_rejects_fsdp(tmp_path):
    """PP + ZeRO-3 is an unverified composition: must fail loudly, not
    silently reshard."""
    from tests.test_training import SMALL_DENOISER, _model_cfg
    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=SMALL_DENOISER, img_size=8,
                     mesh_shape=(4, 2), pipeline_parallel=True, fsdp=True)
    with pytest.raises(ValueError, match="does not compose"):
        main(cfg)
