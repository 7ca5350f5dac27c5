"""Mixture-of-Experts FFN + expert parallelism (models/moe.py).

Beyond-reference capability (the reference FFN is dense and its
parallelism inventory has no EP — SURVEY.md §2). Pinned here:
(1) routing math equals a dense per-token computation when capacity is
    ample, (2) the Switch aux loss is sown and finite, (3) expert-parallel
    sharding over the mesh 'model' axis is numerically identical to the
    unsharded run, (4) train.main end-to-end with mlp_class='moe'.
"""

from dataclasses import asdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from transformer_latent_diffusion_tpu.configs import DenoiserConfig
from transformer_latent_diffusion_tpu.models import Denoiser, MoEMLP
from transformer_latent_diffusion_tpu.parallel import (
    MODEL_AXIS,
    create_mesh,
    param_shardings,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params


def _tokens(b=4, s=16, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)


def test_moe_matches_dense_routing_when_capacity_ample():
    """With capacity >= S every token reaches its expert: the output must
    equal gate * expert_ffn(token) computed densely per token."""
    x = _tokens()
    moe = MoEMLP(embed_dim=32, mlp_multiplier=2, dropout_level=0.0,
                 n_experts=4, capacity_factor=4.0)  # C = S -> no drops
    params = moe.init(jax.random.PRNGKey(0), x)["params"]
    got = moe.apply({"params": params}, x)

    logits = x @ params["router"]["kernel"]
    probs = jax.nn.softmax(logits, axis=-1)
    gate = jnp.max(probs, -1)
    idx = jnp.argmax(probs, -1)
    wi, bi = params["wi"], params["bi"]
    wo, bo = params["wo"], params["bo"]
    # run every expert densely on every token, select by routing
    h = jax.nn.gelu(jnp.einsum("bsd,edh->ebsh", x, wi) + bi[:, None, None, :])
    dense = jnp.einsum("ebsh,ehd->ebsd", h, wo) + bo[:, None, None, :]
    want = gate[..., None] * jnp.take_along_axis(
        dense.transpose(1, 2, 0, 3), idx[..., None, None], axis=2)[:, :, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_moe_drops_tokens_over_capacity():
    """capacity_factor small enough that drops must occur: dropped tokens
    output exactly zero (they ride the DecoderBlock residual)."""
    x = _tokens(b=2, s=16)
    # 1 expert, capacity ceil(16*0.25/1) = 4 -> 12 of 16 tokens dropped
    moe = MoEMLP(embed_dim=32, mlp_multiplier=2, dropout_level=0.0,
                 n_experts=1, capacity_factor=0.25)
    params = moe.init(jax.random.PRNGKey(0), x)["params"]
    out = np.asarray(moe.apply({"params": params}, x))
    # first 4 tokens routed, rest dropped (cumsum order)
    assert np.abs(out[:, :4]).sum() > 0
    np.testing.assert_array_equal(out[:, 4:], 0.0)


def test_moe_aux_loss_sown():
    x = _tokens()
    moe = MoEMLP(embed_dim=32, mlp_multiplier=2, dropout_level=0.0,
                 n_experts=4, capacity_factor=2.0)
    params = moe.init(jax.random.PRNGKey(0), x)["params"]
    _, mut = moe.apply({"params": params}, x, mutable=["losses"])
    (aux,) = mut["losses"]["moe_aux"]
    # Switch aux loss: >= 1 by Cauchy-Schwarz (== 1 at perfect balance),
    # bounded by E
    assert 1.0 - 1e-4 <= float(aux) <= 4.0
    # immutable apply: sow is a no-op, no error
    moe.apply({"params": params}, x)

    # per-expert load fractions live in their OWN collection
    # (scripts/probe_moe.py observability) — NOT in 'losses', which the
    # train loss sums wholesale
    _, mm = moe.apply({"params": params}, x, mutable=["moe_metrics"])
    (load,) = mm["moe_metrics"]["load"]
    assert load.shape == (4,)
    np.testing.assert_allclose(float(jnp.sum(load)), 1.0, atol=1e-5)
    assert "load" not in mut["losses"]


@pytest.fixture(scope="module")
def moe_denoiser():
    cfg = DenoiserConfig(image_size=16, embed_dim=128, n_layers=2,
                         noise_embed_dims=64, mlp_class="moe", n_experts=4)
    model = Denoiser(**asdict(cfg))
    params = init_denoiser_params(model, cfg)
    return cfg, model, params


def _den_inputs(cfg, b=8):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, 4, 16, 16)), jnp.float32)
    nl = jnp.asarray(rng.uniform(0.1, 0.9, (b, 1)), jnp.float32)
    lab = jnp.asarray(rng.standard_normal((b, cfg.text_emb_size)), jnp.float32)
    return x, nl, lab


def test_moe_denoiser_forward_and_grads(moe_denoiser):
    cfg, model, params = moe_denoiser
    x, nl, lab = _den_inputs(cfg)
    out = jax.jit(lambda p: model.apply({"params": p}, x, nl, lab))(params)
    assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))

    def loss(p):
        pred, mut = model.apply({"params": p}, x, nl, lab,
                                mutable=["losses"])
        aux = sum(jnp.sum(jnp.asarray(v))
                  for v in jax.tree.leaves(mut["losses"]))
        return jnp.mean((pred - x) ** 2) + 0.01 * aux

    grads = jax.jit(jax.grad(loss))(params)
    for kp, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert np.all(np.isfinite(np.asarray(g))), kp
    # router gradient is nonzero (gate + aux paths are differentiable)
    b0 = grads["denoiser_trans_block"]["decoder_block_0"]["mlp"]
    assert float(jnp.abs(b0["router"]["kernel"]).sum()) > 0
    assert float(jnp.abs(b0["wi"]).sum()) > 0


def test_expert_parallel_matches_unsharded(moe_denoiser):
    """Experts sharded over 'model' (EP): same numbers as single-device."""
    cfg, model, params = moe_denoiser
    x, nl, lab = _den_inputs(cfg)
    want = jax.jit(lambda p: model.apply({"params": p}, x, nl, lab))(params)

    mesh = create_mesh((2, 4))
    shardings = param_shardings(params, mesh)
    # the stacked expert weights landed on the 'model' axis
    mlp0 = shardings["denoiser_trans_block"]["decoder_block_0"]["mlp"]
    assert mlp0["wi"].spec == P(MODEL_AXIS, None, None)
    assert mlp0["bi"].spec == P(MODEL_AXIS, None)
    assert mlp0["router"]["kernel"].spec == P()

    ep_model = Denoiser(**asdict(cfg), ep_mesh=mesh)
    p_sharded = jax.device_put(params, shardings)
    got = jax.jit(
        lambda p: ep_model.apply({"params": p}, x, nl, lab))(p_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_expert_parallel_sampling(moe_denoiser):
    """Mesh generation with MoE: experts sharded over 'model' match the
    single-device sampler."""
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator

    cfg, model, params = moe_denoiser
    labels = jnp.asarray(
        np.random.default_rng(5).standard_normal((8, cfg.text_emb_size)),
        jnp.float32)
    kw = dict(labels=labels, num_imgs=8, img_size=cfg.image_size, n_iter=4,
              seed=5, sharp_f=0, bright_f=0, use_ddpm_plus=False)
    _, want = DiffusionGenerator(model=model, params=params,
                                 vae=None).generate(**kw)

    mesh = create_mesh((2, 4))
    ep_model = Denoiser(**asdict(cfg), ep_mesh=mesh)
    _, got = DiffusionGenerator(model=ep_model, params=params, vae=None,
                                mesh=mesh).generate(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_moe_training(tmp_path):
    """train.main end-to-end with mlp_class='moe' on a (2,4) mesh: the
    MSE+aux loss is finite and decreases."""
    from tests.test_training import _model_cfg
    from transformer_latent_diffusion_tpu.train import main

    moe_cfg = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                             noise_embed_dims=64, mlp_class="moe",
                             n_experts=4)
    r = main(_model_cfg(tmp_path, denoiser=moe_cfg, img_size=8, n_epoch=4,
                        mesh_shape=(2, 4), lr=1e-3,
                        compute_dtype="float32"))
    losses = r["losses"]
    assert all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_moe_training_with_fsdp(tmp_path):
    """EP over 'model' composes with ZeRO-3 over 'data' (both GSPMD)."""
    from tests.test_training import _model_cfg
    from transformer_latent_diffusion_tpu.train import main

    moe_cfg = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                             noise_embed_dims=64, mlp_class="moe",
                             n_experts=4)
    r = main(_model_cfg(tmp_path, denoiser=moe_cfg, img_size=8, n_epoch=1,
                        mesh_shape=(2, 4), fsdp=True,
                        compute_dtype="float32"))
    assert all(np.isfinite(r["losses"]))
