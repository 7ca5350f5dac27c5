"""Gradient parity: fully-fused layer VJP vs jax.grad of the jnp
reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from transformer_latent_diffusion_tpu.models.blocks import (
    _gelu,
    depthwise_conv3x3,
)
from transformer_latent_diffusion_tpu.ops.attention import multi_head_attention
from transformer_latent_diffusion_tpu.ops.fused_layer_vjp import fused_layer_vjp

B, HW, D, H, HID = 2, 4, 64, 2, 128
N = HW * HW
LN_EPS = 1e-5


def _ln(x, s, b):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + LN_EPS) * s + b


def _ref(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv,
         ln3s, ln3b, w1, b1, dw, dwb, w2, b2):
    q, k, v = jnp.split(_ln(x, ln1s, ln1b) @ wqkv, 3, axis=-1)
    x1 = x + multi_head_attention(q, k, v, H)
    qc = _ln(x1, ln2s, ln2b) @ wq
    kc, vc = jnp.split(cond @ wkv, 2, axis=-1)
    x2 = x1 + multi_head_attention(qc, kc, vc, H)
    h = (_ln(x2, ln3s, ln3b) @ w1 + b1).reshape(B, HW, HW, HID)
    c = depthwise_conv3x3(h, dw.reshape(3, 3, 1, HID), dwb)
    a = _gelu(c).reshape(B, N, HID)
    return x2 + (a @ w2 + b2)


def _random_args(seed=0):
    rng = np.random.default_rng(seed)
    def arr(*s, scale=0.3):
        return jnp.asarray(rng.standard_normal(s) * scale, dtype=jnp.float32)
    ones = lambda n: jnp.ones((n,), jnp.float32)  # noqa: E731
    return (arr(B, N, D), arr(B, 2, D),
            ones(D), arr(D), arr(D, 3 * D), ones(D), arr(D),
            arr(D, D), arr(D, 2 * D),
            ones(D), arr(D), arr(D, HID), arr(HID), arr(3, 3, HID),
            arr(HID), arr(HID, D), arr(D))


def test_forward_matches_reference():
    args = _random_args()
    want = _ref(*args)
    got = fused_layer_vjp(*args, H, HW, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=1e-3)


def test_gradients_match_reference():
    args = _random_args(1)

    def loss_ref(*a):
        return jnp.mean(jnp.sin(_ref(*a)))

    def loss_fused(*a):
        return jnp.mean(jnp.sin(fused_layer_vjp(*a, H, HW, True)))

    want = jax.grad(loss_ref, argnums=tuple(range(17)))(*args)
    got = jax.grad(loss_fused, argnums=tuple(range(17)))(*args)

    names = ["x", "cond", "ln1s", "ln1b", "wqkv", "ln2s", "ln2b", "wq",
             "wkv", "ln3s", "ln3b", "w1", "b1", "dw", "dwb", "w2", "b2"]
    for name, w, g in zip(names, want, got):
        assert g.shape == w.shape, (name, g.shape, w.shape)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-3, rtol=1e-2,
            err_msg=f"grad mismatch: {name}")


def test_model_with_layer_vjp_matches_standard():
    from dataclasses import asdict
    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                         noise_embed_dims=64)
    m_std = Denoiser(**asdict(cfg))
    m_fus = Denoiser(**asdict(cfg), fused_layer_vjp=True)
    params = init_denoiser_params(m_std, cfg)
    params_f = init_denoiser_params(m_fus, cfg)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_f)

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), dtype=jnp.float32)
    nl = jnp.asarray(rng.uniform(0.1, 0.9, (2, 1)), dtype=jnp.float32)
    lb = jnp.asarray(rng.standard_normal((2, 768)), dtype=jnp.float32)

    def loss(m):
        return lambda p: jnp.mean(m.apply({"params": p}, x, nl, lb) ** 2)

    l_std, g_std = jax.value_and_grad(loss(m_std))(params)
    l_fus, g_fus = jax.value_and_grad(loss(m_fus))(params)
    np.testing.assert_allclose(float(l_fus), float(l_std), rtol=1e-4)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_std),
            jax.tree_util.tree_leaves_with_path(g_fus)):
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-2,
            err_msg=f"grad mismatch at {name}")


def test_layer_vjp_degrades_beyond_token_limit():
    """fused_layer_vjp=True above FUSED_LAYER_MAX_TOKENS must degrade to
    fused-MLP + XLA attention (the configuration measured to compile at
    512px) and still match the standard model's gradients. 40px latents /
    patch 2 -> 400 tokens > 256."""
    from dataclasses import asdict
    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig(image_size=40, embed_dim=64, n_layers=1,
                         noise_embed_dims=64)
    m_std = Denoiser(**asdict(cfg))
    m_fus = Denoiser(**asdict(cfg), fused_layer_vjp=True)
    params = init_denoiser_params(m_std, cfg)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        init_denoiser_params(m_fus, cfg))

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 4, 40, 40)), dtype=jnp.float32)
    nl = jnp.asarray(rng.uniform(0.1, 0.9, (1, 1)), dtype=jnp.float32)
    lb = jnp.asarray(rng.standard_normal((1, 768)), dtype=jnp.float32)

    def loss(m):
        return lambda p: jnp.mean(m.apply({"params": p}, x, nl, lb) ** 2)

    l_std, g_std = jax.value_and_grad(loss(m_std))(params)
    l_fus, g_fus = jax.value_and_grad(loss(m_fus))(params)
    np.testing.assert_allclose(float(l_fus), float(l_std), rtol=1e-4)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_std),
            jax.tree_util.tree_leaves_with_path(g_fus)):
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-2,
            err_msg=f"grad mismatch at {name}")
