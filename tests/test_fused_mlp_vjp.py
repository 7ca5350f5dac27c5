"""Gradient parity: fused Pallas MLP fwd/bwd vs jax.grad of the jnp
reference implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from transformer_latent_diffusion_tpu.models.blocks import (
    _gelu,
    depthwise_conv3x3,
)
from transformer_latent_diffusion_tpu.ops.fused_mlp_vjp import (
    fused_mlp_sepconv_vjp,
)

B, HW, D, HID = 2, 8, 64, 128
N = HW * HW


def _ref(x, w1, b1, dw, dwb, w2, b2):
    h = (x @ w1 + b1).reshape(B, HW, HW, HID)
    c = depthwise_conv3x3(h, dw.reshape(3, 3, 1, HID), dwb)
    a = _gelu(c).reshape(B, N, HID)
    return a @ w2 + b2


def _random_args(seed=0):
    rng = np.random.default_rng(seed)
    def arr(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.2, dtype=jnp.float32)
    return (arr(B, N, D), arr(D, HID), arr(HID), arr(3, 3, HID), arr(HID),
            arr(HID, D), arr(D))


def test_forward_matches_reference():
    args = _random_args()
    want = _ref(*args)
    got = fused_mlp_sepconv_vjp(*args, HW, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_gradients_match_reference():
    args = _random_args(1)

    def loss_ref(*a):
        return jnp.mean(jnp.sin(_ref(*a)))  # nonuniform cotangent

    def loss_fused(*a):
        return jnp.mean(jnp.sin(fused_mlp_sepconv_vjp(*a, HW, True)))

    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    got = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)

    names = ["x", "w1", "b1", "dw", "dwb", "w2", "b2"]
    for name, w, g in zip(names, want, got):
        assert g.shape == w.shape, name
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch: {name}")


def test_batch_accumulation_of_weight_grads():
    """Weight grads must sum over the batch grid (accumulated across
    pallas programs)."""
    args = _random_args(2)

    def loss(*a):
        return jnp.sum(fused_mlp_sepconv_vjp(*a, HW, True))

    g_full = jax.grad(loss, argnums=1)(*args)

    # gradient from each batch element separately must sum to the full one
    per_elem = []
    for b in range(B):
        sub = (args[0][b:b + 1],) + args[1:]
        per_elem.append(jax.grad(loss, argnums=1)(*sub))
    np.testing.assert_allclose(
        np.asarray(g_full), np.asarray(sum(per_elem)), atol=1e-3, rtol=1e-3)


def test_model_with_fused_vjp_matches_standard():
    """Denoiser(fused_mlp_vjp=True) must produce the same outputs, grads
    and param tree as the standard path (f32, interpret mode)."""
    from dataclasses import asdict
    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                         noise_embed_dims=64)
    m_std = Denoiser(**asdict(cfg))
    m_fus = Denoiser(**asdict(cfg), fused_mlp_vjp=True)
    params = init_denoiser_params(m_std, cfg)
    params_f = init_denoiser_params(m_fus, cfg)
    # identical param trees (names and shapes)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_f)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), dtype=jnp.float32)
    nl = jnp.asarray(rng.uniform(0.1, 0.9, (2, 1)), dtype=jnp.float32)
    lb = jnp.asarray(rng.standard_normal((2, 768)), dtype=jnp.float32)

    def loss(m):
        def f(p):
            out = m.apply({"params": p}, x, nl, lb)
            return jnp.mean(out ** 2)
        return f

    l_std, g_std = jax.value_and_grad(loss(m_std))(params)
    l_fus, g_fus = jax.value_and_grad(loss(m_fus))(params)
    np.testing.assert_allclose(float(l_fus), float(l_std), rtol=1e-4)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_std),
            jax.tree_util.tree_leaves_with_path(g_fus)):
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=5e-3,
            err_msg=f"grad mismatch at {name}")
