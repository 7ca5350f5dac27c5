"""Gradient parity: fused attention-pair fwd/bwd vs jax.grad of the jnp
reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from transformer_latent_diffusion_tpu.ops.attention import multi_head_attention
from transformer_latent_diffusion_tpu.ops.fused_attn_vjp import (
    fused_attention_pair_vjp,
)

B, N, D, H = 2, 16, 64, 2
LN_EPS = 1e-5


def _ln(x, s, b):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + LN_EPS) * s + b


def _ref(x, cond, ln1s, ln1b, wqkv, ln2s, ln2b, wq, wkv):
    xn1 = _ln(x, ln1s, ln1b)
    qkv = xn1 @ wqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    x1 = x + multi_head_attention(q, k, v, H)
    xn2 = _ln(x1, ln2s, ln2b)
    qc = xn2 @ wq
    kv = cond @ wkv
    kc, vc = jnp.split(kv, 2, axis=-1)
    return x1 + multi_head_attention(qc, kc, vc, H)


def _random_args(seed=0):
    rng = np.random.default_rng(seed)
    def arr(*s, scale=0.3):
        return jnp.asarray(rng.standard_normal(s) * scale, dtype=jnp.float32)
    return (arr(B, N, D), arr(B, 2, D), arr(D, scale=1) * 0 + 1.0, arr(D),
            arr(D, 3 * D), arr(D) * 0 + 1.0, arr(D), arr(D, D), arr(D, 2 * D))


def test_forward_matches_reference():
    args = _random_args()
    want = _ref(*args)
    got = fused_attention_pair_vjp(*args, H, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_gradients_match_reference():
    args = _random_args(1)

    def loss_ref(*a):
        return jnp.mean(jnp.sin(_ref(*a)))

    def loss_fused(*a):
        return jnp.mean(jnp.sin(fused_attention_pair_vjp(*a, H, True)))

    want = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    got = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)

    names = ["x", "cond", "ln1s", "ln1b", "wqkv", "ln2s", "ln2b", "wq", "wkv"]
    for name, w, g in zip(names, want, got):
        assert g.shape == w.shape, (name, g.shape, w.shape)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch: {name}")


def test_weight_grads_accumulate_over_batch():
    args = _random_args(2)

    def loss(*a):
        return jnp.sum(fused_attention_pair_vjp(*a, H, True))

    g_full = jax.grad(loss, argnums=4)(*args)  # dWqkv
    per = []
    for b in range(B):
        sub = (args[0][b:b + 1], args[1][b:b + 1]) + args[2:]
        per.append(jax.grad(loss, argnums=4)(*sub))
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(sum(per)),
                               atol=1e-3, rtol=1e-3)


def test_model_with_both_fused_vjps_matches_standard():
    """Denoiser(fused_attn_vjp=True, fused_mlp_vjp=True) reproduces the
    standard path's loss, grads and param tree (f32, interpret)."""
    from dataclasses import asdict
    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                         noise_embed_dims=64)
    m_std = Denoiser(**asdict(cfg))
    m_fus = Denoiser(**asdict(cfg), fused_mlp_vjp=True, fused_attn_vjp=True)
    params = init_denoiser_params(m_std, cfg)
    params_f = init_denoiser_params(m_fus, cfg)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_f)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), dtype=jnp.float32)
    nl = jnp.asarray(rng.uniform(0.1, 0.9, (2, 1)), dtype=jnp.float32)
    lb = jnp.asarray(rng.standard_normal((2, 768)), dtype=jnp.float32)

    def loss(m):
        def f(p):
            return jnp.mean(m.apply({"params": p}, x, nl, lb) ** 2)
        return f

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


def test_chunked_attention_backward_matches_xla():
    """The flash-style chunked backward (used for >=2048-token training)
    must match jax.grad of the one-shot XLA attention."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformer_latent_diffusion_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    shape = (2, 3, 64, 16)  # (B, H, N, Dh); N divisible by the chunk
    q, k, v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
               for _ in range(3))

    def loss_ref(q, k, v):
        return jnp.sum(A._xla_attention(q, k, v) ** 2)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = A._chunked_attention_bwd(
        q, k, v,
        2.0 * A._xla_attention(q, k, v),  # d(sum(out^2))/d out
        q_chunk=16)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    # the custom-vjp route picks the chunked path above the threshold
    old = A._BWD_ONE_SHOT_MAX_P_BYTES
    A._BWD_ONE_SHOT_MAX_P_BYTES = 1
    old_chunk = A._BWD_Q_CHUNK
    A._BWD_Q_CHUNK = 16
    try:
        def loss_core(q, k, v):
            return jnp.sum(A._attention_core(q, k, v) ** 2)

        got2 = jax.grad(loss_core, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(got2, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)
    finally:
        A._BWD_ONE_SHOT_MAX_P_BYTES = old
        A._BWD_Q_CHUNK = old_chunk


def test_pallas_attention_backward_matches_xla():
    """The one-program-per-(batch,head) Pallas backward (interpret mode
    on CPU) must match jax.grad of the XLA attention."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformer_latent_diffusion_tpu.ops import attention as A

    rng = np.random.default_rng(1)
    shape = (2, 2, 32, 16)
    q, k, v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
               for _ in range(3))

    def loss_ref(q, k, v):
        return jnp.sum(A._xla_attention(q, k, v) ** 2)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = A._pallas_attention_bwd(q, k, v, 2.0 * A._xla_attention(q, k, v),
                                  interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_pallas_attention_backward_tiled_matches_xla():
    """Tiled (long-sequence) Pallas backward in interpret mode vs
    jax.grad of the XLA attention."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformer_latent_diffusion_tpu.ops import attention as A

    rng = np.random.default_rng(2)
    shape = (1, 2, 64, 16)
    q, k, v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
               for _ in range(3))

    def loss_ref(q, k, v):
        return jnp.sum(A._xla_attention(q, k, v) ** 2)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = A._pallas_attention_bwd_tiled(
        q, k, v, 2.0 * A._xla_attention(q, k, v), q_block=16,
        interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
