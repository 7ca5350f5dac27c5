"""Transformer building blocks (Flax linen), TPU-first.

Capability parity with the reference ops layer
(/root/reference/tld/transformer_blocks.py): sinusoidal noise embedding,
self/cross attention with fused QKV/KV projections, plain MLP, and the
LocalViT separable-conv MLP. Design differences from the reference:
tokens live in (B, N, D); the depthwise conv runs in NHWC (TPU-native
layout); attention dispatches to a Pallas kernel on TPU.
"""

from __future__ import annotations

import math
from typing import Any, Type, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from transformer_latent_diffusion_tpu.ops.attention import multi_head_attention

# torch.nn.GELU default is the exact (erf) form; match it.
_gelu = lambda x: jax.nn.gelu(x, approximate=False)  # noqa: E731
# torch LayerNorm eps
LN_EPS = 1e-5


def sinusoidal_embedding(
    x: jax.Array,
    embedding_dims: int = 32,
    emb_min_freq: float = 1.0,
    emb_max_freq: float = 1000.0,
) -> jax.Array:
    """Log-spaced sin/cos features of a scalar noise level.

    Parity: reference SinusoidalEmbedding (transformer_blocks.py:7-21).
    x: (..., 1) in (0, 1) -> (..., embedding_dims).
    """
    import numpy as np

    # The table is a static constant: build it in float64 on the host and
    # cast once (avoids f32 linspace/exp drift that the large frequencies
    # would amplify through sin/cos).
    freqs = np.exp(
        np.linspace(
            math.log(emb_min_freq), math.log(emb_max_freq), embedding_dims // 2
        )
    )
    angular_speeds = jnp.asarray(2.0 * np.pi * freqs, dtype=x.dtype)
    return jnp.concatenate(
        [jnp.sin(angular_speeds * x), jnp.cos(angular_speeds * x)], axis=-1
    )


class SelfAttention(nn.Module):
    """Fused-QKV self attention. Parity: transformer_blocks.py:51-59.

    seq_mesh: optional ('data','model') jax.sharding.Mesh — routes the
    attention through parallel.sequence.sequence_parallel_attention with
    the token dim sharded over the 'model' axis (long-grid 512/1024px
    training on multi-chip meshes; numerically identical to the dense
    path, tests/test_sequence_parallel.py)."""

    embed_dim: int
    n_heads: int = 4
    dropout_level: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32
    seq_mesh: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        qkv = nn.Dense(3 * self.embed_dim, use_bias=False, dtype=self.dtype,
                       name="qkv_linear")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # dropout on the attention PROBABILITIES, exactly like the
        # reference's torch SDPA dropout_p (transformer_blocks.py:37) —
        # not an output dropout. Train-only; keyed by the standard flax
        # 'dropout' rng collection.
        drop_rate, drop_rng = 0.0, None
        if self.dropout_level > 0 and not deterministic:
            drop_rate = self.dropout_level
            drop_rng = self.make_rng("dropout")
        mesh = self.seq_mesh
        if (mesh is not None and mesh.shape.get("model", 1) > 1
                and x.shape[1] % mesh.shape["model"] == 0):
            if drop_rate > 0:
                raise NotImplementedError(
                    "attention-probability dropout is not supported on "
                    "the sequence-parallel attention path; train with "
                    "dropout=0 or sequence_parallel=False")
            from transformer_latent_diffusion_tpu.parallel.sequence import (
                sequence_parallel_attention,
            )

            out = sequence_parallel_attention(q, k, v, self.n_heads, mesh)
        else:
            out = multi_head_attention(q, k, v, self.n_heads,
                                       use_pallas=self.use_pallas,
                                       dropout_rate=drop_rate,
                                       dropout_rng=drop_rng)
        return out


class CrossAttention(nn.Module):
    """Q from tokens, fused KV from the conditioning sequence.

    Parity: transformer_blocks.py:62-72. The conditioning sequence has
    length 2 (noise embedding + text embedding), so this is a small matmul;
    the XLA path is used regardless of the pallas flag.
    """

    embed_dim: int
    n_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        q = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                     name="q_linear")(x)
        kv = nn.Dense(2 * self.embed_dim, use_bias=False, dtype=self.dtype,
                      name="kv_linear")(y)
        k, v = jnp.split(kv, 2, axis=-1)
        return multi_head_attention(q, k, v, self.n_heads, use_pallas=False)


class MLP(nn.Module):
    """Linear -> GELU -> Linear -> Dropout. Parity: transformer_blocks.py:75-86."""

    embed_dim: int
    mlp_multiplier: int
    dropout_level: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.mlp_multiplier * self.embed_dim, dtype=self.dtype)(x)
        x = _gelu(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout_level)(x, deterministic=deterministic)


def depthwise_conv3x3(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """3x3 depthwise conv as 9 shifted FMAs (SAME padding), NHWC.

    TPU-first: a grouped `conv_general_dilated` lowers poorly (per-channel
    conv decomposition; pathological backward compile), while 9 shifted
    elementwise multiply-adds map directly onto the VPU and fuse with the
    surrounding GELU/matmul. kernel: (3, 3, 1, C) (flax Conv layout so
    converted torch weights drop in), bias: (C,).
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(x)
    for di in range(3):
        for dj in range(3):
            acc = acc + xp[:, di : di + h, dj : dj + w, :] * kernel[di, dj, 0]
    return acc + bias


class MLPSepConv(nn.Module):
    """LocalViT FFN: 1x1 conv -> 3x3 depthwise -> GELU -> 1x1 conv -> dropout.

    Parity: transformer_blocks.py:89-113. Tokens (B, N, D) are reshaped to
    an NHWC grid (TPU-native layout; the reference uses NCHW); assumes a
    square token grid like the reference.
    """

    embed_dim: int
    mlp_multiplier: int
    dropout_level: float
    dtype: jnp.dtype = jnp.float32
    # route through the fused differentiable Pallas op (ops/fused_mlp_vjp):
    # same math, hidden state stays in VMEM in both passes. Training-perf
    # feature; requires dropout_level == 0 (the reference's default).
    fused_vjp: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, d = x.shape
        hw = int(math.isqrt(n))
        hidden = self.mlp_multiplier * self.embed_dim

        if (self.fused_vjp and self.dropout_level == 0
                and hw * hw == n and n <= FUSED_MLP_MAX_TOKENS):
            from transformer_latent_diffusion_tpu.ops.fused_mlp_vjp import (
                fused_mlp_sepconv_vjp,
            )

            # materialize the SAME param tree as the unfused path (dummy
            # one-token calls create the Dense params; the dummy outputs
            # are unused and DCE'd by XLA)
            expand = nn.Dense(hidden, dtype=self.dtype, name="expand")
            contract = nn.Dense(self.embed_dim, dtype=self.dtype, name="contract")
            _ = expand(x[:, :1, :])
            _ = contract(jnp.zeros((1, 1, hidden), self.dtype))
            dw = self.param("depthwise_kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, hidden))
            dw_b = self.param("depthwise_bias", nn.initializers.zeros, (hidden,))
            ev = expand.variables["params"]
            cv = contract.variables["params"]
            dt = self.dtype
            out = fused_mlp_sepconv_vjp(
                x.astype(dt),
                ev["kernel"].astype(dt), ev["bias"].astype(jnp.float32),
                dw[:, :, 0, :].astype(dt), dw_b.astype(jnp.float32),
                cv["kernel"].astype(dt), cv["bias"].astype(jnp.float32),
                hw, jax.default_backend() == "cpu",
            )
            return out.astype(self.dtype)

        x = x.reshape(b, hw, hw, d)
        # 1x1 conv == Dense over the channel dim (maps onto the MXU directly)
        x = nn.Dense(hidden, dtype=self.dtype, name="expand")(x)
        dw = self.param(
            "depthwise_kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 1, hidden),
        )
        dw_b = self.param("depthwise_bias", nn.initializers.zeros, (hidden,))
        x = depthwise_conv3x3(x, dw.astype(self.dtype), dw_b.astype(self.dtype))
        x = _gelu(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="contract")(x)
        x = nn.Dropout(self.dropout_level)(x, deterministic=deterministic)
        return x.reshape(b, n, self.embed_dim)


MLPClass = Union[Type[MLP], Type[MLPSepConv]]

# Fused-VJP sequence-length limits, measured on v5e via
# scripts/probe_fused_highres.py: at 1024 tokens (512px) the full-layer
# and attention-pair BACKWARD kernels fail to compile (the stored
# per-head probabilities are 12 x (N, N) f32 = 50MB on top of the other
# residents), while the MLP VJP compiles and runs. 256 tokens (the 256px
# flagship) is the fully-verified regime. A fused_layer_vjp request
# beyond its limit degrades to fused-MLP + XLA attention automatically.
FUSED_LAYER_MAX_TOKENS = 256
FUSED_ATTN_MAX_TOKENS = 256
FUSED_MLP_MAX_TOKENS = 1024


class DecoderBlock(nn.Module):
    """Pre-LN DiT block: x += SA(LN x); x += CA(LN x, cond); x += MLP(LN x).

    Parity: transformer_blocks.py:116-139. Heads = embed_dim // 64;
    cross-attention dropout hardwired to 0 like the reference.
    """

    embed_dim: int
    mlp_multiplier: int
    dropout_level: float
    mlp_class: MLPClass = MLPSepConv
    use_pallas: bool = False
    fused_mlp_vjp: bool = False
    fused_attn_vjp: bool = False
    fused_layer_vjp: bool = False
    dtype: jnp.dtype = jnp.float32
    # sequence parallelism (see SelfAttention.seq_mesh). Mutually
    # exclusive with the fused Pallas kernels (not GSPMD-partitionable).
    seq_mesh: Any = None
    # MoE knobs (only read when mlp_class is MoEMLP; see models/moe.py)
    n_experts: int = 8
    expert_capacity_factor: float = 1.25
    ep_mesh: Any = None

    @nn.compact
    def __call__(self, x, y, deterministic: bool = True):
        n_heads = self.embed_dim // 64
        n_tokens = x.shape[1]
        square = int(math.isqrt(n_tokens)) ** 2 == n_tokens
        use_layer = (self.fused_layer_vjp and self.dropout_level == 0
                     and self.mlp_class is MLPSepConv and square
                     and self.seq_mesh is None
                     and n_tokens <= FUSED_LAYER_MAX_TOKENS)
        # beyond the full-layer limit, degrade to the component fused ops
        # within their own measured limits
        want_attn = self.fused_attn_vjp or (self.fused_layer_vjp
                                            and not use_layer)
        use_attn = (want_attn and self.dropout_level == 0
                    and self.seq_mesh is None
                    and n_tokens <= FUSED_ATTN_MAX_TOKENS)
        want_mlp = self.fused_mlp_vjp or (self.fused_layer_vjp
                                          and not use_layer)
        use_mlp = (want_mlp and square and n_tokens <= FUSED_MLP_MAX_TOKENS)
        if use_layer:
            from transformer_latent_diffusion_tpu.ops.fused_layer_vjp import (
                fused_layer_vjp,
            )

            hidden = self.mlp_multiplier * self.embed_dim
            hw = int(math.isqrt(x.shape[1]))
            norm1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")
            sa = SelfAttention(self.embed_dim, n_heads, 0.0, dtype=self.dtype,
                               name="self_attention")
            norm2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")
            ca = CrossAttention(self.embed_dim, n_heads, dtype=self.dtype,
                                name="cross_attention")
            norm3 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm3")
            mlp = MLPSepConv(self.embed_dim, self.mlp_multiplier, 0.0,
                             dtype=self.dtype, name="mlp")
            # one-token dummy calls materialize the standard param tree
            _ = sa(norm1(x[:, :1]))
            _ = ca(norm2(x[:, :1]), y)
            _ = mlp(norm3(x[:, :4]))  # 2x2 grid dummy for the conv path
            n1 = norm1.variables["params"]
            n2 = norm2.variables["params"]
            n3 = norm3.variables["params"]
            mv = mlp.variables["params"]
            dt = self.dtype
            f32 = jnp.float32
            return fused_layer_vjp(
                x.astype(dt), y.astype(dt),
                n1["scale"].astype(f32), n1["bias"].astype(f32),
                sa.variables["params"]["qkv_linear"]["kernel"].astype(dt),
                n2["scale"].astype(f32), n2["bias"].astype(f32),
                ca.variables["params"]["q_linear"]["kernel"].astype(dt),
                ca.variables["params"]["kv_linear"]["kernel"].astype(dt),
                n3["scale"].astype(f32), n3["bias"].astype(f32),
                mv["expand"]["kernel"].astype(dt),
                mv["expand"]["bias"].astype(f32),
                mv["depthwise_kernel"][:, :, 0, :].astype(dt),
                mv["depthwise_bias"].astype(f32),
                mv["contract"]["kernel"].astype(dt),
                mv["contract"]["bias"].astype(f32),
                n_heads, hw, jax.default_backend() == "cpu",
            ).astype(self.dtype)
        if use_attn:
            from transformer_latent_diffusion_tpu.ops.fused_attn_vjp import (
                fused_attention_pair_vjp,
            )

            # materialize the SAME param tree as the unfused path via
            # one-token dummy calls (outputs unused -> DCE'd)
            norm1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")
            sa = SelfAttention(self.embed_dim, n_heads, 0.0, dtype=self.dtype,
                               name="self_attention")
            norm2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")
            ca = CrossAttention(self.embed_dim, n_heads, dtype=self.dtype,
                                name="cross_attention")
            _ = sa(norm1(x[:, :1]))
            _ = ca(norm2(x[:, :1]), y)
            n1 = norm1.variables["params"]
            n2 = norm2.variables["params"]
            wqkv = sa.variables["params"]["qkv_linear"]["kernel"]
            wq = ca.variables["params"]["q_linear"]["kernel"]
            wkv = ca.variables["params"]["kv_linear"]["kernel"]
            dt = self.dtype
            x = fused_attention_pair_vjp(
                x.astype(dt), y.astype(dt),
                n1["scale"].astype(jnp.float32), n1["bias"].astype(jnp.float32),
                wqkv.astype(dt),
                n2["scale"].astype(jnp.float32), n2["bias"].astype(jnp.float32),
                wq.astype(dt), wkv.astype(dt),
                n_heads, jax.default_backend() == "cpu",
            ).astype(self.dtype)
        else:
            x = x + SelfAttention(
                self.embed_dim, n_heads, self.dropout_level,
                use_pallas=self.use_pallas, dtype=self.dtype,
                seq_mesh=self.seq_mesh, name="self_attention",
            )(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x),
              deterministic=deterministic)
            x = x + CrossAttention(
                self.embed_dim, n_heads, dtype=self.dtype, name="cross_attention",
            )(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x), y)
        mlp_kwargs = {}
        if self.mlp_class is MLPSepConv:
            mlp_kwargs["fused_vjp"] = use_mlp
        elif self.mlp_class.__name__ == "MoEMLP":
            mlp_kwargs.update(n_experts=self.n_experts,
                              capacity_factor=self.expert_capacity_factor,
                              ep_mesh=self.ep_mesh)
        x = x + self.mlp_class(
            self.embed_dim, self.mlp_multiplier, self.dropout_level,
            dtype=self.dtype, name="mlp", **mlp_kwargs,
        )(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm3")(x),
          deterministic=deterministic)
        return x
