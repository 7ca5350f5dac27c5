"""Mixture-of-Experts FFN with expert parallelism (beyond reference).

The reference's FFN is dense (MLP / MLPSepConv, transformer_blocks.py:75-113)
and its parallelism inventory has no expert parallelism (SURVEY.md §2 —
"explicitly absent"). This adds a Switch-Transformer-style top-1-routed
MoE as a third selectable `mlp_class` ("moe" in DenoiserConfig), completing
the dp/tp/sp/pp/ep axis set.

TPU-first design (GShard/Switch dense-dispatch):
- Static shapes everywhere: capacity C = ceil(S/E * capacity_factor) is
  computed from static dims; routing is one-hot einsums, not gather/scatter,
  so every op is a batched GEMM on the MXU and the whole thing is
  GSPMD-partitionable.
- Expert parallelism: expert weights are stacked with a leading E axis
  sharded over the mesh 'model' axis (parallel/mesh.py rule on '/moe_mlp/');
  the dispatched (E, B, C, D) tensor is sharding-constrained onto the same
  axis, and XLA inserts the all-to-alls over ICI. Single-device / no-mesh
  runs are the identical program with the constraints elided.
- Tokens over capacity are dropped (output 0) and ride the DecoderBlock
  residual — the standard Switch behaviour.
- Router runs in float32 (softmax stability); expert GEMMs in the model
  compute dtype (bf16 on TPU).

The load-balancing auxiliary loss (Switch eq. 4: E * sum_e f_e * p_e) is
sown into the 'losses' collection; train/train.py adds it to the MSE with
weight TrainConfig.moe_aux_weight when mlp_class == "moe". Under a plain
(immutable) apply the sow is a no-op.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

# NB: the axis name matches parallel.mesh.MODEL_AXIS; importing it here
# would be circular (parallel/__init__ -> pipeline -> models.denoiser ->
# models.moe)
MODEL_AXIS = "model"

_expert_init = nn.initializers.variance_scaling(
    1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1, batch_axis=(0,)
)


class MoEMLP(nn.Module):
    """Top-1-routed MoE FFN: router -> dispatch -> per-expert Dense/GELU/Dense.

    Drop-in for MLP/MLPSepConv in DecoderBlock (same (x, deterministic)
    call signature, same (B, S, D) -> (B, S, D) shape).
    """

    embed_dim: int
    mlp_multiplier: int
    dropout_level: float
    dtype: jnp.dtype = jnp.float32
    n_experts: int = 8
    capacity_factor: float = 1.25
    # mesh for expert parallelism: experts sharded over 'model'. None =
    # no constraint (single device or replicated).
    ep_mesh: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, s, d = x.shape
        e = self.n_experts
        h = self.mlp_multiplier * self.embed_dim
        c = max(1, int(math.ceil(s * self.capacity_factor / e)))

        # --- router (f32 for softmax stability) ---
        logits = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                          name="router")(x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # (B, S, E)
        gate = jnp.max(probs, axis=-1)  # (B, S)
        idx = jnp.argmax(probs, axis=-1)  # (B, S)
        mask = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # (B, S, E)

        # load-balancing aux loss (Switch eq. 4); mean over the batch
        f_e = jnp.mean(mask, axis=(0, 1))  # fraction routed per expert
        p_e = jnp.mean(probs, axis=(0, 1))  # mean router prob per expert
        self.sow("losses", "moe_aux", e * jnp.sum(f_e * p_e))
        # observability (scripts/probe_moe.py): per-expert routed
        # fraction, in its OWN collection — train.py sums every leaf of
        # 'losses' into the objective, this must stay out of it
        self.sow("moe_metrics", "load", f_e)

        # --- capacity assignment: position of each token in its expert ---
        pos = jnp.cumsum(mask, axis=1) * mask  # 1-based, 0 where unrouted
        keep = (pos > 0) & (pos <= c)
        # (B, S, E, C) one-hot dispatch; over-capacity tokens drop out
        dispatch = (jax.nn.one_hot((pos - 1).astype(jnp.int32), c,
                                   dtype=jnp.float32)
                    * keep[..., None].astype(jnp.float32))
        combine = gate[:, :, None, None] * dispatch

        dt = self.dtype
        wi = self.param("wi", _expert_init, (e, d, h))
        bi = self.param("bi", nn.initializers.zeros, (e, h))
        wo = self.param("wo", _expert_init, (e, h, d))
        bo = self.param("bo", nn.initializers.zeros, (e, d))

        # dispatch tokens to expert buffers: (E, B, C, D)
        xin = jnp.einsum("bsec,bsd->ebcd", dispatch.astype(dt), x.astype(dt))
        if self.ep_mesh is not None:
            ep = NamedSharding(self.ep_mesh, P(MODEL_AXIS))
            xin = jax.lax.with_sharding_constraint(xin, ep)
        hid = jnp.einsum("ebcd,edh->ebch", xin, wi.astype(dt))
        hid = nn.gelu(hid + bi.astype(dt)[:, None, None, :])
        out = jnp.einsum("ebch,ehd->ebcd", hid, wo.astype(dt))
        out = out + bo.astype(dt)[:, None, None, :]
        if self.ep_mesh is not None:
            out = jax.lax.with_sharding_constraint(out, ep)
        # combine back to token order; dropped tokens get 0 (residual
        # passthrough in DecoderBlock)
        y = jnp.einsum("bsec,ebcd->bsd", combine.astype(dt), out)
        y = nn.Dropout(self.dropout_level)(y, deterministic=deterministic)
        return y.astype(self.dtype)
