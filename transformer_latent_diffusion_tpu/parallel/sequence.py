"""Sequence (context) parallelism for long-token-grid attention.

The reference is strictly single-device; its longest sequence is 4096
tokens (1024px latents, README.md:22-26). This module adds
sequence-sharded attention over the mesh 'model' axis for that regime and
beyond: Q/K/V are computed on sequence shards, K/V are all-gathered over
ICI (at 4096 tokens the K/V volume is small; a ring schedule is
unnecessary), and each shard computes attention for its own query rows.

Implemented with `shard_map` so XLA places the collectives; numerically
identical to single-device attention (tests/test_sequence_parallel.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from transformer_latent_diffusion_tpu.parallel.mesh import MODEL_AXIS


def _local_attention(q, k, v, n_heads: int):
    b, nq, d = q.shape
    nk = k.shape[1]
    dh = d // n_heads
    qh = q.reshape(b, nq, n_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, n_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, n_heads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, d)


def sequence_parallel_attention(q, k, v, n_heads: int, mesh: Mesh,
                                axis: str = MODEL_AXIS):
    """Self-attention with the sequence dim sharded over `axis`.

    q/k/v: (B, N, D) with N divisible by the axis size. Each shard holds
    N/s query rows; K/V shards are all-gathered (XLA collective over ICI)
    and attention is computed for local queries only.
    """

    def shard_fn(q_l, k_l, v_l):
        k_full = jax.lax.all_gather(k_l, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_l, axis, axis=1, tiled=True)
        return _local_attention(q_l, k_full, v_full, n_heads)

    spec = P(None, axis, None)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def shard_sequence(x, mesh: Mesh, axis: str = MODEL_AXIS):
    """Place (B, N, ...) with the token dim sharded over `axis`."""
    ndim = x.ndim
    return jax.device_put(
        x, NamedSharding(mesh, P(None, axis, *([None] * (ndim - 2)))))
