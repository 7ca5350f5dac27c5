"""Sequence-parallel attention == single-device attention (on the
8-virtual-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from transformer_latent_diffusion_tpu.ops.attention import multi_head_attention
from transformer_latent_diffusion_tpu.parallel import create_mesh
from transformer_latent_diffusion_tpu.parallel.sequence import (
    sequence_parallel_attention,
    shard_sequence,
)


def test_sequence_parallel_matches_single_device():
    mesh = create_mesh((1, 8))
    rng = np.random.default_rng(0)
    b, n, d, heads = 2, 64, 128, 2
    q = jnp.asarray(rng.standard_normal((b, n, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, d)), dtype=jnp.float32)

    want = multi_head_attention(q, k, v, heads)

    qs = shard_sequence(q, mesh)
    ks = shard_sequence(k, mesh)
    vs = shard_sequence(v, mesh)
    got = jax.jit(
        lambda a, b_, c: sequence_parallel_attention(a, b_, c, heads, mesh)
    )(qs, ks, vs)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # output stays sequence-sharded across the 8 devices
    assert len(got.addressable_shards) == 8
