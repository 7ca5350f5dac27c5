"""Pipeline parallelism (GPipe) over the decoder-block stack.

No reference equivalent — the reference's distributed story is DDP only
(/root/reference/tld/train.py:69,109). This is the TPU-native 'pp' in
the dp/tp/sp/pp parallelism inventory.

Design: the mesh 'model' axis doubles as the pipeline-stage axis
(S = mesh.shape['model']). The n_layers DecoderBlock param subtrees are
stacked into leaves with a leading layer axis sharded over 'model', so
each device holds only its own layers [s*L/S, (s+1)*L/S) —
weight-resident pipeline stages. The batch splits into M microbatches;
a `lax.scan` over M+S-1 ticks runs the classic GPipe schedule with
`lax.ppermute` passing activations stage -> stage over ICI inside one
`shard_map`. There are no stale weights (one optimizer step per batch),
so outputs AND gradients are mathematically identical to sequential
execution — tested against the plain model. Composes with data
parallelism over the 'data' axis (batch sharded, grads all-reduced by
GSPMD outside the shard_map region).

The embed/head (patchify, projections, pos table, out_proj) and the
conditioning path are tiny (<1% of FLOPs) and run replicated on every
stage, avoiding a separate first/last-stage special case.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from transformer_latent_diffusion_tpu.models.blocks import (
    LN_EPS,
    DecoderBlock,
    MLPSepConv,
    _gelu,
    sinusoidal_embedding,
)
from transformer_latent_diffusion_tpu.models.denoiser import (
    patchify,
    unpatchify,
)
from transformer_latent_diffusion_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
)


def split_block_params(params, n_layers: int):
    """Standard Denoiser param tree -> (outer, stacked_blocks).

    stacked_blocks leaves carry a leading (n_layers, ...) axis; `outer`
    is the tree with the decoder_block_i subtrees removed.
    """
    tb = dict(params["denoiser_trans_block"])
    blocks = [tb.pop(f"decoder_block_{i}") for i in range(n_layers)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)
    outer = dict(params)
    outer["denoiser_trans_block"] = tb
    return outer, stacked


def merge_block_params(outer, stacked, n_layers: int):
    """Inverse of split_block_params."""
    tb = dict(outer["denoiser_trans_block"])
    for i in range(n_layers):
        tb[f"decoder_block_{i}"] = jax.tree.map(lambda l: l[i], stacked)
    out = dict(outer)
    out["denoiser_trans_block"] = tb
    return out


def stacked_block_shardings(stacked, mesh):
    """Layer axis over 'model': each device holds its stage's weights."""

    def one(leaf):
        if leaf.shape[0] % mesh.shape[MODEL_AXIS] == 0:
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(one, stacked)


class PipelinedDenoiser:
    """Denoiser forward with the decoder stack GPipe-pipelined.

    Same math/signature as `Denoiser.apply({'params': params}, x,
    noise_level, label)` (deterministic; requires dropout == 0), but the
    blocks run as S pipeline stages over the mesh 'model' axis.

    cfg: DenoiserConfig-like (image_size, patch_size, embed_dim,
    n_layers, noise_embed_dims, mlp_multiplier, n_channels).
    n_microbatches: GPipe microbatch count M (default 2*S — bubble
    fraction (S-1)/(M+S-1)).
    """

    def __init__(self, cfg, mesh, n_microbatches: Optional[int] = None,
                 dtype: Any = jnp.float32):
        self.cfg = cfg
        self.mesh = mesh
        self.S = mesh.shape[MODEL_AXIS]
        self.M = int(n_microbatches or 2 * self.S)
        self.dtype = dtype
        assert cfg.n_layers % self.S == 0, (
            f"n_layers {cfg.n_layers} must divide into {self.S} stages")
        assert getattr(cfg, "dropout", 0) == 0, "pipeline needs dropout=0"
        assert getattr(cfg, "mlp_class", "sep_conv") == "sep_conv", (
            "pipeline stages assume the dense sep_conv FFN")
        self.block = DecoderBlock(
            embed_dim=cfg.embed_dim, mlp_multiplier=cfg.mlp_multiplier,
            dropout_level=0.0, mlp_class=MLPSepConv, dtype=dtype)

    # -- functional twins of the outer (non-block) linen layers; their
    # -- exactness vs Denoiser is pinned by the equality tests
    def _dense(self, p, x):
        dt = self.dtype
        return x.astype(dt) @ p["kernel"].astype(dt) + p["bias"].astype(dt)

    def _ln(self, p, x):
        # flax LayerNorm's fast-variance form: var = E[x^2] - E[x]^2
        x = x.astype(self.dtype)
        mean = jnp.mean(x, -1, keepdims=True)
        mean2 = jnp.mean(x * x, -1, keepdims=True)
        var = jnp.maximum(0.0, mean2 - mean * mean)
        y = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
        return y * p["scale"].astype(self.dtype) + p["bias"].astype(self.dtype)

    def __call__(self, params, x, noise_level, label):
        """Standard (per-layer-named) param tree entry point.

        Stacks the block subtrees under jit and constrains them onto the
        stage axis; for weight-resident training keep the stacked tree
        as the canonical state and call `apply_stacked` directly.
        """
        outer, stacked = split_block_params(params, self.cfg.n_layers)
        stacked = jax.lax.with_sharding_constraint(
            stacked, stacked_block_shardings(stacked, self.mesh))
        return self.apply_stacked(outer, stacked, x, noise_level, label)

    def apply_stacked(self, outer, stacked, x, noise_level, label):
        cfg = self.cfg
        dt = self.dtype

        # conditioning path (Denoiser.__call__, models/denoiser.py)
        nemb = sinusoidal_embedding(noise_level.astype(dt),
                                    cfg.noise_embed_dims)
        nemb = self._dense(outer["fourier_dense1"], nemb)
        nemb = self._dense(outer["fourier_dense2"], _gelu(nemb))
        lemb = self._dense(outer["label_proj"], label)
        cond = jnp.stack([nemb, lemb], axis=1)
        cond = self._ln(outer["cond_norm"], cond)

        # patchify + embed (DenoiserTransBlock)
        p_sz = cfg.patch_size
        h = w = x.shape[2] // p_sz
        tb = outer["denoiser_trans_block"]
        tokens = patchify(x, p_sz).astype(dt)
        tokens = self._ln(tb["patch_norm1"],
                          self._dense(tb["patch_proj"], tokens))
        tokens = self._ln(tb["patch_norm2"],
                          self._dense(tb["embed_proj"], tokens))
        pos = jax.lax.slice_in_dim(tb["pos_embed"], 0, h * w, axis=0)
        tokens = tokens + pos.astype(dt)[None, :, :]

        tokens = self._gpipe(stacked, tokens, cond)

        out = self._dense(tb["out_proj"], tokens).astype(jnp.float32)
        return unpatchify(out, p_sz, h, w, cfg.n_channels)

    def _gpipe(self, stacked, tokens, cond):
        S, M, mesh = self.S, self.M, self.mesh
        B = tokens.shape[0]
        dp = mesh.shape[DATA_AXIS]
        assert B % (M * dp) == 0, (
            f"batch {B} must divide into {M} microbatches x {dp} DP shards")
        block = self.block

        def stage_apply(blocks_local, tok, cnd):
            # apply this stage's L/S layers in order
            def one(t, layer_params):
                return block.apply({"params": layer_params}, t, cnd,
                                   True), None

            tok, _ = jax.lax.scan(one, tok, blocks_local)
            return tok

        def per_device(blocks_local, mb_tok, mb_cond):
            s = jax.lax.axis_index(MODEL_AXIS)
            n_ticks = M + S - 1
            act0 = jnp.zeros_like(mb_tok[0])
            outs0 = jnp.zeros_like(mb_tok)

            def tick(carry, t):
                act, outs = carry
                m = t - s  # microbatch this stage works on at tick t
                mi = jnp.clip(m, 0, M - 1)
                ingest = jax.lax.dynamic_index_in_dim(mb_tok, mi, 0,
                                                      keepdims=False)
                tok_in = jnp.where(s == 0, ingest, act)
                cnd = jax.lax.dynamic_index_in_dim(mb_cond, mi, 0,
                                                   keepdims=False)
                y = stage_apply(blocks_local, tok_in, cnd)
                # last stage banks microbatch m's result (when in range;
                # out-of-range ticks are pipeline bubble)
                valid = jnp.logical_and(
                    s == S - 1, jnp.logical_and(m >= 0, m < M))
                old = jax.lax.dynamic_index_in_dim(outs, mi, 0,
                                                   keepdims=False)
                outs = jax.lax.dynamic_update_index_in_dim(
                    outs, jnp.where(valid, y, old), mi, 0)
                # hand the activation to the next stage over ICI
                # (stage 0 receives zeros — it ingests from mb_tok)
                act_next = jax.lax.ppermute(
                    y, MODEL_AXIS, [(i, i + 1) for i in range(S - 1)])
                return (act_next, outs), None

            (_, outs), _ = jax.lax.scan(tick, (act0, outs0),
                                        jnp.arange(n_ticks))
            # broadcast the last stage's results to every stage
            outs = jnp.where(s == S - 1, outs, jnp.zeros_like(outs))
            return jax.lax.psum(outs, MODEL_AXIS)

        mb_tok = tokens.reshape(M, B // M, *tokens.shape[1:])
        mb_cond = cond.reshape(M, B // M, *cond.shape[1:])
        out = shard_map(
            per_device, mesh=mesh,
            in_specs=(P(MODEL_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS)),
            out_specs=P(None, DATA_AXIS),
            check_vma=False,
        )(stacked, mb_tok, mb_cond)
        return out.reshape(B, *tokens.shape[1:])
