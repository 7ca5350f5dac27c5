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


def test_denoiser_with_seq_mesh_matches_dense():
    """The model-path integration: Denoiser(seq_mesh=...) must equal the
    dense single-device forward (same params, same inputs)."""
    from dataclasses import asdict

    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig(image_size=16, embed_dim=128, n_layers=2,
                         noise_embed_dims=64)  # 64 tokens, 2 heads
    mesh = create_mesh((2, 4))
    dense = Denoiser(**asdict(cfg))
    seqp = Denoiser(**asdict(cfg), seq_mesh=mesh)
    params = init_denoiser_params(dense, cfg)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 4, 16, 16)), jnp.float32)
    nl = jnp.full((4, 1), 0.5, jnp.float32)
    lab = jnp.asarray(rng.standard_normal((4, 768)), jnp.float32)

    want = dense.apply({"params": params}, x, nl, lab)
    got = jax.jit(
        lambda p, x, n, l: seqp.apply({"params": p}, x, n, l)
    )(params, x, nl, lab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_train_step_sequence_parallel(tmp_path):
    """train.main with sequence_parallel=True on a (2,4) mesh: the knob
    is reachable from TrainConfig and the loss matches the dense run."""
    from transformer_latent_diffusion_tpu.configs import (
        DataConfig,
        DenoiserConfig,
        ModelConfig,
        TrainConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.train import main

    rng = np.random.default_rng(0)
    lp, tp, vp = (str(tmp_path / f)
                  for f in ("latents.npy", "text_emb.npy", "val_emb.npy"))
    np.save(lp, rng.standard_normal((32, 4, 16, 16)).astype(np.float32))
    np.save(tp, rng.standard_normal((32, 768)).astype(np.float32))
    np.save(vp, rng.standard_normal((8, 768)).astype(np.float32))

    def cfg(seq_par):
        return ModelConfig(
            data_config=DataConfig(latent_path=lp, text_emb_path=tp,
                                   val_path=vp),
            denoiser_config=DenoiserConfig(image_size=16, embed_dim=128,
                                           n_layers=2, noise_embed_dims=64),
            train_config=TrainConfig(
                n_epoch=1, batch_size=16, save_model=False, use_wandb=False,
                save_and_eval_every_iters=10**9, mesh_shape=(2, 4),
                sequence_parallel=seq_par, compute_dtype="float32",
                checkpoint_dir=str(tmp_path / "ckpts")),
            vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
        )

    r_seq = main(cfg(True))
    r_dense = main(cfg(False))
    np.testing.assert_allclose(r_seq["losses"], r_dense["losses"],
                               atol=1e-5, rtol=1e-5)
