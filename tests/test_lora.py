"""LoRA adapter tests (train/lora.py) — beyond-reference capability.

Covers: zero-effect initialization, merge math, the lora_finetune loop
reached through train.main (frozen base, trained adapters, .npz
round-trip) and inference-time loading via DiffusionTransformer."""

import os
from dataclasses import asdict

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_training import SMALL_DENOISER, _model_cfg
from transformer_latent_diffusion_tpu.models.denoiser import Denoiser
from transformer_latent_diffusion_tpu.train.lora import (
    DEFAULT_TARGETS,
    count_lora_parameters,
    init_lora_params,
    load_lora_file,
    merge_lora,
    save_lora,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params


def _base_params(cfg=SMALL_DENOISER, seed=0):
    model = Denoiser(**asdict(cfg))
    return init_denoiser_params(model, cfg, seed=seed)


def test_lora_init_is_identity():
    """B = 0 at init -> merged params bit-equal to the base."""
    base = _base_params()
    lora = init_lora_params(base, rank=4)
    # 5 adapted kernels per decoder block (qkv, q, kv, expand, contract)
    assert len(lora) == 5 * SMALL_DENOISER.n_layers
    merged = merge_lora(base, lora, scale=1.0)
    for b, m in zip(jax.tree.leaves(base), jax.tree.leaves(merged)):
        assert jnp.array_equal(b, m)
    # tiny trainable footprint
    n_base = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(base))
    assert count_lora_parameters(lora) < 0.1 * n_base


def test_lora_merge_math():
    """merged kernel == W + scale * A @ B; untargeted leaves untouched."""
    base = _base_params()
    lora = init_lora_params(base, rank=2, seed=3)
    key = jax.random.PRNGKey(7)
    for p in lora:
        key, k = jax.random.split(key)
        lora[p]["b"] = jax.random.normal(k, lora[p]["b"].shape)
    scale = 0.5
    merged = merge_lora(base, lora, scale=scale)

    flat_b = {"/".join(str(k.key) for k in path): leaf
              for path, leaf in jax.tree_util.tree_flatten_with_path(base)[0]}
    flat_m = {"/".join(str(k.key) for k in path): leaf
              for path, leaf in jax.tree_util.tree_flatten_with_path(merged)[0]}
    n_adapted = 0
    for p, w in flat_b.items():
        if p in lora:
            want = w + scale * lora[p]["a"] @ lora[p]["b"]
            np.testing.assert_allclose(flat_m[p], want, atol=1e-6)
            n_adapted += 1
        else:
            assert jnp.array_equal(flat_m[p], w), p
    assert n_adapted == len(lora)
    assert all(any(p.endswith(t) for t in DEFAULT_TARGETS) for p in lora)


def test_lora_finetune(tmp_path):
    """train.main with lora_rank > 0: adapters train (B becomes
    nonzero), the base stays frozen, lora.npz round-trips."""
    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=SMALL_DENOISER, img_size=8,
                     n_epoch=4, batch_size=64, lr=1e-3,
                     lora_rank=2, save_model=True, model_name="lora_run")
    base = _base_params(seed=cfg.train_config.seed)
    result = main(cfg, init_params=base)
    assert result["global_step"] == 4
    assert all(np.isfinite(result["losses"]))
    # training moved the adapters off the zero-effect init
    b_norms = [float(jnp.abs(ab["b"]).max()) for ab in result["lora"].values()]
    assert max(b_norms) > 0.0
    # saved adapters reload to the same tree + scale
    path = result["lora_path"]
    assert path is not None and os.path.exists(path)
    lora, scale = load_lora_file(path)
    assert scale == result["scale"] == 1.0  # alpha defaults to rank
    assert set(lora) == set(result["lora"])
    for p in lora:
        np.testing.assert_allclose(lora[p]["b"], result["lora"][p]["b"],
                                   atol=1e-7)


def test_lora_finetune_val_loss(tmp_path):
    """val_holdout works in LoRA mode too: the held-out loss is
    evaluated on the debiased-EMA adapters and returned."""
    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=SMALL_DENOISER, img_size=8,
                     n_epoch=2, batch_size=16, lr=1e-3,
                     lora_rank=2, val_holdout=16,
                     save_and_eval_every_iters=3)
    base = _base_params(seed=cfg.train_config.seed)
    result = main(cfg, init_params=base)
    # 48 train examples (64 - 16) / 16 = 3 steps x 2 epochs
    assert result["global_step"] == 6
    vl = result["val_losses"]
    assert [s for s, _ in vl] == [3, 6]  # in-loop eval + final
    assert all(np.isfinite(v) for _, v in vl)


def test_lora_merge_rejects_unmatched_adapters():
    """Adapters trained for a different model config raise instead of
    silently no-oping (ADVICE r2)."""
    import pytest

    base = _base_params()
    lora = init_lora_params(base, rank=2)
    lora["decoder_block_999/mlp/expand/kernel"] = {
        "a": jnp.zeros((4, 2)), "b": jnp.zeros((2, 4))}
    with pytest.raises(ValueError, match="decoder_block_999"):
        merge_lora(base, lora)


def test_lora_ema_debias_and_raw(tmp_path):
    """A short adapter run must NOT save adapters down-weighted ~alpha^N
    toward the zero-effect init (ADVICE r2): the saved EMA is debiased
    and the raw last-step adapters ride along under raw:: keys."""
    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=SMALL_DENOISER, img_size=8,
                     n_epoch=4, batch_size=64, lr=1e-3,
                     lora_rank=2, save_model=True, model_name="debias_run")
    base = _base_params(seed=cfg.train_config.seed)
    result = main(cfg, init_params=base)
    n_steps = result["global_step"]
    alpha = cfg.train_config.alpha

    ema, _ = load_lora_file(result["lora_path"])           # debiased
    raw, _ = load_lora_file(result["lora_path"], which="raw")
    assert set(raw) == set(ema)

    ema_b = max(float(jnp.abs(ab["b"]).max()) for ab in ema.values())
    raw_b = max(float(jnp.abs(ab["b"]).max()) for ab in raw.values())
    naive_ceiling = 1.0 - alpha**n_steps  # ~0.004 at 4 steps, alpha=.999
    # an un-debiased EMA could be at most naive_ceiling * max-step-b;
    # the debiased one must sit at the raw adapters' scale instead
    assert ema_b > 10 * naive_ceiling * raw_b
    assert ema_b > 0.3 * raw_b


def test_lora_handle_signals_runs(tmp_path):
    """handle_signals=True wraps the adapter loop in GracefulShutdown
    (ADVICE r2); without a signal it must be a clean no-op."""
    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=SMALL_DENOISER, img_size=8,
                     n_epoch=2, batch_size=64, lora_rank=2,
                     handle_signals=True)
    result = main(cfg)
    assert result["preempted"] is False
    assert result["global_step"] == 2


def test_lora_warns_on_wandb_and_run_id(tmp_path):
    import pytest

    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=SMALL_DENOISER, img_size=8,
                     n_epoch=1, batch_size=64, lora_rank=2,
                     use_wandb=True)
    with pytest.warns(UserWarning, match="lora_finetune ignores"):
        main(cfg)


def test_lora_rejects_sharded_parallelism(tmp_path):
    from transformer_latent_diffusion_tpu.train import main

    import pytest

    cfg = _model_cfg(tmp_path, denoiser=SMALL_DENOISER, img_size=8,
                     lora_rank=2, fsdp=True, mesh_shape=(8, 1))
    with pytest.raises(ValueError, match="fsdp"):
        main(cfg)
    cfg = _model_cfg(tmp_path, denoiser=SMALL_DENOISER, img_size=8,
                     lora_rank=2, mesh_shape=(4, 2))
    with pytest.raises(ValueError, match="tensor parallelism"):
        main(cfg)


def test_pipeline_load_lora(tmp_path):
    """DiffusionTransformer.load_lora: merged adapters change the
    output; loading a second adapter swaps (not stacks); scale=0.0
    restores the base."""
    from transformer_latent_diffusion_tpu.configs import (
        ClipConfig,
        DenoiserConfig,
        LTDConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.sampling.pipeline import (
        DiffusionTransformer,
    )

    cfg = LTDConfig(
        denoiser_cfg=DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                                    noise_embed_dims=64),
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
        clip_cfg=ClipConfig(),
    )
    dt = DiffusionTransformer(cfg)
    base = jax.tree.map(jnp.copy, dt.diffuser.params)

    lora = init_lora_params(base, rank=2, seed=1)
    for p in lora:
        lora[p]["b"] = jnp.ones_like(lora[p]["b"]) * 0.01
    save_lora(str(tmp_path / "lora.npz"), lora, scale=2.0)

    dt.load_lora(str(tmp_path / "lora.npz"))  # scale from file
    merged = dt.diffuser.params
    want = merge_lora(base, lora, scale=2.0)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(merged)):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # swapping: a second load starts from the pristine base
    dt.load_lora(lora, scale=1.0)
    want1 = merge_lora(base, lora, scale=1.0)
    for a, b in zip(jax.tree.leaves(want1), jax.tree.leaves(dt.diffuser.params)):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # scale 0 restores the base exactly
    dt.load_lora(lora, scale=0.0)
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(dt.diffuser.params)):
        np.testing.assert_allclose(a, b, atol=0)

    # and the merged model still generates
    img = dt.generate_image_from_text("a cute cat", num_imgs=1, n_iter=2)
    # tiny 2-block VAE upsamples 2x: 8px latent -> 16px + 4px grid padding
    assert img.size == (16 + 8, 16 + 8)

    # config-driven loading: LTDConfig.lora_path merges at construction
    import dataclasses

    cfg2 = dataclasses.replace(cfg, lora_path=str(tmp_path / "lora.npz"),
                               lora_scale=2.0)
    dt2 = DiffusionTransformer(cfg2)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(dt2.diffuser.params)):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # set_base_params refreshes the merge base (ADVICE r2): merging after
    # a base swap starts from the NEW weights, not construction-time ones
    new_base = jax.tree.map(lambda p: p + 1.0, base)
    dt.set_base_params(new_base)
    for a, b in zip(jax.tree.leaves(new_base),
                    jax.tree.leaves(dt.diffuser.params)):
        np.testing.assert_allclose(a, b, atol=0)
    dt.load_lora(lora, scale=1.0)
    want_new = merge_lora(new_base, lora, scale=1.0)
    for a, b in zip(jax.tree.leaves(want_new),
                    jax.tree.leaves(dt.diffuser.params)):
        np.testing.assert_allclose(a, b, atol=1e-6)
