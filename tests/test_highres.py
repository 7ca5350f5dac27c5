"""512/1024px path: pos-embed upsampling + fine-tune + generation at the
new resolution (reference README.md:22-26; BASELINE config #4)."""

import numpy as np
import jax.numpy as jnp

from transformer_latent_diffusion_tpu.configs import (
    DenoiserConfig,
    ModelConfig,
    TrainConfig,
    VaeConfig,
)
from transformer_latent_diffusion_tpu.models import Denoiser
from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
from transformer_latent_diffusion_tpu.train.highres import (
    finetune_highres,
    upsample_denoiser_params,
)
from transformer_latent_diffusion_tpu.utils import init_denoiser_params

from dataclasses import asdict


def test_upsample_then_generate():
    base_cfg = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                              noise_embed_dims=64)
    base_model = Denoiser(**asdict(base_cfg))
    base_params = init_denoiser_params(base_model, base_cfg)

    hr = upsample_denoiser_params(base_params, 8, 16, base_cfg.patch_size)
    assert hr["denoiser_trans_block"]["pos_embed"].shape == (64, 64)
    # untouched weights are shared, not copied
    assert hr["label_proj"]["kernel"] is base_params["label_proj"]["kernel"]

    hr_cfg = DenoiserConfig(image_size=16, embed_dim=64, n_layers=2,
                            noise_embed_dims=64)
    hr_model = Denoiser(**asdict(hr_cfg))
    gen = DiffusionGenerator(model=hr_model, params=hr, vae=None)
    _, lat = gen.generate(labels=jnp.ones((1, 768)), num_imgs=1, img_size=16,
                          n_iter=3, sharp_f=0, bright_f=0)
    assert lat.shape == (1, 4, 16, 16)
    assert np.isfinite(np.asarray(lat)).all()


def test_finetune_highres(tmp_path):
    from tests.test_training import SMALL_DENOISER, _write_fake_data

    base_model = Denoiser(**asdict(SMALL_DENOISER))
    base_params = init_denoiser_params(base_model, SMALL_DENOISER)

    hr_denoiser = DenoiserConfig(image_size=16, embed_dim=64, n_layers=2,
                                 noise_embed_dims=64)
    cfg = ModelConfig(
        data_config=_write_fake_data(tmp_path, img_size=16),
        denoiser_config=hr_denoiser,
        train_config=TrainConfig(
            n_epoch=1, batch_size=32, save_model=False, use_wandb=False,
            save_and_eval_every_iters=10**9,
            checkpoint_dir=str(tmp_path / "ck")),
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
    )
    result = finetune_highres(cfg, base_params, old_image_size=8)
    assert result["global_step"] == 2
    assert all(np.isfinite(result["losses"]))
