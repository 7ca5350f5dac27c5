"""High-resolution scaling: positional-embedding upsampling + fine-tune.

The reference reaches 512/1024px by upsampling the learned positional
encoding and briefly fine-tuning (README.md:22-26); the upsampling op
itself lives in the author's notebooks. Here it is a first-class API:

    params_hr = upsample_denoiser_params(params, 32, 64, patch_size=2)
    main(config_with_image_size_64, init_params=params_hr)

All other denoiser parameters are resolution-independent (patchify is
per-patch, attention/MLP are per-token), so the resized table is the only
change; sequence length scales as (image_size/patch)^2 (256 -> 1024 ->
4096 tokens for 256/512/1024 px).
"""

from __future__ import annotations

from typing import Any, Dict

from transformer_latent_diffusion_tpu.models.denoiser import resize_pos_embed


def upsample_denoiser_params(params: Dict[str, Any], old_image_size: int,
                             new_image_size: int, patch_size: int):
    """Return a new param tree with the pos-embed table 2D-resized."""
    old_grid = old_image_size // patch_size
    new_grid = new_image_size // patch_size
    new_params = dict(params)
    tb = dict(params["denoiser_trans_block"])
    tb["pos_embed"] = resize_pos_embed(tb["pos_embed"], old_grid, new_grid)
    new_params["denoiser_trans_block"] = tb
    return new_params


def finetune_highres(config, base_params, old_image_size: int):
    """Upsample pos-embeds from a trained base model and run train.main
    at config.denoiser_config.image_size (the new, larger resolution).

    Schedule-shift note (measured, docs/DESIGN.md "Resolution-dependent
    schedule shift"): in this setting the fine-tuned model's native size
    IS the new size, so TrainConfig.schedule_shift="auto" resolves to 1
    — to train with the SD3 shift pass it EXPLICITLY as
    new_image_size / old_image_size (and the same value to
    generate(schedule_shift=...) at sampling time). The sampler-side
    grid shift alone was the larger lever in the fine-tune probe
    (scripts/probe_shift_finetune.py) and needs no retraining."""
    from transformer_latent_diffusion_tpu.train.train import main

    params_hr = upsample_denoiser_params(
        base_params, old_image_size,
        config.denoiser_config.image_size,
        config.denoiser_config.patch_size,
    )
    return main(config, init_params=params_hr)
