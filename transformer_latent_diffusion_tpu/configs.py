"""Configuration dataclasses for the TPU-native latent-diffusion framework.

API-parity goal: same dataclass names / field names / defaults as the
reference configs (see /root/reference/tld/configs.py:1-97), with torch
dtype fields replaced by jnp dtypes and a few TPU-specific knobs added
(mesh shape, pallas toggles) that default to reference-equivalent
behaviour.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any, Optional, Tuple, Union

import jax.numpy as jnp

# dtypes are stored as strings in configs so they JSON round-trip
# (reference stores torch.dtype objects; README documents JSON round-trip).
_DTYPE_MAP = {
    "float32": jnp.float32,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
}


def resolve_dtype(dtype: Any):
    """Accept a jnp dtype, numpy dtype or string and return the jnp dtype."""
    if isinstance(dtype, str):
        return _DTYPE_MAP[dtype]
    return jnp.dtype(dtype).type if not hasattr(dtype, "dtype") else dtype


@dataclass
class DataDownloadConfig:
    """Config for downloading and processing latents.

    Parity: reference configs.py:5-19.
    """

    data_link: str
    caption_col: str = "caption"
    url_col: str = "url"
    latent_save_path: str = "latents_folder"
    raw_imgs_save_path: str = "raw_imgs_folder"
    use_drive: bool = False
    initial_csv_path: str = "imgs.csv"
    number_sample_per_shard: int = 10000
    image_size: int = 256
    batch_size: int = 64
    download_data: bool = True
    first_n_rows: int = 1000000
    use_wandb: bool = False
    # TPU additions: shard the encode stage across hosts.
    process_index: int = 0
    process_count: int = 1


@dataclass
class DenoiserConfig:
    """Parity: reference configs.py:21-31 (same defaults: tiny model)."""

    image_size: int = 16
    noise_embed_dims: int = 256
    patch_size: int = 2
    embed_dim: int = 128
    dropout: float = 0
    n_layers: int = 3
    text_emb_size: int = 768
    n_channels: int = 4
    mlp_multiplier: int = 4
    # TPU additions — FFN selection: "sep_conv" (reference default,
    # transformer_blocks.py:89-113), "mlp" (transformer_blocks.py:75-86),
    # or "moe" (Switch-style expert-parallel MoE, models/moe.py; experts
    # shard over the mesh 'model' axis)
    mlp_class: str = "sep_conv"
    n_experts: int = 8
    expert_capacity_factor: float = 1.25
    # beyond reference (README.md "Outpainting model" section): width of
    # the model's INPUT latent; None = n_channels (plain denoiser). The
    # outpainting fine-tune widens the patchify projection to
    # 2*n_channels (noisy latent + masked context latent) with the new
    # rows zero-initialised — models/denoiser.expand_input_channels.
    input_channels: Optional[int] = None
    # TPU addition — what the network is trained to predict (and what
    # the sampler converts back to an x0 estimate, see
    # sampling.diffusion.prediction_to_x0): "x0" (reference semantics,
    # train.py:166-167), "eps" (noise prediction), or "v" (rectified-
    # flow velocity eps - x0 — flow matching under the repo's
    # linear-interpolation schedule). Travels with the model config so
    # checkpoints round-trip with the right sampling conversion.
    # Measured (scripts/probe_objective_quality.py, table in DESIGN.md):
    # "v" beats "x0" on truth-FID; "eps" is ill-conditioned under this
    # schedule (the x0 conversion divides by 1-sigma, 100x error
    # amplification at the 0.99 start) — exposed for checkpoint
    # compatibility, not recommended for training.
    objective: str = "x0"


@dataclass
class DenoiserLoad:
    """Parity: reference configs.py:33-37 (torch.dtype -> dtype string)."""

    dtype: str = "float32"
    file_url: Optional[str] = None
    local_filename: Optional[str] = None


@dataclass
class VaeConfig:
    """Parity: reference configs.py:39-43."""

    vae_scale_factor: float = 8
    vae_name: str = "madebyollin/sdxl-vae-fp16-fix"
    vae_dtype: str = "float32"
    # TPU addition: path to converted flax weights (msgpack/npz) or a torch
    # diffusers state_dict (.pth/.safetensors). If None, the VAE
    # random-initializes (useful for hermetic tests; matches the reference
    # test strategy of untrained towers where weights are unavailable).
    weights_path: Optional[str] = None
    # architecture knobs (defaults = sdxl-vae-fp16-fix); tests shrink these
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4


@dataclass
class ClipConfig:
    """Parity: reference configs.py:45-48."""

    clip_model_name: str = "ViT-L/14"
    clip_dtype: str = "float16"
    weights_path: Optional[str] = None
    vocab_path: Optional[str] = None  # CLIP BPE vocab (gzip) if available
    # text-tower architecture (defaults = ViT-L/14 text transformer)
    width: int = 768
    heads: int = 12
    layers: int = 12
    embed_dim: int = 768


@dataclass
class ClipVisionConfig:
    """TPU-extra (no reference counterpart): the CLIP *image* tower, for
    CLIP-FID / CLIP-score evaluation (utils/clip_eval.py). Defaults =
    ViT-L/14 visual transformer; weights convert via
    scripts/convert_towers.py --clip-vision."""

    weights_path: Optional[str] = None
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    heads: int = 16
    layers: int = 24
    embed_dim: int = 768
    dtype: str = "float32"


@dataclass
class DataConfig:
    """Where the latent data is stored. Parity: reference configs.py:50-55.

    TPU addition — multi-resolution (bucketed) training: each
    (extra_latent_paths[i], extra_text_emb_paths[i]) pair is a further
    dataset whose latents may have a DIFFERENT square size than the
    main one. train.main interleaves whole batches per resolution
    (static shapes — each bucket compiles its own step once) and maps
    the learned positional table onto every non-native grid with a
    differentiable bilinear resize, so all resolutions train the same
    master table (see train.build_loss_fn / models.denoiser
    .resize_pos_embed). Empty = reference behavior."""

    latent_path: str
    text_emb_path: str
    val_path: str
    extra_latent_paths: Tuple[str, ...] = ()
    extra_text_emb_paths: Tuple[str, ...] = ()


@dataclass
class TrainConfig:
    """Parity: reference configs.py:57-72, plus TPU mesh knobs."""

    batch_size: int = 128
    lr: float = 3e-4
    n_epoch: int = 100
    alpha: float = 0.999
    from_scratch: bool = True
    # betas determine the distribution of noise seen during training
    beta_a: float = 1
    beta_b: float = 2.5
    save_and_eval_every_iters: int = 1000
    # linear LR warmup steps, then constant lr. The reference code uses
    # plain Adam (train.py:86) but its published 101M run used a
    # 1000-step warmup (README.md:192); 0 = reference-code behaviour.
    warmup_steps: int = 0
    # TPU additions — production LR/stability knobs (train.make_optimizer;
    # all defaults = reference behavior): lr_schedule None/"constant"
    # holds lr after the warmup; "cosine" decays lr -> lr*lr_final_frac
    # over lr_decay_steps after the warmup, then holds. grad_clip_norm
    # clips the (accumulated, averaged) gradient by global norm before
    # Adam; None = off.
    lr_schedule: Optional[str] = None
    lr_decay_steps: int = 0
    lr_final_frac: float = 0.0
    grad_clip_norm: Optional[float] = None
    run_id: str = ""
    model_name: str = ""
    compile: bool = True  # kept for parity; JAX always jits — False disables donation
    save_model: bool = True
    use_wandb: bool = False  # reference default True; wandb absent here -> gated
    # --- TPU-native additions ---
    # held-out validation loss (beyond reference — the reference's only
    # in-training quality signal is the eval image grid): the LAST
    # val_holdout dataset examples are excluded from training, and every
    # save_and_eval_every_iters the deterministic diffusion loss on them
    # (fixed noise/dropout draw, EMA weights) is logged as "val_loss"
    val_holdout: int = 0
    # diffusion loss weighting (beyond reference — the reference trains
    # unweighted MSE on the clean latent, train.py:166-167): None =
    # unweighted MSE on the objective's target; "min_snr" = min-SNR-
    # gamma weighting (Hang et al. 2023). The weight is defined in
    # x0-space as min(SNR(s), gamma) with SNR(s) = ((1-s)/s)^2 under
    # the linear-interpolation corruption, then converted to the
    # model's prediction objective by the exact error Jacobian — so the
    # weighted loss is the SAME function of the predicted information
    # for x0/eps/v (tested in tests/test_objectives.py). gamma=inf
    # recovers plain SNR weighting (i.e. unweighted eps-MSE).
    loss_weighting: Optional[str] = None
    min_snr_gamma: float = 5.0
    # record the pre-clip global gradient norm every step (train.main
    # result key "grad_norms"); costs one extra scalar per step on
    # device, fetched on the same deferred 16-step sync cadence as the
    # loss. Off by default — it exists for training-health audits
    # (scripts/probe_flagship_train.py, DESIGN.md).
    log_grad_norm: bool = False
    # offset noise (beyond reference; Guttenberg 2023, the standard SD
    # fine-tune trick): the corruption noise becomes
    # eps + offset_noise * z with z ~ N(0,1) drawn per (sample, channel)
    # and broadcast spatially — exposes the model to low-frequency /
    # global-brightness noise components the i.i.d. draw almost never
    # produces, fixing very-bright/very-dark generation. The objective
    # targets use the SAME effective noise, so eps/v training stays
    # self-consistent. 0 = off (reference behavior).
    offset_noise: float = 0.0
    # resolution-dependent schedule shift (beyond reference; Esser et
    # al. 2024 §5.3.2, the SD3 timestep shift — it applies verbatim to
    # this repo's linear-interpolation corruption, see
    # sampling.diffusion.shift_noise_levels): the Beta(a,b) noise-level
    # draw is mapped through s' = k*s/(1+(k-1)*s) before corrupting.
    # None (default) = off (exact reference draw); a float > 0 is a
    # global shift; "auto" derives k per resolution bucket as
    # batch_size_px / native_size_px (the sqrt-token-ratio rule), so a
    # multires run trains each bucket at its own re-balanced noise
    # distribution while the native bucket stays bit-identical to off.
    schedule_shift: Optional[Union[float, str]] = None
    mesh_shape: Optional[Tuple[int, int]] = None  # (data, model); None = all-data
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    grad_accum_steps: int = 1
    checkpoint_dir: str = "checkpoints"
    seed: int = 0
    # fused differentiable Pallas kernels (ops/fused_*_vjp) in the train
    # step; None = auto (on for TPU, off for CPU)
    fused_mlp_vjp: Optional[bool] = None
    fused_attn_vjp: Optional[bool] = None
    fused_layer_vjp: Optional[bool] = None  # supersedes the two above when on
    # gradient checkpointing of each decoder block; None = auto (on when
    # the token count reaches 2048 — without it 1024px/4096-token
    # training OOMs 16GB HBM at useful batch sizes)
    remat: Optional[bool] = None
    # sequence (context) parallelism: shard self-attention's token dim
    # over the mesh 'model' axis (parallel/sequence.py). None = auto (on
    # when the model axis > 1 and the token count reaches 4096, i.e.
    # 1024px fine-tunes on a TP mesh). Mutually exclusive with the fused
    # Pallas kernels (which the TP gate already disables).
    sequence_parallel: Optional[bool] = None
    # pipeline parallelism (GPipe, parallel/pipeline.py): run the
    # decoder blocks as mesh-'model'-axis stages with microbatched
    # activation passing over ICI (requires n_layers % model_axis == 0
    # and dropout == 0). The 'model' axis then carries stages, so this
    # replaces tensor parallelism on that axis. None/False = off.
    pipeline_parallel: Optional[bool] = None
    # GPipe microbatch count M (bubble fraction (S-1)/(M+S-1));
    # None = 2 * stages
    pipeline_microbatches: Optional[int] = None
    # fully-sharded data parallelism (ZeRO-3): shard every param's
    # largest axis (plus optimizer moments and EMA) over the mesh 'data'
    # axis; GSPMD all-gathers params per layer and reduce-scatters
    # grads. Trades ICI traffic for HBM — use when the train state
    # doesn't fit replicated. Forces the XLA (non-Pallas) compute path,
    # like TP (Pallas calls are not GSPMD-partitionable).
    fsdp: bool = False
    # weight of the Switch load-balancing auxiliary loss, added to the
    # MSE when DenoiserConfig.mlp_class == "moe" (models/moe.py)
    moe_aux_weight: float = 0.01
    # outpainting fine-tune (reference README.md "Outpainting model"):
    # requires DenoiserConfig.input_channels == 2*n_channels. Each step
    # the model input becomes concat([x_noisy, context]) where context
    # is the clean latent masked to a random edge strip (random side,
    # random visible fraction; ~10% of examples get zero context so
    # plain generation keeps working). Start from a trained checkpoint
    # widened with models.denoiser.expand_input_channels via
    # train.main(config, init_params=...).
    outpaint: bool = False
    # LoRA fine-tuning (train/lora.py): rank > 0 routes train.main to
    # the adapter fine-tune loop — only rank-r factors on the decoder
    # blocks' dense projections train (W + (alpha/rank)*A@B); the base
    # params (pass the checkpoint as train.main's init_params) stay
    # frozen. alpha defaults to rank (merge scale 1.0); targets
    # defaults to train.lora.DEFAULT_TARGETS. Adapters save to
    # checkpoint_dir/<model_name>/lora.npz; load at inference with
    # DiffusionTransformer.load_lora.
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_targets: Optional[Tuple[str, ...]] = None
    # graceful preemption: on SIGTERM/SIGINT finish the current step,
    # save a resumable checkpoint (if save_model) and return cleanly
    # (train.GracefulShutdown; no reference equivalent — recovery there
    # is manual wandb restore, train.py:92-100)
    handle_signals: bool = True


@dataclass
class LTDConfig:
    """Main config for inference. Parity: reference configs.py:75-81."""

    denoiser_cfg: DenoiserConfig = field(default_factory=DenoiserConfig)
    denoiser_load: DenoiserLoad = field(default_factory=DenoiserLoad)
    vae_cfg: VaeConfig = field(default_factory=VaeConfig)
    clip_cfg: ClipConfig = field(default_factory=ClipConfig)
    use_pallas: bool = True  # fused Pallas attention on TPU (auto-falls back on CPU)
    # beyond reference: opt-in lossy acceleration of the fused engine —
    # None (exact bf16) or "int8" (W8A8 projections, ~1.1x end-to-end)
    quantize: Optional[str] = None
    # beyond reference: shard generation batch-data-parallel over a
    # ('data','model') device mesh, e.g. (8, 1); None = single device
    mesh_shape: Optional[Tuple[int, int]] = None
    # beyond reference: sequence-parallel self-attention during sampling
    # (token dim over 'model'; parallel/sequence.py). None = auto: on
    # when the mesh model axis > 1 and the model runs >= 4096 tokens
    # (1024px), i.e. the regime where activations dwarf HBM per chip.
    sequence_parallel: Optional[bool] = None
    # beyond reference: GPipe pipeline-parallel sampling — the denoiser
    # runs as mesh-'model'-axis stages inside the sampling scan
    # (parallel/pipeline.py; replaces TP/SP on that axis; requires
    # n_layers % model_axis == 0)
    pipeline_parallel: bool = False
    pipeline_microbatches: Optional[int] = None
    # beyond reference: merge a LoRA adapter file (train/lora.py's
    # lora.npz) into the denoiser at construction; lora_scale None =
    # the scale stored in the file. Swap later at runtime with
    # DiffusionTransformer.load_lora.
    lora_path: Optional[str] = None
    lora_scale: Optional[float] = None
    # beyond reference: CLIP image-tower config for best-of-N candidate
    # re-ranking (DiffusionTransformer.generate_best_of); the tower is
    # built lazily on first use. None = default ViT-L/14 shapes
    # (random-init unless weights_path is set).
    clip_vision_cfg: Optional[ClipVisionConfig] = None
    # beyond reference: the loaded weights are a consistency-distilled
    # student (train/distill.py). Sampling wraps the network in the
    # boundary-exact consistency function f(x,s) = (1-s)x + s*x0 and
    # runs the fresh-noise multistep sampler; deploy with small n_iter
    # (1-4 — the measured quality regime, docs/DESIGN.md few-step
    # table). Guidance-1 + label-dropout students take any
    # class_guidance sampler-side; baked-guidance students should be
    # sampled at class_guidance=1. Text-to-image (incl. negative
    # prompts and best-of-N) only.
    consistency: bool = False
    # beyond reference: deployment-level SD3 schedule shift (see
    # sampling.diffusion.shift_noise_levels and the DESIGN tables) —
    # the default `schedule_shift` for text-to-image sampling
    # (generate_array_from_text + the serving micro-batcher; a per-call
    # value still overrides). A 512px fine-tuned deployment sets
    # new px / pretrain px here (e.g. 2.0) so HTTP traffic — which has
    # no per-request shift field — samples on the measured-better grid.
    # Editing/interpolation paths keep the reference grid. None = off.
    schedule_shift: Optional[float] = None


@dataclass
class ModelConfig:
    """Main config for getting data, training and inference.

    Parity: reference configs.py:84-92.
    """

    data_config: DataConfig
    download_config: Optional[DataDownloadConfig] = None
    denoiser_config: DenoiserConfig = field(default_factory=DenoiserConfig)
    train_config: TrainConfig = field(default_factory=TrainConfig)
    vae_cfg: VaeConfig = field(default_factory=VaeConfig)
    clip_cfg: ClipConfig = field(default_factory=ClipConfig)


# DenoiserConfig fields shared with the reference dataclass
# (reference configs.py:21-31); everything else is a TPU addition.
REFERENCE_DENOISER_FIELDS = (
    "image_size", "noise_embed_dims", "patch_size", "embed_dim", "dropout",
    "n_layers", "text_emb_size", "n_channels", "mlp_multiplier",
)


def reference_denoiser_kwargs(cfg: DenoiserConfig) -> dict:
    """The reference-compatible subset of a DenoiserConfig — what can be
    passed to the reference torch Denoiser (parity tests) or serialized
    for reference interchange."""
    return {k: getattr(cfg, k) for k in REFERENCE_DENOISER_FIELDS}


def config_to_json(cfg) -> str:
    return json.dumps(asdict(cfg))


def denoiser_config_from_json(path: str) -> DenoiserConfig:
    """JSON round-trip used by the reference README (README.md:122)."""
    with open(path) as f:
        return DenoiserConfig(**json.load(f))


def _detuple(value):
    # JSON has no tuples; every sequence field on the inference configs
    # (block_out_channels, mesh_shape, ...) wants one
    return tuple(value) if isinstance(value, list) else value


_LTD_NESTED = {
    "denoiser_cfg": "DenoiserConfig",
    "denoiser_load": "DenoiserLoad",
    "vae_cfg": "VaeConfig",
    "clip_cfg": "ClipConfig",
    "clip_vision_cfg": "ClipVisionConfig",
}


def ltd_config_from_json(path_or_dict) -> "LTDConfig":
    """Full inference-config JSON loader: `config_to_json(LTDConfig(...))`
    round-trips through this (nested dataclasses reconstructed, lists
    restored to tuples). Unknown keys raise, like the reference's
    `DenoiserConfig(**json.load(f))` pattern. Used by the serving
    entry point (`python -m ...serve --config ltd.json` / SERVE_CONFIG)
    so operators can point the service at real weights, sizes, LoRA
    adapters, or the int8 engine without writing Python."""
    if isinstance(path_or_dict, (str, bytes)):
        with open(path_or_dict) as f:
            d = json.load(f)
    else:
        d = dict(path_or_dict)
    kw = {}
    for k, v in d.items():
        cls_name = _LTD_NESTED.get(k)
        if cls_name is not None and isinstance(v, dict):
            cls = globals()[cls_name]
            kw[k] = cls(**{nk: _detuple(nv) for nk, nv in v.items()})
        else:
            kw[k] = _detuple(v)
    return LTDConfig(**kw)


if __name__ == "__main__":
    print(LTDConfig())
