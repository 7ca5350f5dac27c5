"""Text-to-image pipeline: the public `DiffusionTransformer` API.

Parity with the reference pipeline (/root/reference/tld/diffusion.py:128-186):
build the denoiser from `LTDConfig`, optionally download + load weights,
attach VAE and CLIP towers, and expose
`generate_image_from_text(prompt, class_guidance=6, seed=11, num_imgs=1,
img_size=32, n_iter=15) -> PIL.Image`.

Weight files may be Flax checkpoints (.npz / orbax dir) or torch
state_dicts (.pth) converted on the fly via models/torch_compat.
"""

from __future__ import annotations

import math
import os
from dataclasses import asdict
from typing import Optional

import jax
import numpy as np

from transformer_latent_diffusion_tpu.configs import (
    LTDConfig,
    resolve_dtype,
)
from transformer_latent_diffusion_tpu.models.clip import FlaxClip
from transformer_latent_diffusion_tpu.models.denoiser import Denoiser
from transformer_latent_diffusion_tpu.models.vae import FlaxVae
from transformer_latent_diffusion_tpu.sampling.diffusion import DiffusionGenerator
from transformer_latent_diffusion_tpu.utils import (
    init_denoiser_params,
    slerp,
    uint8_grid_to_pil,
)


def pool_mask_to_latent(mask, want: int) -> np.ndarray:
    """Image-space inpainting mask -> (1,1,S,S) latent-grid mask.

    nonzero = regenerate, zero = keep; multi-channel masks use the FIRST
    channel (an opaque alpha channel must not mark everything as
    regenerate). Max-pooled to the latent grid: any touched latent cell
    regenerates (latent cells couple ~8px of pixels, so masks are
    latent-resolution). Shared by DiffusionTransformer.inpaint and the
    serving micro-batcher."""
    m = np.asarray(mask, dtype=np.float32)
    if m.ndim == 3:  # RGB(A)/channel-last mask -> first channel
        m = m[..., 0]
    m = (m > 0).astype(np.float32)
    down = m.shape[-1] // want
    if down < 1 or m.shape[-1] != want * down or m.shape[-2] != want * down:
        raise ValueError(
            f"mask is {m.shape[-2]}x{m.shape[-1]}; expected a square "
            f"multiple of the {want}-wide latent grid")
    # max-pool to the latent grid: regenerate any touched cell
    m = m.reshape(want, down, want, down).max(axis=(1, 3))
    return m[None, None]  # (1,1,S,S) broadcasts over batch+channels


def download_file(url: str, filename: str) -> None:
    """Stream a file to disk. Parity: reference diffusion.py:128-133.

    Streams to a temp path and renames on success: an interrupted
    download must not leave a truncated file at `filename`, or every
    later construction would see the cache hit and fail to load it."""
    import requests

    tmp = f"{filename}.part"
    with requests.get(url, stream=True) as r:
        r.raise_for_status()
        with open(tmp, "wb") as f:
            for chunk in r.iter_content(chunk_size=8192):
                f.write(chunk)
    os.replace(tmp, filename)


def load_denoiser_params(path: str, model: Denoiser, cfg):
    """Load denoiser weights: .npz (flax), .safetensors (pure-numpy
    reader, torch-free), or a torch .pth state_dict (converted)."""
    if path.endswith(".npz"):
        from transformer_latent_diffusion_tpu.train.checkpoint import (
            unflatten_npz,
        )

        return unflatten_npz(path)
    from transformer_latent_diffusion_tpu.models.torch_compat import (
        convert_torch_denoiser_state_dict,
        load_state_dict_file,
    )

    state_dict = load_state_dict_file(path)
    if "model_ema" in state_dict:
        state_dict = state_dict["model_ema"]
    elif any(k.startswith("model_ema.") for k in state_dict):
        # safetensors files are flat: an EMA checkpoint arrives with
        # 'model_ema.'-prefixed keys instead of a nested dict
        state_dict = {k[len("model_ema."):]: v for k, v in state_dict.items()
                      if k.startswith("model_ema.")}
    return convert_torch_denoiser_state_dict(state_dict, cfg)


def encode_text(label, clip_model: FlaxClip):
    """Parity wrapper: reference diffusion.py:136-140."""
    return clip_model.encode_text(label)


class DiffusionTransformer:
    """Parity: reference DiffusionTransformer (diffusion.py:143-186)."""

    def __init__(self, cfg: LTDConfig):
        self.cfg = cfg
        dtype = resolve_dtype(cfg.denoiser_load.dtype)
        use_pallas = bool(cfg.use_pallas)

        on_tpu = jax.default_backend() not in ("cpu",)
        # Hi-res hybrid (measured, scripts/probe_highres_hybrid.py): past
        # the fused engine's 256-token gate the linen path runs Pallas
        # flash attention (use_pallas) everywhere, plus the fused
        # MLP-sepconv kernel up to 1024 tokens — 512px generation 1.41x,
        # 1024px 1.88x over pure XLA. At 4096 tokens fused-MLP measured
        # neutral, so it stays off there.
        hw = cfg.denoiser_cfg.image_size // cfg.denoiser_cfg.patch_size
        # only in the hybrid regime: at hw <= 16 inference runs the fused
        # engine, so compiling the fused-MLP kernel for the linen path
        # would waste a (slow, tunneled) startup compile for nothing
        # non-default FFNs ("mlp"/"moe") have no fused-engine or
        # fused-MLP kernels; flash attention (use_pallas) still applies
        sep_conv = cfg.denoiser_cfg.mlp_class == "sep_conv"
        fused_mlp = bool(use_pallas and on_tpu and 16 < hw <= 32
                         and sep_conv)

        mesh = None
        if getattr(cfg, "mesh_shape", None) is not None:
            from transformer_latent_diffusion_tpu.parallel import create_mesh

            mesh = create_mesh(cfg.mesh_shape)
        # sequence-parallel sampling (beyond reference): token dim over
        # 'model' inside the scan; auto at >= 4096 tokens like training
        n_tok = hw * hw
        tp = mesh.shape["model"] if mesh is not None else 1
        pp = bool(getattr(cfg, "pipeline_parallel", False)) and tp > 1
        sp = (False if pp else
              (cfg.sequence_parallel if getattr(cfg, "sequence_parallel",
                                                None) is not None
               else (tp > 1 and n_tok >= 4096)))
        seq_mesh = mesh if (sp and tp > 1 and n_tok % tp == 0) else None
        pipeline_fn = None
        if pp:
            from transformer_latent_diffusion_tpu.parallel.pipeline import (
                PipelinedDenoiser,
            )

            pipeline_fn = PipelinedDenoiser(
                cfg.denoiser_cfg, mesh,
                n_microbatches=getattr(cfg, "pipeline_microbatches", None),
                dtype=dtype)

        # expert parallelism at inference: MoE experts shard over the
        # mesh 'model' axis (models/moe.py); param_shardings places the
        # stacked expert weights there on the generate path
        ep_mesh = (mesh if (cfg.denoiser_cfg.mlp_class == "moe" and tp > 1
                            and not pp) else None)
        denoiser = Denoiser(
            **asdict(cfg.denoiser_cfg), use_pallas=use_pallas, dtype=dtype,
            fused_mlp_vjp=fused_mlp, seq_mesh=seq_mesh, ep_mesh=ep_mesh,
        )
        params = init_denoiser_params(denoiser, cfg.denoiser_cfg)

        load = cfg.denoiser_load
        if load.file_url is not None and load.local_filename is not None:
            if not os.path.exists(load.local_filename):
                print(f"Downloading model from {load.file_url}")
                download_file(load.file_url, load.local_filename)
            params = load_denoiser_params(
                load.local_filename, denoiser, cfg.denoiser_cfg
            )
        elif load.local_filename is not None and os.path.exists(load.local_filename):
            params = load_denoiser_params(
                load.local_filename, denoiser, cfg.denoiser_cfg
            )

        vae_params = None
        if cfg.vae_cfg.weights_path and os.path.exists(cfg.vae_cfg.weights_path):
            from transformer_latent_diffusion_tpu.models.torch_compat import (
                load_vae_params,
            )

            vae_params = load_vae_params(cfg.vae_cfg.weights_path, cfg.vae_cfg)
        elif cfg.vae_cfg.vae_name:
            # the reference pulls this model from the hub at runtime
            # (diffusion.py:157-158); here towers are converted once
            print(f"VAE '{cfg.vae_cfg.vae_name}': no weights_path — "
                  f"random-init (convert real weights with "
                  f"scripts/convert_towers.py)")
        self.vae = FlaxVae.create(
            block_out_channels=cfg.vae_cfg.block_out_channels,
            layers_per_block=cfg.vae_cfg.layers_per_block,
            latent_channels=cfg.vae_cfg.latent_channels,
            params=vae_params,
            dtype=resolve_dtype(cfg.vae_cfg.vae_dtype),
        )

        clip_params = None
        if cfg.clip_cfg.weights_path and os.path.exists(cfg.clip_cfg.weights_path):
            from transformer_latent_diffusion_tpu.models.torch_compat import (
                load_clip_params,
            )

            clip_params = load_clip_params(cfg.clip_cfg.weights_path, cfg.clip_cfg)
        elif cfg.clip_cfg.clip_model_name:
            print(f"CLIP '{cfg.clip_cfg.clip_model_name}': no weights_path "
                  f"— random-init (convert real weights with "
                  f"scripts/convert_towers.py)")
        self.clip_model = FlaxClip.create(
            width=cfg.clip_cfg.width,
            heads=cfg.clip_cfg.heads,
            layers=cfg.clip_cfg.layers,
            embed_dim=cfg.clip_cfg.embed_dim,
            params=clip_params,
            vocab_path=cfg.clip_cfg.vocab_path,
            dtype=resolve_dtype(cfg.clip_cfg.clip_dtype),
        )

        fast_apply = None
        # widened-input (outpainting) models take the linen path: the
        # fused engine packs the plain n_channels patchify width
        plain_input = cfg.denoiser_cfg.input_channels in (
            None, cfg.denoiser_cfg.n_channels)
        if (use_pallas and sep_conv and plain_input
                and jax.default_backend() not in ("cpu",)):
            from transformer_latent_diffusion_tpu.models.fast_denoiser import (
                make_fused_apply,
            )

            fast_apply = make_fused_apply(cfg.denoiser_cfg, compute_dtype=dtype,
                                          quantize=getattr(cfg, "quantize", None))

        # consistency-distilled deployment (LTDConfig.consistency): wrap
        # the network — fused engine included, its prepare protocol is
        # preserved — in the boundary-exact consistency function; the
        # generate paths then run the fresh-noise multistep sampler
        self.consistency = bool(getattr(cfg, "consistency", False))
        # deployment-level SD3 schedule shift (LTDConfig.schedule_shift):
        # the default for t2i sampling; per-call values override
        self.schedule_shift = getattr(cfg, "schedule_shift", None)
        if self.schedule_shift is not None:
            self.schedule_shift = float(self.schedule_shift)
            if self.schedule_shift <= 0.0:
                raise ValueError("LTDConfig.schedule_shift must be > 0, "
                                 f"got {self.schedule_shift}")
            if self.schedule_shift == 1.0:  # identity — normalize to off
                self.schedule_shift = None
        if self.consistency:
            if self.schedule_shift is not None:
                raise ValueError(
                    "LTDConfig.schedule_shift selects the ODE solver "
                    "grid; it does not apply to a consistency "
                    "deployment (fresh-noise multistep sampling)")
            if pipeline_fn is not None:
                raise ValueError("consistency=True does not compose with "
                                 "pipeline_parallel sampling")
            from transformer_latent_diffusion_tpu.train.distill import (
                consistency_apply,
            )

            fast_apply = consistency_apply(denoiser, inner=fast_apply)

        self.diffuser = DiffusionGenerator(
            model=denoiser, params=params, vae=self.vae, model_dtype=dtype,
            fast_apply=fast_apply, mesh=mesh, pipeline_fn=pipeline_fn,
            # serving surface: CPU-drawn noise keeps micro-batched
            # results bit-equal to solo requests (see initialize_image)
            noise_on_host=True,
        )
        # latent value scaling for encode/decode, honoring the config
        # (reference vae_scale_factor semantics, train.py:122)
        self._scale_factor = float(cfg.vae_cfg.vae_scale_factor)
        # pristine base params, so load_lora(adapter_b) after
        # load_lora(adapter_a) swaps adapters instead of stacking them
        self._base_params = self.diffuser.params
        if getattr(cfg, "lora_path", None):
            self.load_lora(cfg.lora_path,
                           scale=getattr(cfg, "lora_scale", None))

    def load_lora(self, path_or_lora, scale: Optional[float] = None) -> None:
        """Merge LoRA adapters (train/lora.py) into the denoiser.

        path_or_lora: a `lora.npz` path from lora_finetune/save_lora, or
        an adapter dict. scale: merge strength (None = the scale stored
        in the file, or 1.0 for a dict); 0.0 restores the base model.
        Merging replaces `diffuser.params`, so every sampler path (XLA,
        fused engine, int8, mesh) picks the adapter up on the next
        generate with zero added inference cost. Repeated calls swap
        adapters (each merge starts from the pristine base params).

        NOTE: the merge base is the params snapshotted at construction
        (or at the last `set_base_params` call) — assigning
        `diffuser.params` directly does NOT change it. To adapt new base
        weights, call `set_base_params(new_params)` first.
        """
        from transformer_latent_diffusion_tpu.train.lora import (
            load_lora_file,
            merge_lora,
        )

        if isinstance(path_or_lora, str):
            lora, file_scale = load_lora_file(path_or_lora)
        else:
            lora, file_scale = path_or_lora, 1.0
        s = file_scale if scale is None else float(scale)
        self.diffuser.params = merge_lora(self._base_params, lora, s)

    def set_base_params(self, params) -> None:
        """Replace the denoiser's base weights (e.g. a newly loaded
        checkpoint): refreshes the pristine copy that `load_lora` merges
        onto and clears any currently merged adapter."""
        self._base_params = params
        self.diffuser.params = params

    @staticmethod
    def _resolve_pad(pad_to, num_imgs: int) -> int:
        """Validated generation batch size for compile-count bucketing:
        `pad_to` >= num_imgs images are generated and the first num_imgs
        are returned, so one XLA scan per bucket serves every smaller
        request (serve/app.py policy; VERDICT r2 #7). Note the padded
        batch draws its noise at the BUCKET shape, so a bucketed result
        differs from the unpadded one for the same seed — deterministic
        per (seed, bucket), which is what a fixed server policy gives."""
        if pad_to is None:
            return num_imgs
        p = int(pad_to)
        if p < num_imgs:
            raise ValueError(
                f"pad_to={p} is smaller than num_imgs={num_imgs}")
        return p

    def _reject_consistency(self, feature: str):
        if self.consistency:
            raise ValueError(
                f"{feature} assumes the deterministic DDIM/DPM update; "
                f"a consistency deployment (LTDConfig.consistency) "
                f"supports text-to-image only (incl. negative prompts "
                f"and best-of-N)")

    def generate_image_from_text(
        self,
        prompt: str,
        class_guidance=6,
        seed=11,
        num_imgs=1,
        img_size=32,
        n_iter=15,
        cache_interval=1,
        negative_prompt=None,
        pad_to=None,
        cfg_rescale=0.0,
        guidance_interval=None,
        sampler=None,
        schedule="poly",
        eta=0.0,
        schedule_shift=None,
    ):
        """Prompt -> PIL image grid. Parity: reference diffusion.py:165-186
        (including: the latent size comes from the model's image_size; the
        img_size argument is accepted but unused, like the reference).
        cache_interval > 1 enables Delta-DiT block caching (beyond
        reference; requires the fused engine). negative_prompt (beyond
        reference) steers CFG away from its embedding instead of the
        zero vector. prompt may be a list of distinct prompts (beyond
        reference): one image per prompt in a single scan call,
        overriding num_imgs. cfg_rescale / guidance_interval are the
        guidance quality knobs; sampler ("ddim"/"dpm"/"heun") and
        schedule ("poly"/"cosine"/"karras") select the solver and
        noise-level spacing; eta in (0, 1] is stochastic DDIM (requires
        sampler="ddim"); schedule_shift > 1 re-balances the grid toward
        high noise (SD3 shift — see DiffusionGenerator.generate)."""
        num_imgs = len(prompt) if isinstance(prompt, (list, tuple)) \
            else num_imgs
        out = self.generate_array_from_text(
            prompt, class_guidance=class_guidance, seed=seed,
            num_imgs=num_imgs, n_iter=n_iter,
            cache_interval=cache_interval, negative_prompt=negative_prompt,
            pad_to=pad_to, cfg_rescale=cfg_rescale,
            guidance_interval=guidance_interval, sampler=sampler,
            schedule=schedule, eta=eta, schedule_shift=schedule_shift)
        return uint8_grid_to_pil(out, nrow=int(math.sqrt(num_imgs)),
                                 padding=4)

    def generate_array_from_text(
        self,
        prompt,
        class_guidance=6,
        seed=11,
        num_imgs=1,
        n_iter=15,
        cache_interval=1,
        negative_prompt=None,
        pad_to=None,
        cfg_rescale=0.0,
        guidance_interval=None,
        sampler=None,
        schedule="poly",
        eta=0.0,
        schedule_shift=None,
    ):
        """Like generate_image_from_text but returns the raw images as a
        (num_imgs, H, W, 3) uint8 array instead of a PIL grid — the form
        evaluation pipelines consume (CLIP score / CLIP-FID,
        utils/clip_eval.py; see examples/evaluate.py)."""
        if isinstance(prompt, (list, tuple)):
            prompts = list(prompt)
            num_imgs = len(prompts)
        else:
            prompts = [prompt] * num_imgs

        gen_n = self._resolve_pad(pad_to, num_imgs)
        if gen_n > num_imgs:
            prompts = prompts + [prompts[-1]] * (gen_n - num_imgs)
        labels, negative_labels = self._encode_prompts(
            prompts, negative_prompt, gen_n)
        extra = {}
        if self.consistency:
            # consistency students sample with the fresh-noise multistep
            # update; the DDIM/DPM/heun machinery does not apply
            if (sampler is not None or schedule != "poly" or eta
                    or schedule_shift is not None):
                raise ValueError(
                    "sampler/schedule/eta/schedule_shift select the ODE "
                    "solver; a consistency deployment "
                    "(LTDConfig.consistency) uses the fresh-noise "
                    "multistep update instead")
            if cache_interval != 1:
                raise ValueError("cache_interval > 1 (block caching) "
                                 "assumes the DDIM/DPM scan body; it "
                                 "excludes consistency sampling")
            extra = dict(fresh_noise=True, use_ddpm_plus=False)
        if schedule_shift is None:
            # deployment default (LTDConfig.schedule_shift); per-call
            # values override. Resolved AFTER the consistency check —
            # a consistency config with a shift is rejected at init.
            schedule_shift = self.schedule_shift
        # output="uint8" quantizes on device (same math as the float
        # path + to_pil) so only H*W*3 bytes per image leave the chip
        out, _ = self.diffuser.generate(
            labels=labels,
            num_imgs=gen_n,
            img_size=self.diffuser.model.image_size,
            class_guidance=class_guidance,
            seed=seed,
            n_iter=n_iter,
            exponent=1,
            scale_factor=self._scale_factor,
            sharp_f=0,
            bright_f=0,
            cache_interval=cache_interval,
            output="uint8",
            negative_labels=negative_labels,
            cfg_rescale=cfg_rescale,
            guidance_interval=guidance_interval,
            sampler=sampler,
            schedule=schedule,
            eta=eta,
            schedule_shift=schedule_shift,
            **extra,
        )
        return np.asarray(out)[:num_imgs]

    _clip_vision = None

    @property
    def clip_vision(self):
        """Lazy CLIP image tower (models/clip.FlaxClipVision) for
        best-of-N re-ranking and evaluation — configured by
        LTDConfig.clip_vision_cfg (None = default ViT-L/14 shapes,
        random-init unless weights_path points at converted weights,
        scripts/convert_towers.py --clip-vision)."""
        if self._clip_vision is None:
            from transformer_latent_diffusion_tpu.configs import (
                ClipVisionConfig,
            )
            from transformer_latent_diffusion_tpu.models.clip import (
                FlaxClipVision,
            )

            vcfg = getattr(self.cfg, "clip_vision_cfg", None)
            self._clip_vision = FlaxClipVision.from_config(
                vcfg if vcfg is not None else ClipVisionConfig())
        return self._clip_vision

    def generate_best_of(
        self,
        prompt: str,
        n_candidates: int = 8,
        top_k: int = 1,
        class_guidance=6,
        seed=11,
        n_iter=15,
        negative_prompt=None,
        return_scores: bool = False,
        **gen_kwargs,
    ):
        """Best-of-N with CLIP re-ranking (beyond reference): generate
        `n_candidates` images for ONE prompt in a single scan call
        (distinct noise per candidate from one seed), score each against
        the prompt's CLIP text embedding with the in-repo CLIP image
        tower (utils/clip_eval.py feature path), and return the `top_k`
        best as a (top_k, H, W, 3) uint8 array, best first —
        `return_scores=True` also returns the matching CLIP scores.

        Meaningful ranking needs converted tower weights
        (LTDConfig.clip_vision_cfg.weights_path + real CLIP text
        weights); with random towers the order is deterministic but
        semantically meaningless (the hermetic-test degradation mode
        shared by the rest of the stack)."""
        if isinstance(prompt, (list, tuple)):
            raise ValueError(
                "generate_best_of ranks candidates for a single prompt; "
                "got a list")
        if not 1 <= top_k <= n_candidates:
            raise ValueError(
                f"top_k must be in [1, n_candidates={n_candidates}], "
                f"got {top_k}")
        from transformer_latent_diffusion_tpu.utils.clip_eval import (
            clip_image_features,
        )

        imgs = self.generate_array_from_text(
            prompt, num_imgs=n_candidates, seed=seed, n_iter=n_iter,
            class_guidance=class_guidance, negative_prompt=negative_prompt,
            **gen_kwargs)
        feats = clip_image_features(imgs, self.clip_vision,
                                    batch_size=min(32, n_candidates))
        txt = np.asarray(encode_text([prompt], self.clip_model), np.float32)
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
        scores = 100.0 * (feats @ txt[0])
        order = np.argsort(-scores, kind="stable")[:top_k]
        out = imgs[order]
        return (out, scores[order]) if return_scores else out

    def _encode_init_image(self, image):
        """PIL / (H,W,3) / (B,H,W,3) image -> sampler-unit latents.

        Integer inputs are uint8 pixels -> [-1,1]; float inputs are
        assumed already in [-1,1] (decide by DTYPE, not value range — a
        near-black uint8 image must still rescale)."""
        raw = np.asarray(image)
        is_int = np.issubdtype(raw.dtype, np.integer)
        arr = raw.astype(np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.shape[-1] == 3:  # HWC -> CHW
            arr = np.transpose(arr, (0, 3, 1, 2))
        if is_int:
            arr = arr / 127.5 - 1.0
        lat = self.vae.encode(arr) / self._scale_factor
        want = self.diffuser.model.image_size
        if lat.shape[-2:] != (want, want):  # both dims: non-square must fail
            down = arr.shape[-1] // lat.shape[-1]  # this VAE's spatial factor
            raise ValueError(
                f"input image is {arr.shape[-2]}x{arr.shape[-1]}px -> latent "
                f"{lat.shape[-2]}x{lat.shape[-1]}, but the model expects a "
                f"square {want} latent ({want * down}px with this VAE); "
                f"resize the image first")
        return lat

    def _encode_prompts(self, prompt, negative_prompt, num_imgs):
        prompts = (list(prompt) if isinstance(prompt, (list, tuple))
                   else [prompt] * num_imgs)
        labels = encode_text(prompts, self.clip_model)
        negative_labels = None
        if negative_prompt is not None:
            negative_labels = encode_text(
                [negative_prompt] * num_imgs, self.clip_model)
        return labels, negative_labels

    def image_to_image(
        self,
        image,
        prompt: str,
        strength: float = 0.5,
        class_guidance=6,
        seed=11,
        num_imgs=1,
        n_iter=15,
        negative_prompt=None,
        pad_to=None,
    ):
        """Image + prompt -> PIL image grid (img2img, beyond reference).

        `image` is a PIL image or (H,W,3) / (B,H,W,3) uint8/float array
        (float means already in [-1,1]); it is VAE-encoded and re-noised
        to the schedule's `strength` point, then denoised under the
        prompt (see DiffusionGenerator.generate init_latents/strength).
        A single input image with num_imgs > 1 yields num_imgs
        variations (same init, different noise draws)."""
        self._reject_consistency("image_to_image")
        lat = self._encode_init_image(image)
        if not (lat.shape[0] == 1 and num_imgs > 1):
            # (1,C,S,S) broadcasts against num_imgs noise draws; a real
            # batch fixes num_imgs to the batch size
            num_imgs = int(lat.shape[0])
        nrow = int(math.sqrt(num_imgs))

        gen_n = self._resolve_pad(pad_to, num_imgs)
        if gen_n > num_imgs and lat.shape[0] > 1:
            lat = np.concatenate(
                [lat, np.repeat(lat[-1:], gen_n - num_imgs, axis=0)])
        labels, negative_labels = self._encode_prompts(
            prompt, negative_prompt, gen_n)
        out, _ = self.diffuser.generate(
            labels=labels,
            num_imgs=gen_n,
            img_size=self.diffuser.model.image_size,
            class_guidance=class_guidance,
            seed=seed,
            n_iter=n_iter,
            exponent=1,
            scale_factor=self._scale_factor,
            sharp_f=0,
            bright_f=0,
            output="uint8",
            negative_labels=negative_labels,
            init_latents=lat,
            strength=strength,
        )
        return uint8_grid_to_pil(np.asarray(out)[:num_imgs], nrow=nrow,
                                 padding=4)

    def outpaint(
        self,
        image,
        prompt: str,
        n_tiles: int = 1,
        direction: str = "right",
        overlap: float = 0.5,
        class_guidance=6,
        seed=11,
        n_iter=15,
        negative_prompt=None,
    ):
        """Extend `image` by `n_tiles` model-sized tiles toward
        `direction` (the reference README's "Outpainting model" — an
        8-input-channel fine-tune "applied repeatedly to generate a
        somewhat consistent scenery"; notebook-only there).

        Requires a widened-input denoiser
        (DenoiserConfig.input_channels == 2*n_channels), e.g. a trained
        checkpoint expanded with models.denoiser.expand_input_channels
        and fine-tuned with TrainConfig.outpaint. Each new tile's
        context channels hold the `overlap` fraction of the previous
        tile's latent at the seam (zeros elsewhere = unknown); the
        panorama keeps the original pixels and appends each tile's
        non-overlapping part. Returns a PIL image.
        """
        from PIL import Image

        model = self.diffuser.model
        in_ch = getattr(model, "input_channels", None) or model.n_channels
        if in_ch <= model.n_channels:
            raise ValueError(
                "outpaint requires a widened-input model "
                "(DenoiserConfig.input_channels == 2*n_channels); expand "
                "a trained checkpoint with "
                "models.denoiser.expand_input_channels and fine-tune")
        if direction not in ("right", "left", "down", "up"):
            raise ValueError(f"unknown direction {direction!r}")
        s = model.image_size
        k = int(round(overlap * s))
        if not 0 < k < s:
            raise ValueError(
                f"overlap={overlap} must leave 0 < overlap < 1 of the "
                f"{s}-wide latent grid shared across the seam")
        axis = -1 if direction in ("right", "left") else -2
        at_end = direction in ("right", "down")  # seam side of PREV tile

        self._reject_consistency("outpaint")
        lat = np.asarray(self._encode_init_image(image))
        if lat.shape[0] != 1:
            raise ValueError("outpaint takes a single image")
        labels, negative_labels = self._encode_prompts(
            prompt, negative_prompt, 1)

        # base canvas pixels (keep the actual input, not a VAE round-trip)
        raw = np.asarray(image)
        if raw.ndim == 4:
            raw = raw[0]
        if np.issubdtype(raw.dtype, np.integer):
            base = raw.astype(np.uint8)
        else:
            base = ((np.clip(raw, -1.0, 1.0) + 1.0) * 127.5 + 0.5
                    ).astype(np.uint8)

        f = base.shape[0] // s  # VAE spatial factor (square: validated above)
        k_px = k * f
        pan = base
        prev = lat
        for i in range(n_tiles):
            ctx = np.zeros_like(prev)
            src = [slice(None)] * prev.ndim
            dst = [slice(None)] * prev.ndim
            # the new tile's seam-facing edge sees prev's opposite edge
            src[axis] = slice(-k, None) if at_end else slice(0, k)
            dst[axis] = slice(0, k) if at_end else slice(-k, None)
            ctx[tuple(dst)] = prev[tuple(src)]

            img_u8, x0 = self.diffuser.generate(
                labels=labels,
                num_imgs=1,
                img_size=s,
                class_guidance=class_guidance,
                seed=seed + i,
                n_iter=n_iter,
                exponent=1,
                scale_factor=self._scale_factor,
                sharp_f=0,
                bright_f=0,
                output="uint8",
                negative_labels=negative_labels,
                context_latents=ctx,
            )
            tile = np.asarray(img_u8)[0]  # (H, W, 3) uint8
            prev = np.asarray(x0)

            keep = [slice(None)] * 3
            pix_axis = 1 if axis == -1 else 0
            keep[pix_axis] = (slice(k_px, None) if at_end
                              else slice(0, tile.shape[pix_axis] - k_px))
            pieces = ([pan, tile[tuple(keep)]] if at_end
                      else [tile[tuple(keep)], pan])
            pan = np.concatenate(pieces, axis=pix_axis)
        return Image.fromarray(pan)

    def interpolate(
        self,
        prompt_a: str,
        prompt_b: Optional[str] = None,
        n_frames: int = 8,
        class_guidance=6,
        seed=11,
        seed_b: Optional[int] = None,
        n_iter=15,
        negative_prompt=None,
    ):
        """Interpolation strip (the reference README's "Clip
        interpolation Examples", README.md:10-18 — produced in the
        author's notebooks there; a first-class API here).

        Two axes, composable:
        - prompt_b: morph the conditioning — the two pooled CLIP
          embeddings are spherically interpolated (utils.slerp; CLIP
          embeddings live on a sphere, lerp midpoints lose norm).
        - seed_b: morph the DDIM latent — the two seeded gaussian inits
          are slerped (the reference README notes DDIM's deterministic
          noise->image map makes the normal latent space interpolable;
          slerp keeps each frame's radius gaussian-typical).
        With only prompt_b, every frame shares seed's init noise; with
        only seed_b, every frame shares prompt_a's embedding. All frames
        run in a single scan call. Returns a one-row PIL strip, frame
        0 = (prompt_a, seed), last = (prompt_b, seed_b).
        """
        self._reject_consistency("interpolate")
        if n_frames < 2:
            raise ValueError(f"n_frames must be >= 2, got {n_frames}")
        if prompt_b is None and seed_b is None:
            raise ValueError("nothing to interpolate: give prompt_b "
                             "and/or seed_b")
        ts = np.linspace(0.0, 1.0, n_frames)
        if prompt_b is not None:
            emb = np.asarray(
                encode_text([prompt_a, prompt_b], self.clip_model),
                np.float32)
            labels = slerp(emb[0], emb[1], ts)
        else:
            la = np.asarray(encode_text([prompt_a], self.clip_model),
                            np.float32)
            labels = np.broadcast_to(la[0], (n_frames, la.shape[-1]))
        negative_labels = None
        if negative_prompt is not None:
            negative_labels = np.asarray(encode_text(
                [negative_prompt] * n_frames, self.clip_model))

        size = self.diffuser.model.image_size
        noise = np.asarray(self.diffuser.initialize_image(
            None, 1, size, seed))  # (1,C,S,S)
        if seed_b is not None:
            noise_b = np.asarray(self.diffuser.initialize_image(
                None, 1, size, seed_b))
            seeds = slerp(noise.ravel(), noise_b.ravel(), ts).reshape(
                (n_frames,) + noise.shape[1:])
        else:
            seeds = np.broadcast_to(noise, (n_frames,) + noise.shape[1:])

        out, _ = self.diffuser.generate(
            labels=labels,
            num_imgs=n_frames,
            img_size=size,
            class_guidance=class_guidance,
            seed=seed,
            seeds=seeds,
            n_iter=n_iter,
            exponent=1,
            scale_factor=self._scale_factor,
            sharp_f=0,
            bright_f=0,
            output="uint8",
            negative_labels=negative_labels,
        )
        return uint8_grid_to_pil(np.asarray(out), nrow=n_frames, padding=4)

    def inpaint(
        self,
        image,
        mask,
        prompt: str,
        strength: float = 1.0,
        class_guidance=6,
        seed=11,
        num_imgs=1,
        n_iter=15,
        negative_prompt=None,
        pad_to=None,
    ):
        """Regenerate the masked region of `image` under `prompt`
        (inpainting, beyond reference).

        `mask` is a PIL image or (H,W) array in image space — nonzero =
        regenerate, zero = keep (multi-channel masks use the FIRST
        channel: an opaque alpha channel must not mark everything as
        regenerate). It is max-pooled to the latent grid (any touched
        latent cell regenerates; latent cells couple ~8px of pixels, so
        masks are latent-resolution). strength < 1 additionally limits
        how far the masked region departs (img2img semantics inside the
        mask)."""
        self._reject_consistency("inpaint")
        lat = self._encode_init_image(image)
        want = self.diffuser.model.image_size
        m = pool_mask_to_latent(mask, want)

        if not (lat.shape[0] == 1 and num_imgs > 1):
            num_imgs = int(lat.shape[0])
        nrow = int(math.sqrt(num_imgs))

        gen_n = self._resolve_pad(pad_to, num_imgs)
        if gen_n > num_imgs and lat.shape[0] > 1:
            lat = np.concatenate(
                [lat, np.repeat(lat[-1:], gen_n - num_imgs, axis=0)])
        labels, negative_labels = self._encode_prompts(
            prompt, negative_prompt, gen_n)
        out, _ = self.diffuser.generate(
            labels=labels,
            num_imgs=gen_n,
            img_size=want,
            class_guidance=class_guidance,
            seed=seed,
            n_iter=n_iter,
            exponent=1,
            scale_factor=self._scale_factor,
            sharp_f=0,
            bright_f=0,
            output="uint8",
            negative_labels=negative_labels,
            init_latents=lat,
            strength=strength,
            mask=m,
        )
        return uint8_grid_to_pil(np.asarray(out)[:num_imgs], nrow=nrow,
                                 padding=4)
