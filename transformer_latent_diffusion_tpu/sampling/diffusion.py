"""Reverse-diffusion sampling, TPU-first.

Capability parity with the reference sampler
(/root/reference/tld/diffusion.py:22-125): linear-interpolation noise
schedule `1 - t^exponent` with the first level clamped to 0.99, plain DDIM
or DPM-Solver++(2M) multistep updates, classifier-free guidance via batch
doubling, final extra denoise, sharp/bright latent channel shifts, and VAE
decode with a scale factor.

TPU-first design: the entire generation — every denoiser call, the CFG
combine, the multistep update — runs inside ONE `lax.scan` under `jit`, so
a full 50-step generation is a single XLA dispatch. The step-dependent
DPM++ coefficients are precomputed on the host into arrays the scan
consumes, which lets one compiled program serve both DDIM and DPM++ and
any step count of the same shape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


NOISE_SCHEDULES = ("poly", "cosine", "karras")


def make_noise_levels(n_iter: int, exponent: float = 1.0,
                      kind: str = "poly") -> np.ndarray:
    """Noise-level spacing over n_iter points; first level -> 0.99.

    kind:
      "poly"   — the reference schedule `1 - t^exponent`
                 (parity: reference diffusion.py:50-52).
      "cosine" — `0.99 * cos(t * pi/2)`: the half-cosine spacing
                 (Nichol & Dhariwal 2021 applied to this schedule's
                 interpolation coefficient; the 0.99 factor realises
                 the reference's top-level clamp while keeping the grid
                 strictly decreasing). Dense near the high-noise end,
                 coarser (but never reaching 0) at the low end.
                 `exponent` is ignored.
      "karras" — Karras et al. 2022 (arXiv:2206.00364 eq. 5) rho=7
                 spacing of the noise-to-signal ratio. This schedule's
                 corruption `x = s*eps + (1-s)*x0` has NSR
                 `sigma_VE = s/(1-s)`; the Karras grid is laid out in
                 sigma_VE^(1/7) between the reference endpoints
                 (0.99 top, 1/n_iter bottom — the poly exponent=1
                 endpoints) and mapped back via s = v/(1+v). Relative
                 to the reference's uniform-s spacing (which is already
                 low-noise-heavy in NSR terms) this concentrates steps
                 at HIGH noise, where the large-scale layout is decided.
                 `exponent` is ignored.

    All kinds return the same shape/endpoint contract the samplers
    assume: n_iter strictly-decreasing levels, levels[0] = 0.99.
    """
    if kind == "poly":
        t = np.arange(0, 1, 1.0 / n_iter)
        levels = 1.0 - np.power(t, exponent)
    elif kind == "cosine":
        t = np.arange(0, 1, 1.0 / n_iter)
        levels = 0.99 * np.cos(t * np.pi / 2.0)
    elif kind == "karras":
        rho = 7.0
        # n_iter=1 (one-step consistency regime) would put s_min at 1.0
        # and divide by zero in the NSR map; clamp below 1 — the single
        # level collapses to the 0.99 endpoint either way
        s_max, s_min = 0.99, 1.0 / max(n_iter, 2)
        v_max, v_min = s_max / (1 - s_max), s_min / (1 - s_min)
        g = np.linspace(v_max ** (1 / rho), v_min ** (1 / rho), n_iter)
        v = g ** rho
        levels = v / (1.0 + v)
    else:
        raise ValueError(f"unknown noise schedule {kind!r}; expected one "
                         f"of {NOISE_SCHEDULES}")
    levels[0] = 0.99
    return levels.astype(np.float64)


def shift_noise_levels(levels: np.ndarray, shift: float) -> np.ndarray:
    """Resolution-dependent schedule shift (Esser et al. 2024 §5.3.2 —
    the SD3/flux timestep shift). This repo's corruption
    `x = s*eps + (1-s)*x0` is exactly the linear-interpolation schedule
    the shift was derived for, so the map applies verbatim to the
    interpolation coefficient:

        s' = shift * s / (1 + (shift - 1) * s)

    shift > 1 moves every level toward HIGHER noise: at k x the native
    resolution the same s destroys less information (spatially redundant
    pixels average the noise away), and shift = k — the square root of
    the token-count ratio — restores the native-resolution uncertainty
    profile. The map is monotone with fixed points 0 and 1, so the
    samplers' strictly-decreasing-levels contract is preserved;
    shift = 1 is the identity (callers skip the call entirely there to
    keep the default path bit-exact)."""
    shift = float(shift)
    if shift <= 0.0:
        raise ValueError(f"schedule shift must be > 0, got {shift}")
    s = np.asarray(levels, dtype=np.float64)
    return shift * s / (1.0 + (shift - 1.0) * s)


def make_step_coeffs(noise_levels: np.ndarray, use_ddpm_plus: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Per-step x0-combination coefficients: D = c1[i]*x0 + c2[i]*x0_prev.

    DDIM: c1 = 1, c2 = 0 for every step. DPM-Solver++(2M)
    (arXiv:2211.01095, Algorithm 2): with log-SNR lambdas, h_i steps and
    r = h_{i-1}/h_i, D = (1 + 1/(2r))*x0 - (1/(2r))*x0_prev for i >= 1.
    Parity: reference diffusion.py:54-57 and 74-81.
    """
    n_steps = len(noise_levels) - 1
    c1 = np.ones(n_steps)
    c2 = np.zeros(n_steps)
    if use_ddpm_plus and n_steps >= 2:
        lambdas = [math.log((1 - s) / s) for s in noise_levels]
        hs = [lambdas[i] - lambdas[i - 1] for i in range(1, len(lambdas))]
        rs = [hs[i - 1] / hs[i] for i in range(1, len(hs))]
        for i in range(1, n_steps):
            r = rs[i - 1]
            c1[i] = 1.0 + 1.0 / (2.0 * r)
            c2[i] = -1.0 / (2.0 * r)
    return c1, c2


PREDICTION_OBJECTIVES = ("x0", "eps", "v")


def fresh_noise_image_keys(seed: int, num_imgs: int):
    """Per-image fresh-noise keys for `generate(fresh_noise=True)`.

    Image j's re-noising stream is fold_in(fold_in(PRNGKey(seed), 1), j)
    — a pure function of (seed, j), independent of batch composition, so
    a request's images sample identically whether generated solo or
    coalesced into a micro-batch (the batcher concatenates each
    request's own key vector and passes it via `fresh_noise_keys`).
    The fold_in(·, 1) keeps the stream independent of the init-noise
    draw at the same seed."""
    base = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
    return jax.vmap(lambda j: jax.random.fold_in(base, j))(
        jnp.arange(num_imgs))


def prediction_to_x0(pred, x_t, sigma, objective: str):
    """Convert a network prediction to an x0 estimate under the repo's
    linear-interpolation corruption `x_t = sigma*eps + (1-sigma)*x0`
    (reference train.py:130).

    objective:
      "x0"  — the network predicts the clean latent (reference
              semantics, train.py:166-167): identity.
      "eps" — the network predicts the noise:   x0 = (x_t - s*f)/(1-s).
      "v"   — the network predicts the rectified-flow velocity of the
              interpolation path, v = dx_t/ds = eps - x0 (flow matching
              under this schedule):              x0 = x_t - s*f.

    All three are affine in the prediction with coefficients depending
    only on (x_t, sigma), which both CFG halves share — so converting
    AFTER the CFG combine is exactly equivalent to converting each half.
    `sigma` may be a scalar (inside the sampling scan) or per-sample
    (n,) / (n,1) (training/distillation).
    """
    if objective == "x0":
        return pred
    s = jnp.asarray(sigma, dtype=pred.dtype)
    if s.ndim:
        s = s.reshape(-1, *([1] * (pred.ndim - 1)))
    if objective == "v":
        return x_t - s * pred
    if objective == "eps":
        return (x_t - s * pred) / (1.0 - s)
    raise ValueError(
        f"unknown objective {objective!r}; expected one of "
        f"{PREDICTION_OBJECTIVES}")


def cfg_combine(cond, uncond, class_guidance, sigma=None,
                cfg_rescale: float = 0.0, guidance_interval=None):
    """Classifier-free-guidance combine with optional quality knobs
    (beyond reference — the reference combine is the plain lerp,
    diffusion.py:122-125).

    class_guidance may be a scalar (reference semantics) or a per-image
    vector (num,) — used by the serving micro-batcher to coalesce
    requests with different guidance strengths into one scan call.

    cfg_rescale in [0, 1] (Lin et al. 2023, "Common Diffusion Noise
    Schedules and Sample Steps are Flawed" §3.4): rescales the combined
    prediction's per-sample std back to the cond half's std, then
    blends `rescale*rescaled + (1-rescale)*combined`. Counters the
    over-saturation/contrast-blowup of large guidance scales. 0 = off
    (exact reference math).

    guidance_interval=(lo, hi) (Kynkäänniemi et al. 2024, "Applying
    Guidance in a Limited Interval"): guidance is applied only at noise
    levels sigma in [lo, hi]; outside, the cond prediction is used
    unchanged (g=1). `sigma` is the step's noise level (traced scalar
    inside the sampling scan). None = always active.
    """
    g = class_guidance
    if getattr(g, "ndim", 0) == 1:
        g = g.reshape(-1, *([1] * (cond.ndim - 1)))
    out = g * cond + (1.0 - g) * uncond
    if cfg_rescale:
        axes = tuple(range(1, cond.ndim))
        std_c = jnp.std(cond, axis=axes, keepdims=True)
        std_o = jnp.std(out, axis=axes, keepdims=True)
        rescaled = out * (std_c / jnp.maximum(std_o, 1e-8))
        out = cfg_rescale * rescaled + (1.0 - cfg_rescale) * out
    if guidance_interval is not None and sigma is not None:
        lo, hi = guidance_interval
        active = jnp.logical_and(sigma >= lo, sigma <= hi)
        out = jnp.where(active, out, cond)
    return out


@dataclass
class DiffusionGenerator:
    """Reverse-diffusion generator over a Flax denoiser + Flax VAE.

    Parity with reference DiffusionGenerator (diffusion.py:22-125). `model`
    is the Flax Denoiser module; `params` its weight pytree; `vae` an
    object exposing `.decode(latents_nchw) -> images_nchw` (may be None to
    return latents only); `model_dtype` controls sampling compute dtype.
    """

    model: Any
    params: Any
    vae: Any = None
    model_dtype: Any = jnp.float32
    # optional fused Pallas engine (models/fast_denoiser.make_fused_apply);
    # when set, the scan calls it instead of model.apply
    fast_apply: Any = None
    # optional jax.sharding.Mesh: shard generation batch-data-parallel
    # over the 'data' axis (multi-chip serving, beyond reference). Uses
    # the XLA model path (pallas calls are not auto-partitionable).
    mesh: Any = None
    # optional PipelinedDenoiser (parallel/pipeline.py): run the
    # denoiser as GPipe stages over the mesh 'model' axis inside the
    # sampling scan (requires mesh; replaces TP on that axis, so params
    # are placed with the TP rules off)
    pipeline_fn: Any = None
    # draw initial noise on the CPU backend: threefry BITS are
    # backend-invariant but the bits->normal float transform is not, so
    # serving enables this to make micro-batched results bit-equal to
    # solo ones. Off by default — the host->device upload costs ~20-40ms
    # per batch on tunneled runtimes, which benchmarks shouldn't pay.
    noise_on_host: bool = False
    # what the network predicts: "x0" (reference), "eps", or "v" (the
    # rectified-flow velocity eps - x0). None = read the model's
    # `objective` attribute (DenoiserConfig.objective). Predictions are
    # converted to x0 estimates right after the CFG combine
    # (prediction_to_x0), so every sampler variant — DDIM, DPM++,
    # masked, cached, fresh-noise — runs unchanged on any objective.
    prediction_type: Any = None
    # positional-table handling when img_size's grid differs from the
    # model's native grid. None (default) = bilinear-resize the learned
    # table onto the sampled grid (hoisted out of the scan) — the exact
    # map multi-resolution TRAINING uses (train.build_loss_fn) and that
    # upsample_denoiser_params bakes into a params tree, so a
    # multires-trained model samples every trained size consistently
    # (and sizes LARGER than native work without params surgery).
    # False = the legacy first-h*w-rows slice (reference
    # denoiser.py:76 semantics; smaller-than-native only).
    pos_resize: Any = None
    _compiled: Dict[Any, Any] = field(default_factory=dict, repr=False)

    def _sample_fn(self, n_steps: int, shape: Tuple[int, ...],
                   cache_interval: int = 1, masked: bool = False,
                   ctx_channels: int = 0, fresh_noise: bool = False,
                   cfg_rescale: float = 0.0, guidance_interval=None,
                   heun: bool = False, eta: float = 0.0):
        """Build (and cache) the jitted scan for a given step-count/shape.

        cfg_rescale / guidance_interval / eta are compile-time constants
        (part of the cache key) so the default path keeps the exact
        reference combine with zero added ops in the hot scan body."""
        key = (n_steps, shape, cache_interval, masked, ctx_channels,
               fresh_noise, cfg_rescale, guidance_interval, heun, eta,
               self.pos_resize is False)
        if key in self._compiled:
            return self._compiled[key]

        model = self.model
        # mesh-sharded generation is partitioned by GSPMD, which cannot
        # partition Pallas calls — force the XLA attention path (the
        # fused engine is gated off below for the same reason)
        if self.mesh is not None and getattr(model, "use_pallas", False):
            model = model.clone(use_pallas=False)
        fast_apply = self.fast_apply
        pipeline_fn = self.pipeline_fn

        def prepare(params):
            # weight packing for the fused engine runs once per generate,
            # hoisted out of the 50-step scan
            if use_fast and hasattr(fast_apply, "prepare"):
                return fast_apply.prepare(params)
            return params

        # the fused engine holds per-head (N, N) attention scores in VMEM;
        # measured on v5e: excellent at 256 tokens (hw 16), but at 1024
        # tokens (hw 32) it compiles yet runs ~45x SLOWER than the XLA
        # path (VMEM thrash) — scripts/probe_highres_generate.py. Gate at
        # the measured-good regime. Mesh-sharded generation always takes
        # the XLA path (partitionable by GSPMD).
        hw = shape[-1] // getattr(model, "patch_size", 1)
        # non-native grid: resize the learned pos table onto the sampled
        # grid (see pos_resize field). Computed from params ONCE per
        # call, outside the scan.
        native_grid = None
        patch = getattr(model, "patch_size", 1)
        if hasattr(model, "image_size"):
            native_grid = model.image_size // patch
        grid = shape[-1] // patch
        resize_grid = (grid if (self.pos_resize is not False
                                and native_grid is not None
                                and grid != native_grid) else None)
        if resize_grid is not None and pipeline_fn is not None:
            raise ValueError(
                "non-native sampling sizes do not compose with pipeline "
                "parallelism (no pos-embed override path through the "
                "staged forward); pass pos_resize=False or resize params "
                "with train.highres.upsample_denoiser_params")
        # the fused engine's packed weights assume the plain n_channels
        # patchify width — widened-input (outpainting) models take the
        # linen path; its packed pos table likewise assumes the native
        # grid, so resized-grid sampling takes the linen path too
        use_fast = (fast_apply is not None and hw <= 16
                    and self.mesh is None and ctx_channels == 0
                    and resize_grid is None)

        pred_kind = self.prediction_type
        if pred_kind is None and use_fast:
            # a wrapper engine may already emit x0-style estimates
            # (e.g. train/distill.consistency_apply, whose combine bakes
            # the objective conversion in)
            pred_kind = getattr(fast_apply, "output_objective", None)
        if pred_kind is None:
            pred_kind = str(getattr(model, "objective", "x0"))
        if pred_kind not in PREDICTION_OBJECTIVES:
            raise ValueError(
                f"unknown prediction_type {pred_kind!r}; expected one of "
                f"{PREDICTION_OBJECTIVES}")

        def _cfg_combine(cond, uncond, class_guidance, sigma):
            return cfg_combine(cond, uncond, class_guidance, sigma=sigma,
                               cfg_rescale=cfg_rescale,
                               guidance_interval=guidance_interval)

        def _pos_override(params):
            """Resized pos table for non-native grids (once per call,
            outside the scan); None on the native grid."""
            if resize_grid is None:
                return None
            from transformer_latent_diffusion_tpu.models.denoiser import (
                resize_pos_embed,
            )

            table = params["denoiser_trans_block"]["pos_embed"]
            return resize_pos_embed(table, native_grid, resize_grid)

        def pred_x0(prepared, x_t, labels_cat, noise_level, class_guidance,
                    context=None, pos_override=None):
            """Double-batch CFG denoiser call (reference diffusion.py:94-103).

            context: extra input channels for a widened (outpainting)
            model, concatenated after the noisy latent on BOTH CFG
            halves (the context is conditioning, not guided)."""
            num = x_t.shape[0]
            xin = (x_t if context is None
                   else jnp.concatenate([x_t, context], axis=1))
            x2 = jnp.concatenate([xin, xin], axis=0)
            noises = jnp.full((2 * num, 1), noise_level, dtype=x_t.dtype)
            if use_fast and hasattr(fast_apply, "prepare"):
                x0 = fast_apply.apply_prepared(prepared, x2, noises, labels_cat)
            elif use_fast:
                x0 = fast_apply(prepared, x2, noises, labels_cat)
            elif pipeline_fn is not None:
                # GPipe-staged forward over the mesh 'model' axis
                x0 = pipeline_fn(prepared, x2, noises, labels_cat)
            else:
                # kwarg only when set: custom model objects with the
                # plain apply signature keep working on the native grid
                x0 = model.apply(
                    {"params": prepared}, x2, noises, labels_cat,
                    **({} if pos_override is None
                       else {"pos_embed_override": pos_override}))
            out = _cfg_combine(x0[:num], x0[num:], class_guidance,
                               noise_level)
            # affine-in-prediction conversion commutes with CFG, so one
            # conversion on the combined output is exact
            return prediction_to_x0(out, x_t, noise_level, pred_kind)

        use_cache = (cache_interval > 1 and use_fast
                     and hasattr(fast_apply, "apply_prepared_cached"))
        if cache_interval > 1 and not use_cache:
            import warnings

            warnings.warn(
                "cache_interval > 1 requires the fused engine (fast_apply "
                "with apply_prepared_cached) and <= 256 tokens; falling "
                "back to exact sampling", stacklevel=2)

        def pred_x0_cached(prepared, x_t, labels_cat, noise_level,
                           class_guidance, delta, refresh):
            num = x_t.shape[0]
            x2 = jnp.concatenate([x_t, x_t], axis=0)
            noises = jnp.full((2 * num, 1), noise_level, dtype=x_t.dtype)
            x0, delta = fast_apply.apply_prepared_cached(
                prepared, x2, noises, labels_cat, delta, refresh)
            out = _cfg_combine(x0[:num], x0[num:], class_guidance,
                               noise_level)
            return (prediction_to_x0(out, x_t, noise_level, pred_kind),
                    delta)

        @jax.jit
        def run(params, x_init, labels_cat, noise_levels, c1, c2,
                class_guidance, context=None, noise_key=None):
            prepared = prepare(params)
            pos = _pos_override(params)

            def step(carry, inputs):
                x_t, x0_prev = carry
                if fresh_noise or eta:
                    i, curr, nxt, a, b = inputs
                else:
                    curr, nxt, a, b = inputs
                x0 = pred_x0(prepared, x_t, labels_cat, curr, class_guidance,
                             context, pos)
                d = a * x0 + b * x0_prev
                if fresh_noise or eta:
                    # noise_key is PER-IMAGE (num_imgs keys): each
                    # image's noise stream depends only on its own key,
                    # so micro-batched requests reproduce their solo
                    # results regardless of batch composition
                    eps = jax.vmap(
                        lambda k: jax.random.normal(
                            jax.random.fold_in(k, i), x_t.shape[1:],
                            x_t.dtype))(noise_key)
                if fresh_noise:
                    # consistency-style multistep: re-noise the x0
                    # estimate with FRESH noise to the next level
                    # (x_t is discarded — the model is its own solver)
                    x_t = nxt * eps + (1.0 - nxt) * d
                elif eta == 1.0:
                    # endpoint special-cased at trace time (eta is a
                    # compile-time constant) so eta=1 emits the
                    # IDENTICAL expression to the fresh_noise branch —
                    # XLA's FMA contraction would otherwise perturb the
                    # bit-equality the tests pin
                    x_t = nxt * eps + (1.0 - nxt) * d
                elif eta:
                    # eta-stochastic DDIM: under this schedule's
                    # corruption x_t = s*eps + (1-s)*x0, the current
                    # state implies eps_hat = (x_t - (1-s)*d)/s; mixing
                    # sqrt(1-eta^2)*eps_hat + eta*eps_fresh keeps the
                    # noise component unit-variance (the interpolation
                    # analogue of DDIM's eta, Song et al. 2020 §4.1),
                    # so eta=0 IS the deterministic DDIM update below
                    # and eta=1 IS the fresh-noise ancestral path above
                    # (same per-image noise streams; equality-tested)
                    eps_hat = (x_t - (1.0 - curr) * d) / curr
                    mix = (math.sqrt(1.0 - eta * eta) * eps_hat
                           + eta * eps)
                    x_t = nxt * mix + (1.0 - nxt) * d
                else:
                    x_t = ((curr - nxt) * d + nxt * x_t) / curr
                return (x_t, x0), None

            def step_heun(carry, inputs):
                # Heun's method on the interpolation ODE
                # dx/ds = (x - x0(x, s)) / s, whose Euler step IS the
                # DDIM update above: one predictor Euler step to the
                # next level, one corrector eval there, average the two
                # slopes. Second-order accurate — 2 denoiser calls per
                # step, so compare at matched NFE (heun n == ddim 2n).
                x_t, _ = carry
                curr, nxt, a, b = inputs
                x0_a = pred_x0(prepared, x_t, labels_cat, curr,
                               class_guidance, context, pos)
                k1 = (x_t - x0_a) / curr
                x_e = x_t + (nxt - curr) * k1
                x0_b = pred_x0(prepared, x_e, labels_cat, nxt,
                               class_guidance, context, pos)
                k2 = (x_e - x0_b) / nxt
                x_t = x_t + (nxt - curr) * 0.5 * (k1 + k2)
                return (x_t, x0_a), None

            def step_cached(carry, inputs):
                x_t, x0_prev, delta = carry
                i, curr, nxt, a, b = inputs
                refresh = (i % cache_interval) == 0
                x0, delta = pred_x0_cached(
                    prepared, x_t, labels_cat, curr, class_guidance,
                    delta, refresh)
                d = a * x0 + b * x0_prev
                x_t = ((curr - nxt) * d + nxt * x_t) / curr
                return (x_t, x0, delta), None

            xs = (
                noise_levels[:-1],
                noise_levels[1:],
                c1,
                c2,
            )
            if use_cache:
                cfg = fast_apply.cfg
                b2 = 2 * x_init.shape[0]
                n_tok = (x_init.shape[-1] // cfg.patch_size) ** 2
                delta0 = jnp.zeros((b2, n_tok, cfg.embed_dim),
                                   dtype=fast_apply.dtype)
                (x_t, _, _), _ = jax.lax.scan(
                    step_cached,
                    (x_init, jnp.zeros_like(x_init), delta0),
                    (jnp.arange(n_steps),) + xs, length=n_steps,
                )
            else:
                step_xs = ((jnp.arange(n_steps),) + xs
                           if (fresh_noise or eta) else xs)
                (x_t, _), _ = jax.lax.scan(
                    step_heun if heun else step,
                    (x_init, jnp.zeros_like(x_init)), step_xs,
                    length=n_steps
                )
            # final extra denoise at the last level (reference diffusion.py:85)
            x0 = pred_x0(prepared, x_t, labels_cat, noise_levels[-1],
                         class_guidance, context, pos)
            return x0

        @jax.jit
        def run_masked(params, x_init, labels_cat, noise_levels, c1, c2,
                       class_guidance, mask, init, eps, context=None):
            """Inpainting scan: after each update the keep region (mask=0)
            is pinned back onto the forward-corruption trajectory
            `sigma*eps + (1-sigma)*init` of the original latent at the
            step's target noise level, so the model only ever sees a
            consistent keep region while it fills the mask=1 region."""
            prepared = prepare(params)
            pos = _pos_override(params)

            def step(carry, inputs):
                x_t, x0_prev = carry
                curr, nxt, a, b = inputs
                x0 = pred_x0(prepared, x_t, labels_cat, curr, class_guidance,
                             context, pos)
                d = a * x0 + b * x0_prev
                x_t = ((curr - nxt) * d + nxt * x_t) / curr
                x_keep = nxt * eps + (1.0 - nxt) * init
                x_t = mask * x_t + (1.0 - mask) * x_keep
                return (x_t, x0), None

            xs = (noise_levels[:-1], noise_levels[1:], c1, c2)
            (x_t, _), _ = jax.lax.scan(
                step, (x_init, jnp.zeros_like(x_init)), xs, length=n_steps)
            x0 = pred_x0(prepared, x_t, labels_cat, noise_levels[-1],
                         class_guidance, context, pos)
            return mask * x0 + (1.0 - mask) * init

        self._compiled[key] = run_masked if masked else run
        return self._compiled[key]

    def initialize_image(self, seeds, num_imgs, img_size, seed):
        """Seeded gaussian init. Parity: reference diffusion.py:105-120."""
        # sampler state stays float32 regardless of model compute dtype:
        # 50 accumulating update steps in bf16 would drift past the 1e-2
        # parity budget; the model casts activations internally.
        if seeds is None:
            shape = (num_imgs, self.model.n_channels, img_size, img_size)
            cpu = None
            if self.noise_on_host:
                try:
                    cpu = jax.devices("cpu")[0]
                except RuntimeError:
                    cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    return jax.random.normal(jax.random.PRNGKey(seed),
                                             shape, dtype=jnp.float32)
            return jax.random.normal(jax.random.PRNGKey(seed), shape,
                                     dtype=jnp.float32)
        return jnp.asarray(seeds, dtype=jnp.float32)

    def generate(
        self,
        labels,  # (num_imgs, text_emb_size) embeddings to condition on
        n_iter: int = 30,
        num_imgs: int = 16,
        class_guidance: float = 3,
        seed: int = 10,
        scale_factor: float = 8,  # latent scaling before decode (~latent std)
        img_size: int = 32,  # height/width of the latent
        sharp_f: float = 0.1,
        bright_f: float = 0.1,
        exponent: float = 1,
        seeds=None,
        noise_levels=None,
        use_ddpm_plus: bool = True,
        cache_interval: int = 1,
        output: str = "float",
        negative_labels=None,
        init_latents=None,
        strength: float = 1.0,
        mask=None,
        context_latents=None,
        fresh_noise: bool = False,
        fresh_noise_keys=None,
        clamp_first: bool = True,
        cfg_rescale: float = 0.0,
        guidance_interval=None,
        sampler=None,
        schedule: str = "poly",
        eta: float = 0.0,
        schedule_shift=None,
    ):
        """Generate images via reverse diffusion.

        Returns (decoded images (N,3,H,W) as a jnp array — or None if no
        VAE is attached — and the x0 latents (N,C,S,S)).
        Parity: reference DiffusionGenerator.generate (diffusion.py:29-92).

        Beyond reference:
        - negative_labels: embeddings for the CFG "uncond" half — guidance
          steers away from them (the reference always uses the zero
          vector, which stays the default).
        - init_latents + strength: img2img. The schedule's first
          (1-strength) fraction of steps is skipped and x_t starts from
          the training-style corruption `sigma0*noise + (1-sigma0)*init`
          (reference train.py:130) at the first remaining noise level.
          strength=1 runs the full schedule (init still mixed at the
          0.99 top level). init_latents are in sampler latent units
          (i.e. VAE latents / scale_factor).
        - mask (requires init_latents): inpainting. Latent-space mask
          broadcastable to the latent shape, 1 = generate, 0 = keep;
          after every step the keep region is pinned to the original
          latent's forward-corruption trajectory (same fixed noise draw
          as the start), and the final output keeps it exactly.
        - context_latents: extra conditioning channels for a
          widened-input (outpainting) model — broadcastable to
          (num_imgs, input_channels - n_channels, S, S), concatenated
          after the noisy latent at EVERY denoiser call on both CFG
          halves. A widened model sampled without context gets zeros.
        - fresh_noise=True: consistency-style multistep update — each
          step re-noises the x0 estimate to the next level with FRESH
          per-step noise (x_next = sigma'*eps_new + (1-sigma')*x0)
          instead of the deterministic DDIM reuse of x_t. This is the
          multistep sampler for consistency-distilled models
          (train/distill.py); on an ordinary denoiser it is ancestral-
          style stochastic sampling. Deterministic per seed. DDIM
          update only (use_ddpm_plus must be False); excludes mask.
        - clamp_first=False skips the reference's first-level 0.99 clamp
          on an explicitly-passed noise_levels (internal/testing knob).
        - cfg_rescale in [0, 1]: guidance-rescale (Lin et al. 2023) —
          rescales the combined prediction's per-sample std back toward
          the cond half's std before the x0 conversion, countering the
          over-saturation of large guidance scales. 0 (default) = exact
          reference combine.
        - guidance_interval=(lo, hi): apply CFG only at noise levels in
          [lo, hi] (Kynkäänniemi et al. 2024); outside the interval the
          cond prediction is used unchanged. None (default) = always.
          Both knobs are compile-time constants of the cached scan (see
          cfg_combine).
        - sampler: "ddim" / "dpm" / "heun". None (default) keeps the
          reference selection via use_ddpm_plus; a non-None sampler
          overrides use_ddpm_plus. "heun" is Heun's second-order method
          on the interpolation ODE (2 denoiser calls per step — compare
          at matched NFE: heun n_iter=k ~ ddim n_iter=2k); it excludes
          mask / fresh_noise / cache_interval.
        - schedule: noise-level spacing when noise_levels is None —
          "poly" (reference `1 - t^exponent`, default), "cosine", or
          "karras" (rho=7 NSR spacing; see make_noise_levels).
        - eta in [0, 1]: stochastic DDIM (the interpolation analogue of
          DDIM's eta, Song et al. 2020 §4.1). Each step replaces an
          eta-fraction of the state's implied noise with a fresh draw:
          eta=0 (default) is the exact deterministic DDIM update, eta=1
          is exactly the fresh_noise ancestral path (same per-image
          noise streams). Requires the DDIM update (sampler="ddim" or
          use_ddpm_plus=False — the DPM++ multistep history assumes a
          deterministic trajectory); excludes mask / fresh_noise /
          cache_interval > 1. Deterministic per seed; a compile-time
          constant of the cached scan (zero cost when 0).
        - schedule_shift: resolution-dependent schedule shift (Esser et
          al. 2024, SD3; see shift_noise_levels). A float > 0 maps every
          noise level via s' = k*s/(1+(k-1)*s) (k > 1 = more time at
          high noise); "auto" uses k = img_size / native size — the
          sqrt-token-ratio rule — so hi-res sampling of an upsampled /
          multires model re-balances the solver grid the same way the
          training-side TrainConfig.schedule_shift="auto" re-balances
          the noise draw. None (default) / 1.0 = exact reference grid.
          Applies on the host to whatever levels are in effect
          (n_iter/exponent/schedule or explicit noise_levels) — the
          levels are a traced argument, so no recompile per shift.

        cache_interval > 1 enables Delta-DiT-style block caching on the
        fused engine: the middle layer groups are recomputed only every
        `cache_interval`-th step and their cached residual contribution is
        reused in between. Opt-in lossy acceleration; 1 = exact (default).

        output="uint8" quantizes the decoded images ON DEVICE to
        (N, H, W, 3) uint8 — the same clip + (x*255+0.5) math
        utils.to_pil applies on host — so serving paths transfer 4x
        fewer bytes off-chip (device->host is the serving bottleneck on
        tunneled runtimes). "float" (default) keeps the reference's
        (N, 3, H, W) float convention.
        """
        if sampler is None:
            sampler = "dpm" if use_ddpm_plus else "ddim"
        if sampler not in ("ddim", "dpm", "heun"):
            raise ValueError(f"unknown sampler {sampler!r}; expected "
                             f"'ddim', 'dpm' or 'heun'")
        use_ddpm_plus = sampler == "dpm"
        heun = sampler == "heun"
        if heun:
            if mask is not None:
                raise ValueError("sampler='heun' does not compose with "
                                 "inpainting (use ddim/dpm)")
            if fresh_noise:
                raise ValueError("fresh_noise is its own (consistency-"
                                 "multistep) update; it excludes "
                                 "sampler='heun'")
            if cache_interval > 1:
                raise ValueError("cache_interval > 1 (block caching) "
                                 "assumes the DDIM/DPM scan body; it "
                                 "excludes sampler='heun'")
        eta = float(eta)
        if not 0.0 <= eta <= 1.0:
            raise ValueError(f"eta must be in [0, 1], got {eta}")
        if eta:
            if use_ddpm_plus or heun:
                raise ValueError(
                    "eta > 0 (stochastic DDIM) requires the DDIM update "
                    "— pass sampler='ddim' or use_ddpm_plus=False (the "
                    "DPM++/heun multistep history assumes a "
                    "deterministic trajectory)")
            if fresh_noise:
                raise ValueError("fresh_noise IS eta=1; pass one or the "
                                 "other")
            if mask is not None:
                raise ValueError("eta > 0 does not compose with "
                                 "inpainting (the keep-region pinning "
                                 "assumes the deterministic DDIM update)")
        if noise_levels is None:
            noise_levels = make_noise_levels(n_iter, exponent, schedule)
        else:
            noise_levels = np.asarray(noise_levels, dtype=np.float64).copy()
            if clamp_first:
                noise_levels[0] = 0.99
        if schedule_shift is not None:
            if schedule_shift == "auto":
                native = getattr(self.model, "image_size", None)
                if not native:
                    raise ValueError(
                        "schedule_shift='auto' needs the model's native "
                        "image_size; pass an explicit float shift")
                schedule_shift = img_size / native
            if float(schedule_shift) != 1.0:  # identity: keep bit-exact
                noise_levels = shift_noise_levels(noise_levels,
                                                  schedule_shift)
        if init_latents is not None:
            if not 0.0 < strength <= 1.0:
                raise ValueError(f"strength must be in (0, 1], got {strength}")
            # skip the first (1-strength) fraction of the schedule, then
            # start from the corruption the model was trained to invert
            n_skip = min(int(round((1.0 - strength) * (len(noise_levels) - 1))),
                         len(noise_levels) - 2)
            noise_levels = noise_levels[n_skip:]
        c1, c2 = make_step_coeffs(noise_levels, use_ddpm_plus)
        n_steps = len(noise_levels) - 1

        if mask is not None and init_latents is None:
            raise ValueError("mask requires init_latents (inpainting is "
                             "masked img2img)")
        if fresh_noise:
            if mask is not None:
                raise ValueError("fresh_noise does not compose with "
                                 "inpainting (the keep-region pinning "
                                 "assumes the deterministic DDIM update)")
            if use_ddpm_plus:
                raise ValueError("fresh_noise replaces the deterministic "
                                 "update entirely; pass use_ddpm_plus="
                                 "False (the DPM++ multistep history is "
                                 "meaningless across re-noising)")
        noise = self.initialize_image(seeds, num_imgs, img_size, seed)
        x_t = noise
        if init_latents is not None:
            sigma0 = float(noise_levels[0])
            init = jnp.asarray(init_latents, dtype=jnp.float32)
            x_t = sigma0 * noise + (1.0 - sigma0) * init
        n_ch = getattr(self.model, "n_channels", x_t.shape[1])
        in_ch = getattr(self.model, "input_channels", None) or n_ch
        ctx = None
        if in_ch > n_ch:
            extra = (x_t.shape[0], in_ch - n_ch) + x_t.shape[2:]
            if context_latents is None:
                # widened model without context: zeros = "fully unknown"
                ctx = jnp.zeros(extra, dtype=jnp.float32)
            else:
                ctx = jnp.broadcast_to(
                    jnp.asarray(context_latents, dtype=jnp.float32), extra)
        elif context_latents is not None:
            raise ValueError(
                "context_latents requires a widened-input model "
                "(DenoiserConfig.input_channels > n_channels)")
        labels = jnp.asarray(labels, dtype=jnp.float32)
        uncond = (jnp.zeros_like(labels) if negative_labels is None
                  else jnp.broadcast_to(
                      jnp.asarray(negative_labels, dtype=jnp.float32),
                      labels.shape))
        labels_cat = jnp.concatenate([labels, uncond], axis=0)

        if self.mesh is not None:
            # batch-data-parallel generation over the mesh 'data' axis;
            # GSPMD partitions the whole scan (CFG double-batch keeps the
            # cond/uncond halves aligned shard-by-shard since labels_cat
            # is [labels; zeros] with the same per-shard layout)
            from transformer_latent_diffusion_tpu.parallel import (
                batch_sharding,
                param_shardings,
            )

            x_t = jax.device_put(x_t, batch_sharding(self.mesh))
            labels_cat = jax.device_put(labels_cat, batch_sharding(self.mesh))
            if ctx is not None:
                ctx = jax.device_put(ctx, batch_sharding(self.mesh))
            # place params once per distinct tree (memoized on identity);
            # re-placing 101M params on every request would re-upload the
            # whole tree to the mesh each call. param_shardings applies
            # Megatron-style TP rules when the mesh has a model axis > 1
            # (tensor-parallel generation; XLA inserts the all-reduces)
            # and degenerates to full replication on data-only meshes.
            if getattr(self, "_mesh_placed_params", None) is not self.params:
                # under pipeline parallelism the 'model' axis carries
                # stages, not sharded matmuls: skip the Megatron rules
                # (the stacked stage weights are constrained inside
                # PipelinedDenoiser itself)
                self.params = jax.device_put(
                    self.params, param_shardings(
                        self.params, self.mesh,
                        tp=self.pipeline_fn is None))
                self._mesh_placed_params = self.params

        if mask is not None or fresh_noise or eta:
            cache_interval = 1  # block caching: plain DDIM/DPM scans only
        if not 0.0 <= cfg_rescale <= 1.0:
            raise ValueError(f"cfg_rescale must be in [0, 1], got "
                             f"{cfg_rescale}")
        if guidance_interval is not None:
            lo, hi = guidance_interval
            if not 0.0 <= lo <= hi <= 1.0:
                raise ValueError(f"guidance_interval must satisfy 0 <= lo "
                                 f"<= hi <= 1, got {guidance_interval}")
            guidance_interval = (float(lo), float(hi))
        run = self._sample_fn(n_steps, tuple(x_t.shape), cache_interval,
                              masked=mask is not None,
                              ctx_channels=0 if ctx is None else ctx.shape[1],
                              fresh_noise=fresh_noise,
                              cfg_rescale=float(cfg_rescale),
                              guidance_interval=guidance_interval,
                              heun=heun, eta=eta)
        args = (
            self.params,
            x_t,
            labels_cat,
            jnp.asarray(noise_levels, dtype=jnp.float32),
            jnp.asarray(c1, dtype=jnp.float32),
            jnp.asarray(c2, dtype=jnp.float32),
            jnp.asarray(class_guidance, dtype=jnp.float32),
        )
        if mask is not None:
            # normalize any broadcastable mask (scalar, (S,S), (1,1,S,S))
            # to the full latent shape so downstream indexing (m[:, 0]
            # below) is well-defined regardless of the input rank
            m = jnp.broadcast_to(jnp.asarray(mask, dtype=jnp.float32),
                                 x_t.shape)
            args += (m, init, noise)
        kw = {}
        if ctx is not None:
            kw["context"] = ctx
        if fresh_noise or eta:
            if fresh_noise_keys is not None:
                # per-request streams (serving micro-batcher): one key
                # per image, built by the caller from each request's
                # own seed via fresh_noise_image_keys
                kw["noise_key"] = jnp.asarray(fresh_noise_keys)
                if kw["noise_key"].shape[0] != num_imgs:
                    raise ValueError(
                        f"fresh_noise_keys carries "
                        f"{kw['noise_key'].shape[0]} keys for "
                        f"{num_imgs} images")
            else:
                # independent stream from the init-noise draw at the
                # same seed; one key PER IMAGE (see step())
                kw["noise_key"] = fresh_noise_image_keys(seed, num_imgs)
        x0 = run(*args, **kw)

        # latent "editing": sharpness / brightness channel shifts
        # (reference diffusion.py:87-89). Under an inpainting mask the
        # shifts apply only to the regenerated region — the keep region
        # must stay bit-exact.
        shift = 1.0 if mask is None else m[:, 0]
        x0 = x0.at[:, 3, :, :].add(sharp_f * shift)
        x0 = x0.at[:, 0, :, :].add(bright_f * shift)

        if self.vae is None:
            return None, x0
        img = self.vae.decode(x0 * scale_factor)
        if output == "uint8":
            if "post_u8" not in self._compiled:
                @jax.jit
                def post(img):
                    u = jnp.clip((img.astype(jnp.float32) + 1.0) * 0.5,
                                 0.0, 1.0) * 255.0 + 0.5
                    return jnp.transpose(u, (0, 2, 3, 1)).astype(jnp.uint8)

                self._compiled["post_u8"] = post
            img = self._compiled["post_u8"](img)
        return img, x0
