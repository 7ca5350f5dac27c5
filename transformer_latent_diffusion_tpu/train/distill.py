"""Consistency distillation: few-step generation from a trained denoiser.

The reference lists "how to speed up generation even more - LCMs?" as an
open TODO (reference README.md, TODOS section). This implements
consistency distillation (Song et al. 2023 / latent-consistency-model
style), adapted to this repo's parametrization — x0-prediction under the
linear-interpolation corruption `x_sigma = sigma*eps + (1-sigma)*x`
(reference train.py:130):

- the consistency function is
      f(x, sigma) = (1 - sigma) * x + sigma * F_theta(x, sigma, label)
  so the boundary condition f(x, 0) = x holds by construction
  (c_skip(0)=1, c_out(0)=0) and f equals the raw network at sigma=1,
  where x is pure noise.
- training: sample a segment (sigma_hi -> sigma_lo) of the same
  discretized schedule the sampler uses (make_noise_levels), corrupt
  data to x_hi, take ONE teacher DDIM step — with classifier-free
  guidance baked in, LCM-style, so the student needs no CFG double
  batch — down to x_lo, and pull f_student(x_hi) toward
  stopgrad(f_targetEMA(x_lo)) under a pseudo-huber metric
  (sqrt(d^2 + c^2) - c, the iCT recommendation).

Sampling a distilled model: wrap the network with `consistency_apply`
and use the sampler's fresh-noise multistep update —

    gen = DiffusionGenerator(model=model, params=distilled_ema, vae=vae,
                             fast_apply=consistency_apply(model))
    imgs, _ = gen.generate(labels, n_iter=2..4, use_ddpm_plus=False,
                           fresh_noise=True, class_guidance=1, ...)

(class_guidance=1 — guidance was distilled into the student. The
fast_apply hook applies the wrapper inside the scan; it covers models up
to the fused-engine token gate, i.e. the flagship 256px geometry.)

One XLA dispatch per generation still holds: fewer scan steps, same
machinery. Everything runs on the standard ModelConfig data artifacts.
"""

from __future__ import annotations

from dataclasses import asdict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformer_latent_diffusion_tpu.configs import ModelConfig, resolve_dtype
from transformer_latent_diffusion_tpu.models.denoiser import Denoiser
from transformer_latent_diffusion_tpu.sampling.diffusion import (
    make_noise_levels,
    prediction_to_x0,
)
from transformer_latent_diffusion_tpu.train.train import update_ema


def _consistency_combine(x, noise_level, raw, objective: str = "x0"):
    # raw network prediction -> x0 estimate (per the model's training
    # objective), then the boundary-exact skip combine
    sig = noise_level.reshape(-1, 1, 1, 1).astype(x.dtype)
    x0 = prediction_to_x0(raw, x, noise_level, objective)
    return (1.0 - sig) * x + sig * x0


class _PreparedConsistency:
    """Consistency wrapper keeping the fused engine's prepare protocol,
    so DiffusionGenerator still hoists the weight stacking out of the
    sampling scan (generate's prepare() runs once per dispatch)."""

    # the combined output is an x0-style estimate regardless of the
    # underlying network's objective — tells DiffusionGenerator not to
    # convert again
    output_objective = "x0"

    def __init__(self, inner, objective: str = "x0"):
        self._inner = inner
        self._objective = objective

    def prepare(self, params):
        return self._inner.prepare(params)

    def apply_prepared(self, prepared, x, noise_level, labels):
        raw = self._inner.apply_prepared(prepared, x, noise_level, labels)
        return _consistency_combine(x, noise_level, raw, self._objective)

    def __call__(self, params, x, noise_level, labels):
        return self.apply_prepared(self.prepare(params), x, noise_level,
                                   labels)


def consistency_apply(model: Denoiser, inner=None, objective=None):
    """Wrap a denoiser network as a consistency function
    f(x, sigma) = (1-sigma)*x + sigma*x0(F(x, sigma, labels)).

    `inner` optionally replaces the linen apply: a plain callable of the
    same signature, or a fused TPU engine — its prepare/apply_prepared
    protocol is preserved (weight packing stays hoisted out of the
    sampling scan). `objective` ("x0" | "eps" | "v") is how the raw
    network output maps to an x0 estimate; None reads the model's
    `objective` attribute.
    """
    if objective is None:
        objective = str(getattr(model, "objective", "x0"))
    if inner is not None and hasattr(inner, "prepare"):
        return _PreparedConsistency(inner, objective)
    base = (inner if inner is not None
            else lambda p, x, nl, y: model.apply({"params": p}, x, nl, y))

    def apply(params, x, noise_level, labels):
        return _consistency_combine(x, noise_level,
                                    base(params, x, noise_level, labels),
                                    objective)

    apply.output_objective = "x0"  # see _PreparedConsistency
    return apply


def distill_consistency(
    config: ModelConfig,
    teacher_params: Any,
    n_schedule: int = 50,
    guidance: float = 3.0,
    huber_c: float = 0.03,
    target_ema: float = 0.95,
    init_params: Optional[Any] = None,
    label_dropout: float = 0.0,
) -> Dict[str, Any]:
    """Distill `teacher_params` (a trained denoiser for
    config.denoiser_config) into a few-step consistency model.

    Uses config.data_config latents/text embeddings and
    config.train_config {batch_size, lr, n_epoch, seed}; the schedule
    discretization (n_schedule) should match the sampler's target
    step grid. Returns {params, ema_params (the sampling weights),
    losses, global_step}.

    `label_dropout` zeroes each label with probability p during
    distillation (the training loss's CFG dropout, reference
    train.py:136-138). Essential for the guidance=1.0 recipe
    (VERDICT r4 #1): a guidance-1 student with sampler-side CFG needs a
    TRAINED unconditional branch — without dropout the y=0 behaviour it
    inherited from the teacher decays arbitrarily over distillation.
    Baked-guidance students (guidance > 1) should keep dropout at 0:
    their uncond branch is never sampled (class_guidance=1 at
    inference).
    """
    dcfg = config.denoiser_config
    tcfg = config.train_config
    objective = str(getattr(dcfg, "objective", "x0"))
    compute_dtype = resolve_dtype(tcfg.compute_dtype)
    on_tpu = jax.default_backend() not in ("cpu",)
    model = Denoiser(**asdict(dcfg),
                     dtype=compute_dtype if on_tpu else jnp.float32)

    x_np = np.load(config.data_config.latent_path)
    y_np = np.load(config.data_config.text_emb_path)
    n_data = x_np.shape[0]
    bs = tcfg.batch_size
    teacher_params = jax.tree.map(jnp.asarray, teacher_params)
    params = jax.tree.map(
        jnp.asarray, init_params if init_params is not None
        else teacher_params)
    ema_params = jax.tree.map(jnp.copy, params)

    optimizer = optax.adam(tcfg.lr)
    opt_state = jax.jit(optimizer.init)(params)

    # same discretization the sampler will use (descending, [0]=0.99)
    levels = jnp.asarray(make_noise_levels(n_schedule, 1.0),
                         dtype=jnp.float32)
    vae_scale = float(config.vae_cfg.vae_scale_factor)

    def loss_fn(params, ema_p, x, y, rng):
        r_i, r_eps, r_drop = jax.random.split(rng, 3)
        n = x.shape[0]
        x = x / vae_scale
        if label_dropout > 0:
            keep = (jax.random.uniform(r_drop, (n, 1))
                    >= label_dropout).astype(y.dtype)
            y = y * keep
        i = jax.random.randint(r_i, (n,), 0, n_schedule - 1)
        s_hi = levels[i].reshape(n, 1)
        s_lo = levels[i + 1].reshape(n, 1)
        hi4 = s_hi[:, :, None, None]
        lo4 = s_lo[:, :, None, None]
        eps = jax.random.normal(r_eps, x.shape, dtype=x.dtype)
        x_hi = hi4 * eps + (1.0 - hi4) * x

        # one teacher DDIM step, CFG baked in (one double-batch call);
        # raw predictions map to x0 estimates per the model's objective
        x2 = jnp.concatenate([x_hi, x_hi], axis=0)
        y2 = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
        s2 = jnp.concatenate([s_hi, s_hi], axis=0)
        x0_both = prediction_to_x0(
            model.apply({"params": teacher_params}, x2, s2, y2),
            x2, s2, objective)
        x0_t = (guidance * x0_both[:n]
                + (1.0 - guidance) * x0_both[n:])
        x_lo = ((hi4 - lo4) * x0_t + lo4 * x_hi) / hi4

        f_hi = ((1.0 - hi4) * x_hi
                + hi4 * prediction_to_x0(
                    model.apply({"params": params}, x_hi, s_hi, y),
                    x_hi, s_hi, objective))
        f_lo = ((1.0 - lo4) * x_lo
                + lo4 * prediction_to_x0(
                    model.apply({"params": ema_p}, x_lo, s_lo, y),
                    x_lo, s_lo, objective))
        d = f_hi - jax.lax.stop_gradient(f_lo)
        return jnp.mean(jnp.sqrt(d * d + huber_c**2) - huber_c)

    @jax.jit
    def step(params, ema_params, opt_state, x, y, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, ema_params, x, y, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = update_ema(ema_params, params, target_ema)
        return params, ema_params, opt_state, loss

    rng = np.random.default_rng(tcfg.seed)
    key = jax.random.PRNGKey(tcfg.seed)
    losses = []
    global_step = 0
    for _ in range(tcfg.n_epoch):
        order = rng.permutation(n_data)
        for b in range(n_data // bs):
            idx = order[b * bs:(b + 1) * bs]
            key, sub = jax.random.split(key)
            params, ema_params, opt_state, loss = step(
                params, ema_params, opt_state,
                jnp.asarray(x_np[idx]), jnp.asarray(y_np[idx]), sub)
            losses.append(loss)
            global_step += 1
    return {
        "params": params,
        "ema_params": ema_params,
        "losses": [float(v) for v in losses],
        "global_step": global_step,
    }
