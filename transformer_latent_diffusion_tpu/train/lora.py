"""LoRA: low-rank-adapter fine-tuning of the denoiser (beyond reference).

The reference fine-tunes by continuing full training on new data
(README.md "Training Details" — the 512/1024px runs update all 101M
params). LoRA trains only rank-r factors `W + (alpha/r) * A @ B` on the
transformer's dense projections — the train state (adapters + Adam
moments + EMA) is ~0.5% of the full model at rank 8, adapters are a few
MB to checkpoint/share, and the base weights are untouched, so many
task adapters can hang off one base checkpoint.

TPU-first design: adapters are merged into the full parameter tree
*inside* the jitted step (`merge_lora` — a handful of tiny (in,r)x(r,out)
GEMMs plus an elementwise add, negligible next to the forward), and the
loss (train.build_loss_fn — the exact reference semantics) is
differentiated with respect to the adapters only. Because the merge
happens *outside* `model.apply`, the chain rule routes dL/dW through
A@B automatically — which means the fused Pallas VJP kernels (which
return dL/dW) compose with LoRA unchanged, and the merged tree works
with every sampler path (XLA, fused inference engine, int8) with zero
inference-time overhead once merged.

No reference equivalent; the fine-tune entry mirrors
/root/reference/tld/train.py:62's loop shape.
"""

from __future__ import annotations

from dataclasses import asdict
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Dense kernels that receive adapters by default: attention QKV/Q/KV
# projections and both MLP projections, in every decoder block. (The
# depthwise 3x3, norms, patch/out projections and the conditioning
# MLPs stay frozen — standard LoRA practice, and they are <3% of
# params anyway.)
DEFAULT_TARGETS: Tuple[str, ...] = (
    "self_attention/qkv_linear/kernel",
    "cross_attention/q_linear/kernel",
    "cross_attention/kv_linear/kernel",
    "mlp/expand/kernel",
    "mlp/contract/kernel",
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def init_lora_params(params, rank: int, seed: int = 0,
                     targets: Tuple[str, ...] = DEFAULT_TARGETS
                     ) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Zero-effect adapters for every targeted 2-D kernel in `params`.

    Returns a flat dict {param_path: {"a": (in, r), "b": (r, out)}}.
    A ~ N(0, 1/sqrt(in)) and B = 0, so merge_lora(params, lora) equals
    `params` exactly at init (the fine-tune starts from the base
    model's function, the LoRA-paper initialization).
    """
    if rank < 1:
        raise ValueError(f"lora rank must be >= 1, got {rank}")
    key = jax.random.PRNGKey(seed)
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        p = _path_str(path)
        if leaf.ndim == 2 and any(p.endswith(t) for t in targets):
            key, k_a = jax.random.split(key)
            d_in, d_out = leaf.shape
            lora[p] = {
                "a": (jax.random.normal(k_a, (d_in, rank), jnp.float32)
                      / np.sqrt(d_in)),
                "b": jnp.zeros((rank, d_out), jnp.float32),
            }
    if not lora:
        raise ValueError(
            f"no 2-D kernels matched lora targets {targets}")
    return lora


def merge_lora(params, lora: Dict[str, Dict[str, jnp.ndarray]],
               scale: float = 1.0):
    """params with `scale * A @ B` added to each adapted kernel.

    Differentiable with respect to `lora`; the A@B product runs in f32
    and is cast to the kernel's dtype at the add. Every adapter entry
    must match a param leaf — adapters trained for a different model
    config (or with typo'd targets) raise instead of silently no-oping.
    """
    matched = set()

    def _merge(path, leaf):
        p = _path_str(path)
        ab = lora.get(p)
        if ab is None:
            return leaf
        matched.add(p)
        delta = (ab["a"].astype(jnp.float32)
                 @ ab["b"].astype(jnp.float32)) * scale
        return leaf + delta.astype(leaf.dtype)

    out = jax.tree_util.tree_map_with_path(_merge, params)
    unmatched = sorted(set(lora) - matched)
    if unmatched:
        raise ValueError(
            "lora adapters matched no param leaf (wrong model config or "
            f"targets?): {unmatched}")
    return out


def count_lora_parameters(lora) -> int:
    return sum(int(np.prod(v.shape)) for v in jax.tree.leaves(lora))


def save_lora(path: str, lora, scale: float = 1.0, raw=None) -> None:
    """Adapters -> one .npz (keys `<param_path>::a` / `::b`, plus the
    merge scale). A rank-8 adapter set for the 101M model is ~3 MB.

    `lora` is what loads by default (the debiased-EMA adapters in
    lora_finetune's checkpoints); `raw`, if given, stores the last-step
    non-averaged adapters under a `raw::` prefix
    (load_lora_file(..., which="raw"))."""
    flat = {}
    for p, ab in lora.items():
        flat[f"{p}::a"] = np.asarray(ab["a"], np.float32)
        flat[f"{p}::b"] = np.asarray(ab["b"], np.float32)
    if raw is not None:
        for p, ab in raw.items():
            flat[f"raw::{p}::a"] = np.asarray(ab["a"], np.float32)
            flat[f"raw::{p}::b"] = np.asarray(ab["b"], np.float32)
    flat["__scale__"] = np.float32(scale)
    with open(path, "wb") as f:
        np.savez(f, **flat)


def load_lora_file(path: str, which: str = "ema"):
    """-> (lora dict, scale) as saved by save_lora.

    which: "ema" (default — the debiased-EMA adapters) or "raw" (the
    last-step adapters, present when the file was written with raw=...)."""
    if which not in ("ema", "raw"):
        raise ValueError(f"which must be 'ema' or 'raw', got {which!r}")
    data = np.load(path)
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for k in data.files:
        if k == "__scale__":
            continue
        is_raw = k.startswith("raw::")
        if is_raw != (which == "raw"):
            continue
        p, part = (k[len("raw::"):] if is_raw else k).rsplit("::", 1)
        lora.setdefault(p, {})[part] = jnp.asarray(data[k])
    if which == "raw" and not lora:
        raise ValueError(f"{path} holds no raw:: adapter entries")
    scale = float(data["__scale__"]) if "__scale__" in data.files else 1.0
    return lora, scale


def debias_ema_lora(ema, init, alpha: float, step: int):
    """Undo the zero-effect-init bias of the adapter EMA.

    EMA starts at the init adapters (B=0 => zero effect), so after N
    steps it is down-weighted toward the base model by alpha^N — an
    82%-toward-zero anchor at N=200. Standard correction (ema_N =
    alpha^N*init + (1-alpha)*sum alpha^(N-k)*x_k): subtract the decayed
    init and renormalize by 1-alpha^N. Exact for any init."""
    if step <= 0:
        return ema
    w = 1.0 - alpha**step
    decay = alpha**step
    return jax.tree.map(
        lambda e, i: (np.asarray(e, np.float32)
                      - decay * np.asarray(i, np.float32)) / w,
        ema, init)


def lora_finetune(config, init_params: Optional[Any] = None
                  ) -> Dict[str, Any]:
    """LoRA fine-tune loop: `TrainConfig.lora_rank > 0` routes
    `train.main` here. Same data/noise/loss semantics as the main loop;
    only the adapters train (Adam + EMA over the adapter tree).

    init_params: the BASE checkpoint to adapt (normally a trained
    model; random init — the default — only makes sense in tests).
    Adapters save to `checkpoint_dir/<model_name>/lora.npz` every
    `save_and_eval_every_iters` steps and at the end; load them with
    `DiffusionTransformer.load_lora` or merge_lora. Parallelism: data
    parallelism via GSPMD over the mesh 'data' axis; TP/PP/FSDP are
    refused (adapt those runs with full fine-tuning).
    """
    import os

    from transformer_latent_diffusion_tpu.configs import resolve_dtype
    from transformer_latent_diffusion_tpu.data.loader import LatentBatcher
    from transformer_latent_diffusion_tpu.models.denoiser import Denoiser
    from transformer_latent_diffusion_tpu.parallel import (
        batch_sharding,
        create_mesh,
        initialize_distributed,
        replicated,
    )
    from transformer_latent_diffusion_tpu.train.train import (
        build_loss_fn,
        make_grads_of,
        make_optimizer,
        update_ema,
    )
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    denoiser_config = config.denoiser_config
    train_config = config.train_config
    rank = int(train_config.lora_rank)
    alpha = (float(train_config.lora_alpha)
             if train_config.lora_alpha is not None else float(rank))
    scale = alpha / rank
    targets = tuple(train_config.lora_targets or DEFAULT_TARGETS)

    if train_config.use_wandb or train_config.run_id:
        import warnings

        warnings.warn(
            "lora_finetune ignores use_wandb/run_id (no wandb logging or "
            "run resume in LoRA mode yet); losses are returned and "
            "adapters checkpoint to <run>/lora.npz", stacklevel=2)
    if train_config.fsdp or train_config.pipeline_parallel:
        raise ValueError("lora_rank > 0 does not compose with "
                         "fsdp/pipeline_parallel: the base params are "
                         "frozen and replicated — use full fine-tuning "
                         "for sharded-parameter runs")
    if (train_config.mesh_shape is not None
            and len(train_config.mesh_shape) > 1
            and train_config.mesh_shape[1] > 1):
        raise ValueError("lora_rank > 0 supports data parallelism only "
                         "(mesh_shape=(n, 1)); tensor parallelism would "
                         "shard the frozen base params")

    initialize_distributed()
    mesh = create_mesh(train_config.mesh_shape)
    is_main = jax.process_index() == 0

    def log(*a):
        if is_main:
            print(*a, flush=True)

    if getattr(config.data_config, "extra_latent_paths", ()):
        raise ValueError("multi-resolution training (extra_latent_paths) "
                         "is not supported by the LoRA fine-tune; train "
                         "full-rank or drop the extra buckets")
    batcher = LatentBatcher(
        config.data_config.latent_path, config.data_config.text_emb_path,
        batch_size=train_config.batch_size, seed=train_config.seed,
        holdout=train_config.val_holdout,
    )

    compute_dtype = resolve_dtype(train_config.compute_dtype)
    on_tpu = jax.default_backend() not in ("cpu",)
    # multi-device runs take the GSPMD DP path (grads of the tiny
    # adapter tree all-reduce over ICI) — Pallas is not
    # GSPMD-partitionable, so the fused kernels are single-device only
    single = mesh.size == 1
    from transformer_latent_diffusion_tpu.train.train import (
        resolve_fused_flags,
    )
    fused_layer, fused_mlp, fused_attn = (
        resolve_fused_flags(train_config, on_tpu) if single
        else (False, False, False))
    model = Denoiser(**asdict(denoiser_config), dtype=compute_dtype,
                     use_pallas=on_tpu and single,
                     fused_layer_vjp=fused_layer, fused_mlp_vjp=fused_mlp,
                     fused_attn_vjp=fused_attn)

    if init_params is not None:
        base = jax.tree.map(jnp.asarray, init_params)
    else:
        log("lora_finetune: no init_params — adapting a RANDOM base "
            "(only meaningful in tests)")
        base = init_denoiser_params(model, denoiser_config,
                                    seed=train_config.seed)

    lora = init_lora_params(base, rank, seed=train_config.seed,
                            targets=targets)
    # host copy of the init adapters: needed to debias the EMA at save
    # time (the EMA is anchored at this zero-effect init)
    init_lora_host = jax.tree.map(np.asarray, jax.device_get(lora))
    log(f"lora rank {rank} (alpha {alpha}): "
        f"{count_lora_parameters(lora)} trainable / "
        f"{sum(int(np.prod(p.shape)) for p in jax.tree.leaves(base))} base "
        f"params, {len(lora)} adapted kernels")

    optimizer = make_optimizer(train_config)
    opt_state = optimizer.init(lora)

    loss_fn = build_loss_fn(model, train_config,
                            config.vae_cfg.vae_scale_factor)

    def lora_loss(lora_p, x, y, rng):
        return loss_fn(merge_lora(base, lora_p, scale), x, y, rng)

    grads_of = make_grads_of(lora_loss, train_config.grad_accum_steps)

    def lora_step(state, x, y, rng):
        loss, grads = grads_of(state["lora"], x, y, rng)
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["lora"])
        new_lora = jax.tree.map(
            lambda p, u: p + u, state["lora"], updates)
        return {
            "lora": new_lora,
            "ema_lora": update_ema(state["ema_lora"], new_lora,
                                   train_config.alpha),
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }, loss

    rep = replicated(mesh)
    b_shard = batch_sharding(mesh)
    base = jax.device_put(base, jax.tree.map(lambda _: rep, base))
    state = {
        "lora": lora,
        "ema_lora": jax.tree.map(jnp.copy, lora),
        "opt_state": opt_state,
        "step": jnp.asarray(0),
    }
    state = jax.device_put(state, jax.tree.map(lambda _: rep, state))
    donate = (0,) if train_config.compile else ()
    lora_step = jax.jit(lora_step, donate_argnums=donate)

    run_dir = os.path.join(train_config.checkpoint_dir,
                           train_config.model_name or "model")
    lora_path = os.path.join(run_dir, "lora.npz")

    def save_now():
        if is_main and train_config.save_model:
            os.makedirs(run_dir, exist_ok=True)
            # EMA adapters, matching the main loop's checkpoint-the-EMA
            # semantics (reference train.py:149-158) — debiased so short
            # runs are not down-weighted toward the zero-effect init —
            # plus the raw last-step adapters under raw:: keys
            step_now = int(jax.device_get(state["step"]))
            ema_host = jax.device_get(state["ema_lora"])
            save_lora(
                lora_path,
                debias_ema_lora(ema_host, init_lora_host,
                                train_config.alpha, step_now),
                scale=scale,
                raw=jax.device_get(state["lora"]))

    # held-out validation loss (TrainConfig.val_holdout), same semantics
    # as train.main: fixed rng, evaluated on what the checkpoints hold —
    # here the debiased-EMA adapters merged into the frozen base.
    val_losses = []
    _val_x = _val_y = _val_rng = None
    if train_config.val_holdout > 0:
        x_val_h, y_val_h = batcher.holdout_batch()
        _val_x = jnp.asarray(x_val_h)
        _val_y = jnp.asarray(y_val_h)
        _val_rng = jax.random.PRNGKey(train_config.seed + 1_000_003)
        val_fn = jax.jit(lora_loss)

    def eval_val_loss():
        if _val_x is None or not is_main:
            return
        step_now = int(jax.device_get(state["step"]))
        ema_now = debias_ema_lora(
            jax.device_get(state["ema_lora"]), init_lora_host,
            train_config.alpha, step_now)
        v = float(val_fn(ema_now, _val_x, _val_y, _val_rng))
        val_losses.append((step_now, v))
        log(f"step {step_now} val_loss {v:.5f}")

    from transformer_latent_diffusion_tpu.train.train import (
        GracefulShutdown,
    )

    rng = jax.random.PRNGKey(train_config.seed)
    losses = []
    global_step = 0
    # same preemption semantics as train.main: SIGTERM/SIGINT finish the
    # in-flight step, fall through to the final save_now, return cleanly
    with GracefulShutdown(enabled=train_config.handle_signals) as shutdown:
        for epoch in range(1, train_config.n_epoch + 1):
            if shutdown.requested:
                break
            log(f"epoch: {epoch}")
            for x_host, y_host in batcher.epoch():
                if shutdown.requested:
                    break
                if (global_step % train_config.save_and_eval_every_iters
                        == 0 and global_step > 0):
                    save_now()
                    eval_val_loss()
                x = jax.device_put(x_host, b_shard)
                y = jax.device_put(y_host, b_shard)
                state, loss = lora_step(
                    state, x, y, jax.random.fold_in(rng, global_step))
                losses.append(loss)
                global_step += 1
                if global_step % 16 == 0:
                    losses[-1] = float(losses[-1])  # bound dispatch queue

    if shutdown.requested:
        log(f"preemption signal received: stopping at step {global_step}")
    save_now()
    eval_val_loss()
    if shutdown.requested and train_config.save_model:
        log(f"preemption checkpoint saved at step {global_step}")
    losses = [float(l) for l in losses]
    if losses:
        log(f"final loss {np.mean(losses[-10:]):.5f}")
    return {"state": state, "losses": losses, "global_step": global_step,
            "lora": debias_ema_lora(jax.device_get(state["ema_lora"]),
                                    init_lora_host, train_config.alpha,
                                    int(jax.device_get(state["step"]))),
            "raw_lora": state["lora"], "scale": scale,
            "val_losses": val_losses,
            "preempted": shutdown.requested,
            "lora_path": lora_path if train_config.save_model else None}
