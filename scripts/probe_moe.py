"""MoE on the TPU: measured cost + load-balancing evidence (VERDICT r4 #5).

Round 2 shipped the Switch top-1 MoE FFN (models/moe.py) with
correctness tests (routing, drop behaviour, EP==unsharded, dryrun) but
zero measured TPU numbers. This probe closes that:

  A. COST at the flagship shape: train.main samples/s for
     mlp_class="moe" (8 experts, XLA path — the fused Pallas train
     kernels are gated to sep_conv) vs the dense flagship at matched
     ACTIVE params (same mlp_multiplier; top-1 routing computes one
     expert per token). The honest number includes the gate: dense
     rides the fused per-layer VJP kernels, MoE cannot.
  B. BALANCE on a toy run: aux weight 0.01 vs 0.0 at matched steps;
     per-expert routed fractions (sown into the 'moe_metrics'
     collection) and the loss trace. Done-bar: with the aux loss the
     load spread stays near uniform; without it experts collapse (or
     measurably skew).

Usage (real TPU):  python scripts/probe_moe.py
CPU smoke:         python scripts/probe_moe.py --tiny
Results land in docs/DESIGN.md ("MoE measured").
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.probe_flagship_train import make_dataset  # noqa: E402


def expert_loads(dcfg, params, x, y):
    """Per-layer per-expert routed fractions for a fixed batch."""
    import jax
    import jax.numpy as jnp

    from transformer_latent_diffusion_tpu.models import Denoiser

    model = Denoiser(**dcfg.__dict__)
    noise = jnp.full((x.shape[0], 1), 0.5, jnp.float32)
    _, mut = model.apply({"params": params}, jnp.asarray(x), noise,
                         jnp.asarray(y), mutable=["moe_metrics"])
    loads = [np.asarray(v[0]) for v in jax.tree.leaves(
        mut["moe_metrics"], is_leaf=lambda v: isinstance(v, tuple))]
    return np.stack(loads)  # (n_layers, n_experts)


def steady_state_cost(name, img, den_kw, batch, n_steps=20):
    """(ms/step, samples/s) for the real jitted donated train step —
    bench.py's train-section methodology, dense vs MoE at matched
    ACTIVE params. Dense rides the fused per-layer VJP kernels; MoE is
    gated to the XLA path (models/blocks.py) exactly as in train.main."""
    import jax
    import jax.numpy as jnp
    import optax

    from transformer_latent_diffusion_tpu.configs import (
        DenoiserConfig,
        TrainConfig,
    )
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.train.train import (
        _build_train_step,
        resolve_fused_flags,
    )
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    on_tpu = jax.default_backend() not in ("cpu",)
    tc = TrainConfig(batch_size=batch)
    fused_layer, fused_mlp, fused_attn = resolve_fused_flags(tc, on_tpu)
    dcfg = DenoiserConfig(
        image_size=img,
        mlp_class="moe" if name == "moe" else "sep_conv", **den_kw)
    from dataclasses import asdict

    model = Denoiser(**asdict(dcfg),
                     dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                     use_pallas=on_tpu, fused_layer_vjp=fused_layer,
                     fused_mlp_vjp=fused_mlp, fused_attn_vjp=fused_attn)
    params = init_denoiser_params(model, dcfg)
    optimizer = optax.adam(3e-4)
    state = {"params": params,
             "ema_params": jax.tree.map(jnp.copy, params),
             "opt_state": optimizer.init(params),
             "step": jnp.asarray(0)}
    step_fn = jax.jit(_build_train_step(model, optimizer, tc,
                                        vae_scale_factor=8.0),
                      donate_argnums=(0,))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 4, img, img)),
                    jnp.float32)
    y = jnp.asarray(rng.standard_normal((batch, 768)), jnp.float32)
    for i in range(6):
        state, loss = step_fn(state, x, y, jax.random.fold_in(
            jax.random.PRNGKey(9), i))
    float(loss)
    t0 = time.time()
    for i in range(n_steps):
        state, loss = step_fn(state, x, y, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
    float(loss)
    dt = (time.time() - t0) / n_steps
    return round(dt * 1e3, 1), round(batch / dt, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--root", default="/tmp/moe_probe")
    ap.add_argument("--out", default="/tmp/moe_probe/report.json")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke")
    ap.add_argument("--skip-cost", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from transformer_latent_diffusion_tpu.configs import (
        DataConfig,
        DenoiserConfig,
        ModelConfig,
        TrainConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.train import main as train_main

    print("backend:", jax.default_backend(), flush=True)
    report = {}
    if os.path.exists(args.out):  # resume: completed legs are cached
        with open(args.out) as f:
            report = json.load(f)

    def flush_report():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    if args.tiny:
        img, n_data, args.batch, args.steps = 16, 512, 32, 8
        den_kw = dict(embed_dim=64, n_layers=2, noise_embed_dims=64)
        vae_kw = dict(vae_cfg=VaeConfig(block_out_channels=(8, 16),
                                        layers_per_block=1))
    else:
        img, n_data = 32, 20480
        den_kw = dict(noise_embed_dims=256, patch_size=2, embed_dim=768,
                      dropout=0, n_layers=12, text_emb_size=768)
        vae_kw = {}

    lp, tp, vp = make_dataset(os.path.join(args.root, "data"),
                              n=n_data, img=img)
    data_cfg = DataConfig(lp, tp, vp)
    per_epoch = n_data // args.batch
    n_epoch = max(1, -(-args.steps // per_epoch))

    common = dict(batch_size=args.batch, lr=3e-4, warmup_steps=20,
                  save_model=False, use_wandb=False, seed=7,
                  save_and_eval_every_iters=10 ** 9, log_grad_norm=True,
                  checkpoint_dir=os.path.join(args.root, "ckpts"))

    # ---- leg A: cost, dense vs MoE at matched active params ----
    if not args.skip_cost:
        for name, mlp_class in (("dense", "sep_conv"), ("moe", "moe")):
            if f"cost_{name}" in report:
                continue
            dcfg = DenoiserConfig(image_size=img, mlp_class=mlp_class,
                                  **den_kw)
            cfg = ModelConfig(
                data_config=data_cfg, denoiser_config=dcfg,
                train_config=TrainConfig(n_epoch=n_epoch,
                                         model_name=f"moecost_{name}",
                                         **common), **vae_kw)
            t0 = time.time()
            res = train_main(cfg)
            wall = time.time() - t0
            n_steps = res["global_step"]
            # exclude compile: re-time the tail by steps/sec from the
            # full wall minus a generous compile estimate is noisy;
            # instead report overall and steady-state (last-half) rate
            # via a second epoch-sized run would double cost — keep the
            # wall rate and the loss/grad-norm health signals
            report[f"cost_{name}"] = {
                "steps": n_steps,
                "wall_s": round(wall, 1),
                "samples_per_sec_incl_compile": round(
                    args.batch * n_steps / wall, 1),
                "loss_first": round(float(np.mean(res["losses"][:4])), 4),
                "loss_last": round(float(np.mean(res["losses"][-4:])), 4),
                "grad_norm_max": round(float(np.max(res["grad_norms"])), 3),
                "all_finite": bool(np.all(np.isfinite(res["losses"]))),
            }
            print(json.dumps({name: report[f"cost_{name}"]}), flush=True)
            del res
            flush_report()
        # steady-state per-step cost, bench.py-style: same process,
        # the REAL jitted donated train step, 6 warm + 20 timed steps
        # (a short train.main wall is fixed-overhead-dominated — data
        # load + retrace + compile-cache fetch wash out the per-step
        # difference at 80 steps)
        for name in ("dense", "moe"):
            if "ms_per_step_steady" in report[f"cost_{name}"]:
                continue
            report[f"cost_{name}"]["ms_per_step_steady"], \
                report[f"cost_{name}"]["samples_per_sec_steady"] = (
                    steady_state_cost(name, img, den_kw, args.batch))
            print(name, "steady:", report[f"cost_{name}"], flush=True)
            flush_report()
        d, m = report["cost_dense"], report["cost_moe"]
        report["moe_vs_dense_steady"] = round(
            m["samples_per_sec_steady"] / d["samples_per_sec_steady"], 3)

    # ---- leg B: load balance, aux on vs off (toy scale) ----
    bimg = 16
    blp, btp, bvp = make_dataset(os.path.join(args.root, "toy"),
                                 n=2048, img=bimg)
    bdcfg = DenoiserConfig(image_size=bimg, embed_dim=64, n_layers=2,
                           noise_embed_dims=64, mlp_class="moe")
    rng = np.random.default_rng(3)
    xb = np.load(blp)[:64]
    yb = np.load(btp)[:64]
    for tag, w in (("aux_on", 0.01), ("aux_off", 0.0),
                   ("aux_strong", 0.1)):
        if f"balance_{tag}" in report:
            continue
        cfg = ModelConfig(
            data_config=DataConfig(blp, btp, bvp),
            denoiser_config=bdcfg,
            train_config=TrainConfig(
                n_epoch=12, batch_size=64, lr=2e-3, moe_aux_weight=w,
                save_model=False, use_wandb=False, seed=7,
                save_and_eval_every_iters=10 ** 9,
                checkpoint_dir=os.path.join(args.root, "ckpts"),
                compute_dtype="float32"),
            vae_cfg=VaeConfig(block_out_channels=(8, 16),
                              layers_per_block=1))
        res = train_main(cfg)
        import jax as _jax

        params = _jax.device_get(res["state"]["ema_params"])
        loads = expert_loads(bdcfg, params, xb / 8.0, yb)
        report[f"balance_{tag}"] = {
            "loss_last": round(float(np.mean(res["losses"][-8:])), 4),
            "load_per_layer": [[round(float(v), 3) for v in row]
                               for row in loads],
            "max_load": round(float(loads.max()), 3),
            "uniform": round(1.0 / bdcfg.n_experts, 3),
        }
        print(json.dumps({tag: report[f"balance_{tag}"]}), flush=True)
        del res
        flush_report()

    print(f"report -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
