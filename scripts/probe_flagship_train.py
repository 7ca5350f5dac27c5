"""Flagship-scale (101M) training-health probe (VERDICT r3 #1).

The reference demonstrates its 101M model trains to convergence (260k
iters on an A100, reference README.md:6,192, recipe train.py:62-176).
This probe proves the SAME claim for this repo's production train path
at the published scale — bf16 compute + fused per-layer Pallas VJP
kernels + EMA + orbax checkpointing — over hundreds of steps on the real
TPU, where the round-3 verdict noted only ~20 timed bench steps existed.

Three legs, all through the production `train.main` entrypoint:

  A. bf16 production run (fused_layer_vjp auto-on): >=500 steps at
     batch 256 on structured synthetic latents, with mid-run eval_gen +
     async orbax checkpoint (save_and_eval_every_iters) + val-holdout
     loss + per-step pre-clip global grad norms (log_grad_norm).
  B. resume run: from_scratch=False continues from leg A's checkpoint
     for ~1 epoch; checks the step counter continues and the loss picks
     up at the EMA-weight level (resume loads EMA by design, matching
     the reference train.py:98).
  C. f32/XLA reference run: same data, same seed (same Beta noise and
     label-dropout draws per step), compute_dtype=float32 with the
     fused Pallas VJP kernels OFF — the numerics yardstick leg A's
     bf16 loss trajectory is overlaid against.

Synthetic data is STRUCTURED (8 class prototypes + per-sample noise,
text embeddings correlated with class) so the conditional-mean signal
is learnable and the loss trajectory is meaningful, at realistic
pre-vae-scale latent magnitude (x8).

Usage (real TPU, ~30-45 min incl. compiles):
    python scripts/probe_flagship_train.py [--steps 520] [--out JSON]

Results are recorded in docs/DESIGN.md ("Flagship training health").
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root, n=20480, img=32, k_classes=8, seed=0):
    """Structured synthetic latents: class prototype + i.i.d. noise, at
    the pre-vae-scale magnitude real SDXL latents have (~x8 unit scale);
    text embeddings are the class prototype + small jitter, so the
    model's conditional mean is learnable."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((k_classes, 4, img, img)).astype(np.float32)
    text_protos = rng.standard_normal((k_classes, 768)).astype(np.float32)
    cls = rng.integers(0, k_classes, n)
    eps = rng.standard_normal((n, 4, img, img)).astype(np.float32)
    latents = 8.0 * (0.8 * protos[cls] + 0.6 * eps)
    text = (text_protos[cls]
            + 0.1 * rng.standard_normal((n, 768))).astype(np.float32)
    lp = os.path.join(root, "latents.npy")
    tp = os.path.join(root, "text_emb.npy")
    vp = os.path.join(root, "val_emb.npy")
    np.save(lp, latents)
    np.save(tp, text)
    np.save(vp, text_protos)
    return lp, tp, vp


def summarize(tag, result, t0, t1, batch):
    losses = result["losses"]
    gns = result.get("grad_norms", [])
    steps = result["global_step"]
    k = max(1, len(losses) // 20)
    head = float(np.mean(losses[:k]))
    tail = float(np.mean(losses[-k:]))
    out = {
        "tag": tag,
        "steps": steps,
        "wall_s": round(t1 - t0, 1),
        "samples_per_sec": round(batch * len(losses) / (t1 - t0), 1),
        "loss_first20th": round(head, 5),
        "loss_last20th": round(tail, 5),
        "loss_drop_pct": round(100 * (1 - tail / head), 1),
        "losses_every16": [round(float(x), 5) for x in losses[::16]],
        "val_losses": [(s, round(v, 5)) for s, v in result["val_losses"]],
    }
    if gns:
        out["grad_norm_first20th"] = round(float(np.mean(gns[:k])), 4)
        out["grad_norm_last20th"] = round(float(np.mean(gns[-k:])), 4)
        out["grad_norm_max"] = round(float(np.max(gns)), 4)
        out["grad_norms_every16"] = [round(float(g), 4) for g in gns[::16]]
    finite = all(np.isfinite(losses)) and all(np.isfinite(gns))
    out["all_finite"] = bool(finite)
    print(f"[{tag}] steps={steps} wall={out['wall_s']}s "
          f"sps={out['samples_per_sec']} loss {head:.5f}->{tail:.5f} "
          f"(-{out['loss_drop_pct']}%) "
          f"gn_max={out.get('grad_norm_max')} finite={finite}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=520)
    ap.add_argument("--f32-steps", type=int, default=160)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--root", default="/tmp/flagship_health")
    ap.add_argument("--out", default="/tmp/flagship_health/report.json")
    ap.add_argument("--skip-f32", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: tiny model/dataset, same legs")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from transformer_latent_diffusion_tpu.configs import (
        DataConfig,
        DenoiserConfig,
        ModelConfig,
        TrainConfig,
    )
    from transformer_latent_diffusion_tpu.train import main as train_main

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    n_data, img = (2048, 16) if args.tiny else (20480, 32)
    if args.tiny:
        args.steps, args.f32_steps, args.batch = 12, 6, 32
    lp, tp, vp = make_dataset(os.path.join(args.root, "data"),
                              n=n_data, img=img)
    data_cfg = DataConfig(latent_path=lp, text_emb_path=tp, val_path=vp)
    # flagship 101M: reference README.md:161,192 / test_diffuser.py:129-135
    den_cfg = DenoiserConfig(
        image_size=img, noise_embed_dims=256, patch_size=2, embed_dim=768,
        dropout=0, n_layers=12, text_emb_size=768, n_channels=4,
        mlp_multiplier=4,
    ) if not args.tiny else DenoiserConfig(
        image_size=img, embed_dim=64, n_layers=2, noise_embed_dims=64)
    holdout = 128 if args.tiny else 512
    per_epoch = (n_data - holdout) // args.batch
    n_epoch = max(1, -(-args.steps // per_epoch))

    common = dict(
        batch_size=args.batch, lr=3e-4,
        # published recipe uses 1000 warmup over 260k iters
        # (README.md:192); scaled here so the probe window shows
        # post-warmup dynamics too
        warmup_steps=100,
        alpha=0.999, beta_a=1.0, beta_b=2.5,
        save_and_eval_every_iters=256,
        val_holdout=holdout, log_grad_norm=True,
        use_wandb=False, seed=7,
        checkpoint_dir=os.path.join(args.root, "ckpts"),
    )

    report = {"config": "101M flagship, batch %d" % args.batch}

    def flush_report():
        # incremental: a crash in a later leg must not lose earlier legs
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    vae_kw = {}
    if args.tiny:
        from transformer_latent_diffusion_tpu.configs import VaeConfig

        vae_kw["vae_cfg"] = VaeConfig(block_out_channels=(8, 16),
                                      layers_per_block=1)

    # ---- leg A: bf16 production (fused Pallas layer VJP auto-on) ----
    cfg_a = ModelConfig(
        data_config=data_cfg, denoiser_config=den_cfg,
        train_config=TrainConfig(n_epoch=n_epoch, model_name="flagship_bf16",
                                 save_model=True, **common), **vae_kw,
    )
    t0 = time.time()
    res_a = train_main(cfg_a)
    t1 = time.time()
    report["bf16"] = summarize("bf16-fused", res_a, t0, t1, args.batch)
    eval_dir = os.path.join(args.root, "ckpts", "flagship_bf16", "eval")
    report["bf16"]["eval_images"] = sorted(os.listdir(eval_dir)) \
        if os.path.isdir(eval_dir) else []
    steps_a = res_a["global_step"]
    del res_a
    flush_report()

    # ---- leg B: resume (loads EMA weights, reference train.py:98) ----
    cfg_b = ModelConfig(
        data_config=data_cfg, denoiser_config=den_cfg,
        train_config=TrainConfig(n_epoch=1, model_name="flagship_bf16",
                                 save_model=True, from_scratch=False,
                                 **common), **vae_kw,
    )
    t0 = time.time()
    res_b = train_main(cfg_b)
    t1 = time.time()
    report["resume"] = summarize("resume", res_b, t0, t1, args.batch)
    report["resume"]["continues_from"] = steps_a
    report["resume"]["step_counter_ok"] = (
        res_b["global_step"] == steps_a + per_epoch)
    del res_b
    flush_report()

    # ---- leg C: f32 / XLA (no fused Pallas VJP kernels) ----
    if not args.skip_f32:
        f32_epochs = max(1, -(-args.f32_steps // per_epoch))
        # remat=True: f32 XLA at batch 256 stores ~768MB per MLP
        # activation and blows the 15.75G HBM (measured OOM at 35.6G);
        # rematerialization is numerically identical, so the yardstick
        # trajectory is unchanged.
        cfg_c = ModelConfig(
            data_config=data_cfg, denoiser_config=den_cfg,
            train_config=TrainConfig(
                n_epoch=f32_epochs, model_name="flagship_f32",
                save_model=False, compute_dtype="float32",
                fused_layer_vjp=False, fused_mlp_vjp=False,
                fused_attn_vjp=False, remat=True, **common), **vae_kw,
        )
        t0 = time.time()
        res_c = train_main(cfg_c)
        t1 = time.time()
        report["f32"] = summarize("f32-xla", res_c, t0, t1, args.batch)
        # step-matched trajectory deltas over the shared prefix: same
        # seed => same data order, same per-step noise/dropout draws
        a = np.asarray(report["bf16"]["losses_every16"])
        c = np.asarray(report["f32"]["losses_every16"])
        m = min(len(a), len(c))
        rel = np.abs(a[:m] - c[:m]) / np.maximum(np.abs(c[:m]), 1e-9)
        report["bf16_vs_f32_rel_loss_gap"] = {
            "mean": round(float(rel.mean()), 5),
            "max": round(float(rel.max()), 5),
            "n_points": int(m),
        }
        print("bf16 vs f32 per-step loss gap:",
              report["bf16_vs_f32_rel_loss_gap"], flush=True)

    flush_report()
    print("report ->", args.out, flush=True)


if __name__ == "__main__":
    main()
