"""512px fine-tune health at flagship scale (VERDICT r4 #2).

The reference proves its 512/1024px capability with a ~2h A100
fine-tune from the 256px checkpoint (reference README.md:22-26). This
probe proves the same recipe — `train.highres.finetune_highres`
(pos-embed 2D-resize + warm-start `train.main`) — is training-healthy
at flagship scale on the TPU, and that warm-starting actually beats
from-scratch at matched budget (the recipe's entire motivation).

Legs:
  A. base: 101M flagship at 256px (32x32 latents), batch 256, ~120
     production steps on structured synthetic data (same generator as
     probe_flagship_train) -> checkpoint.
  B. fine-tune: finetune_highres at 512px (64x64 latents, 1024 tokens,
     the flash-attention + fused-MLP hybrid path), batch 64, >=200
     steps with val holdout + grad norms + eval grid; loss/grad norms
     must stay finite and drop.
  C. resume of the 512px fine-tune: step counter continues.
  D. quality (toy scale, shared benchmark): warm-start 2x fine-tune vs
     from-scratch at MATCHED budget, scored by latent-FID/CLIP-FID at
     the high resolution.

Usage (real TPU):  python scripts/probe_highres_finetune.py
CPU smoke:         python scripts/probe_highres_finetune.py --tiny
Results are recorded in docs/DESIGN.md next to "Flagship training
health".
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.probe_flagship_train import make_dataset, summarize  # noqa: E402


def make_hires_dataset(root, base_root, n, img_hi, seed=0):
    """512px-bucket synthetic latents with the SAME class structure as
    the base dataset (prototypes bilinearly upsampled + fresh noise +
    high-frequency detail), so warm-start transfer is meaningful."""
    import jax
    import jax.numpy as jnp

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    k_classes = 8
    # same prototypes as make_dataset (same seed stream ordering)
    base_rng = np.random.default_rng(0)
    img_lo = img_hi // 2
    protos = base_rng.standard_normal(
        (k_classes, 4, img_lo, img_lo)).astype(np.float32)
    text_protos = base_rng.standard_normal((k_classes, 768)).astype(np.float32)
    protos_hi = np.asarray(jax.image.resize(
        jnp.asarray(protos), (k_classes, 4, img_hi, img_hi), "bilinear"),
        np.float32)
    cls = rng.integers(0, k_classes, n)
    eps = rng.standard_normal((n, 4, img_hi, img_hi)).astype(np.float32)
    latents = 8.0 * (0.8 * protos_hi[cls] + 0.6 * eps)
    text = (text_protos[cls]
            + 0.1 * rng.standard_normal((n, 768))).astype(np.float32)
    lp = os.path.join(root, "latents_hi.npy")
    tp = os.path.join(root, "text_hi.npy")
    vp = os.path.join(root, "val_emb.npy")
    np.save(lp, latents)
    np.save(tp, text)
    np.save(vp, text_protos)
    return lp, tp, vp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-steps", type=int, default=120)
    ap.add_argument("--ft-steps", type=int, default=200)
    ap.add_argument("--root", default="/tmp/highres_finetune")
    ap.add_argument("--out", default="/tmp/highres_finetune/report.json")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: tiny model, 8->16px, same legs")
    ap.add_argument("--skip-quality", action="store_true")
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
    from transformer_latent_diffusion_tpu.train.highres import (
        finetune_highres,
    )

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    report = {}

    def flush_report():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    if args.tiny:
        img_lo, img_hi = 8, 16
        base_batch, ft_batch = 32, 16
        n_lo, n_hi, holdout = 512, 256, 64
        args.base_steps, args.ft_steps = 10, 12
        den_kw = dict(embed_dim=64, n_layers=2, noise_embed_dims=64)
        vae_kw = dict(vae_cfg=VaeConfig(block_out_channels=(8, 16),
                                        layers_per_block=1))
    else:
        img_lo, img_hi = 32, 64  # 256px / 512px latents
        base_batch, ft_batch = 256, 64
        n_lo, n_hi, holdout = 20480, 6656, 256
        den_kw = dict(noise_embed_dims=256, patch_size=2, embed_dim=768,
                      dropout=0, n_layers=12, text_emb_size=768)
        vae_kw = {}

    lp, tp, vp = make_dataset(os.path.join(args.root, "data"),
                              n=n_lo, img=img_lo)
    hlp, htp, hvp = make_hires_dataset(
        os.path.join(args.root, "data_hi"), args.root, n=n_hi,
        img_hi=img_hi)

    den_lo = DenoiserConfig(image_size=img_lo, **den_kw)
    den_hi = DenoiserConfig(image_size=img_hi, **den_kw)

    common = dict(lr=3e-4, warmup_steps=50, alpha=0.999,
                  use_wandb=False, seed=7, log_grad_norm=True,
                  checkpoint_dir=os.path.join(args.root, "ckpts"))

    # ---- leg A: 256px base ----
    per_epoch_lo = (n_lo - holdout) // base_batch
    cfg_base = ModelConfig(
        data_config=DataConfig(lp, tp, vp),
        denoiser_config=den_lo,
        train_config=TrainConfig(
            n_epoch=max(1, -(-args.base_steps // per_epoch_lo)),
            batch_size=base_batch, model_name="hr_base",
            save_model=False, val_holdout=holdout,
            save_and_eval_every_iters=10 ** 9, **common),
        **vae_kw,
    )
    base_pkl = os.path.join(args.root, "base_params.pkl")
    if os.path.exists(base_pkl):
        import pickle

        with open(base_pkl, "rb") as f:
            base_params = pickle.load(f)
        print("base params loaded from cache", flush=True)
    else:
        t0 = time.time()
        res = train_main(cfg_base)
        report["base"] = summarize("base-256px", res, t0, time.time(),
                                   base_batch)
        base_params = jax.device_get(res["state"]["ema_params"])
        del res
        import pickle

        with open(base_pkl, "wb") as f:
            pickle.dump(base_params, f)
        flush_report()

    # ---- leg B: 512px warm-start fine-tune (the reference recipe) ----
    per_epoch_hi = (n_hi - holdout) // ft_batch
    ft_epochs = max(1, -(-args.ft_steps // per_epoch_hi))

    def ft_cfg(name, n_epoch, from_scratch=True):
        return ModelConfig(
            data_config=DataConfig(hlp, htp, hvp),
            denoiser_config=den_hi,
            train_config=TrainConfig(
                n_epoch=n_epoch, batch_size=ft_batch, model_name=name,
                save_model=True, from_scratch=from_scratch,
                val_holdout=holdout, save_and_eval_every_iters=128,
                # 1024 tokens x batch 64 no-remat backward OOMs once
                # the eval sampler + VAE executables are HBM-resident
                # (measured this probe); remat is numerically identical
                remat=not args.tiny,
                **common),
            **vae_kw,
        )

    t0 = time.time()
    res = finetune_highres(ft_cfg("hr_ft", ft_epochs), base_params,
                           old_image_size=img_lo)
    report["finetune"] = summarize("512px-warmstart", res, t0,
                                   time.time(), ft_batch)
    ft_steps_done = res["global_step"]
    eval_dir = os.path.join(args.root, "ckpts", "hr_ft", "eval")
    report["finetune"]["eval_images"] = (
        sorted(os.listdir(eval_dir)) if os.path.isdir(eval_dir) else [])
    del res
    flush_report()

    # ---- leg C: resume the fine-tune ----
    t0 = time.time()
    res = train_main(ft_cfg("hr_ft", 1, from_scratch=False))
    report["resume"] = summarize("512px-resume", res, t0, time.time(),
                                 ft_batch)
    report["resume"]["continues_from"] = ft_steps_done
    report["resume"]["step_counter_ok"] = (
        res["global_step"] == ft_steps_done + per_epoch_hi)
    del res
    flush_report()

    # ---- leg D: warm-start beats from-scratch at matched budget ----
    if not args.skip_quality:
        t0 = time.time()
        res = train_main(ft_cfg("hr_scratch", ft_epochs))
        report["scratch"] = summarize("512px-fromscratch", res, t0,
                                      time.time(), ft_batch)
        del res
        wv = report["finetune"]["val_losses"]
        sv = report["scratch"]["val_losses"]
        report["warmstart_beats_scratch_val"] = bool(
            wv and sv and wv[-1][1] < sv[-1][1])
        flush_report()

    # ---- leg E: toy-benchmark FID — warm-start vs scratch ----
    if not args.skip_quality and not args.tiny:
        report["toy_quality"] = run_toy_quality(
            os.path.join(args.root, "toy"))
        flush_report()

    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, dict)}, indent=1), flush=True)
    print(f"report -> {args.out}", flush=True)


def run_toy_quality(ckpt_dir, ft_epochs=8):
    """Warm-start-vs-scratch at MATCHED high-res budget on the shared
    toy benchmark (latent-FID/CLIP-FID at the 2x resolution): a 16px
    base fine-tuned at 32px for `ft_epochs` must beat a model trained
    at 32px from scratch for the same `ft_epochs` — the reference
    recipe's motivation (you already own the low-res model)."""
    import pickle
    from dataclasses import replace

    import jax

    from scripts.probe_multires_quality import (
        IMG_HI,
        UpsampledEval,
        write_hi_dataset,
    )
    from scripts.toy_benchmark import (
        Benchmark,
        base_denoiser_cfg,
        clip_features_fn,
        make_sampler,
        score_replicates,
        train_or_load,
    )
    from transformer_latent_diffusion_tpu.train.highres import (
        upsample_denoiser_params,
    )

    bench = Benchmark()
    data_dir = os.path.join(ckpt_dir, "data")
    lo_paths = bench.write_dataset(data_dir)
    hlp, htp = write_hi_dataset(bench, data_dir)
    hi_paths = (hlp, htp, lo_paths[2])
    dcfg16 = base_denoiser_cfg()
    dcfg32 = replace(dcfg16, image_size=IMG_HI)

    base16, _ = train_or_load("hrq_base16", dcfg16, lo_paths, ckpt_dir,
                              epochs=24)
    scratch32, _ = train_or_load("hrq_scratch32", dcfg32, hi_paths,
                                 ckpt_dir, epochs=ft_epochs)

    warm_path = os.path.join(ckpt_dir, "hrq_warm32.pkl")
    if os.path.exists(warm_path):
        with open(warm_path, "rb") as f:
            warm32 = pickle.load(f)
    else:
        from transformer_latent_diffusion_tpu.configs import (
            DataConfig,
            ModelConfig,
            TrainConfig,
            VaeConfig,
        )
        from transformer_latent_diffusion_tpu.train import (
            main as train_main,
        )

        init = upsample_denoiser_params(base16, 16, IMG_HI,
                                        dcfg16.patch_size)
        cfg = ModelConfig(
            data_config=DataConfig(*hi_paths),
            denoiser_config=dcfg32,
            train_config=TrainConfig(
                n_epoch=ft_epochs, batch_size=64, lr=2e-3,
                save_model=False, use_wandb=False,
                save_and_eval_every_iters=10 ** 9,
                checkpoint_dir=ckpt_dir, compute_dtype="float32"),
            vae_cfg=VaeConfig(block_out_channels=(8, 16),
                              layers_per_block=1),
        )
        res = train_main(cfg, init_params=init)
        warm32 = jax.device_get(res["state"]["ema_params"])
        with open(warm_path, "wb") as f:
            pickle.dump(warm32, f)

    feats32 = clip_features_fn(IMG_HI)
    hi_eval = UpsampledEval(bench)
    out = {}
    for tag, p in (("warmstart32", warm32), ("scratch32", scratch32)):
        sampler = make_sampler(dcfg32, p, img_size=IMG_HI)
        out[tag] = score_replicates(hi_eval, sampler, clip_feats=feats32)
        print(json.dumps({"mode": f"{tag} (ft_epochs={ft_epochs})",
                          **out[tag]}), flush=True)
    out["warmstart_beats_scratch_fid"] = bool(
        out["warmstart32"]["latent_fid"] < out["scratch32"]["latent_fid"])
    return out


if __name__ == "__main__":
    main()
