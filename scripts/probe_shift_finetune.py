"""Schedule shift in the HI-RES FINE-TUNE setting (explicit k).

probe_schedule_shift.py measured the shift in multires JOINT training,
where TrainConfig.schedule_shift="auto" resolves per bucket. The
reference's actual recipe is different: fine-tune the low-res model AT
the high resolution (train/highres.finetune_highres) — and there the
fine-tuned model's native size IS the high size, so "auto" resolves to
k=1 and the shift must be explicit: k = new px / pretrain px, applied
at train AND sampling time.

Arms (same 16px base, upsample_denoiser_params warm start, 8-epoch
fine-tune at 32px — run_toy_quality's leg-E recipe):
  * warm32        — no shift (the round-5 baseline recipe).
  * warm32_shift  — TrainConfig.schedule_shift=2.0.
Eval at 32px: both arms x sampler schedule_shift {off, 2.0} (2x2).

Run on the TPU:  python scripts/probe_shift_finetune.py
"""

import argparse
import json
import os
import pickle
import sys

from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.probe_multires_quality import (  # noqa: E402
    IMG_HI,
    UpsampledEval,
    write_hi_dataset,
)
from scripts.toy_benchmark import (  # noqa: E402
    Benchmark,
    base_denoiser_cfg,
    clip_features_fn,
    make_sampler,
    score_replicates,
    train_or_load,
)


def finetune(name, ckpt_dir, base16, dcfg16, dcfg32, hi_paths,
             ft_epochs, **tcfg_kw):
    """Warm-start fine-tune at IMG_HI (cached like train_or_load)."""
    import jax

    from transformer_latent_diffusion_tpu.configs import (
        DataConfig,
        ModelConfig,
        TrainConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.train import main as train_main
    from transformer_latent_diffusion_tpu.train.highres import (
        upsample_denoiser_params,
    )

    path = os.path.join(ckpt_dir, f"{name}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    init = upsample_denoiser_params(base16, 16, IMG_HI, dcfg16.patch_size)
    cfg = ModelConfig(
        data_config=DataConfig(*hi_paths),
        denoiser_config=dcfg32,
        train_config=TrainConfig(
            n_epoch=ft_epochs, batch_size=64, lr=2e-3, save_model=False,
            use_wandb=False, save_and_eval_every_iters=10 ** 9,
            checkpoint_dir=ckpt_dir, compute_dtype="float32", **tcfg_kw),
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
    )
    res = train_main(cfg, init_params=init)
    params = jax.device_get(res["state"]["ema_params"])
    with open(path, "wb") as f:
        pickle.dump(params, f)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="/tmp/shift_finetune_ckpt")
    ap.add_argument("--ft-epochs", type=int, default=8)
    ap.add_argument("--out",
                    default="/tmp/shift_finetune_ckpt/report.json")
    args = ap.parse_args()

    bench = Benchmark()
    data_dir = os.path.join(args.ckpt_dir, "data")
    lo_paths = bench.write_dataset(data_dir)
    hlp, htp = write_hi_dataset(bench, data_dir)
    hi_paths = (hlp, htp, lo_paths[2])
    dcfg16 = base_denoiser_cfg()
    dcfg32 = replace(dcfg16, image_size=IMG_HI)

    base16, _ = train_or_load("base16", dcfg16, lo_paths, args.ckpt_dir,
                              epochs=24)
    arms = {
        "warm32": finetune("warm32", args.ckpt_dir, base16, dcfg16,
                           dcfg32, hi_paths, args.ft_epochs),
        "warm32_shift": finetune("warm32_shift", args.ckpt_dir, base16,
                                 dcfg16, dcfg32, hi_paths, args.ft_epochs,
                                 schedule_shift=2.0),
    }

    feats32 = clip_features_fn(IMG_HI)
    hi_eval = UpsampledEval(bench)
    report = {}
    for name, params in arms.items():
        for sshift in (None, 2.0):
            tag = name + ("" if sshift is None else "+sampleshift")
            kw = {} if sshift is None else {"schedule_shift": sshift}
            sampler = make_sampler(dcfg32, params, img_size=IMG_HI, **kw)
            report[tag] = score_replicates(hi_eval, sampler,
                                           clip_feats=feats32)
            print(tag, report[tag], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("report ->", args.out, flush=True)


if __name__ == "__main__":
    main()
