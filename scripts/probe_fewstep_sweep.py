"""Few-step distillation recipe sweep (VERDICT r4 #1).

Round 4's honest re-measurement showed the baked-guidance-3 consistency
student is 2.3x WORSE than its teacher on the strengthened benchmark
(latent-FID 3002 vs 1288) and that multistep sampling degrades
monotonically (the baked-guidance compounding artifact). This probe
pulls the standard levers:

  * baked-guidance sweep {1.0, 1.5, 3.0}: lower baked guidance =
    less overshoot to compound;
  * the guidance-1 recipe: distill with guidance=1.0 AND label
    dropout (train/distill.py label_dropout=0.15, so the student keeps
    a trained unconditional branch), then apply CFG SAMPLER-SIDE on
    the student at generation time — the standard fix that keeps
    multistep usable;
  * distill budget {40, 120} epochs on the winning setting.

Scoring: the shared strengthened benchmark (scripts/toy_benchmark.py,
32 classes, rank-8 covariance, 3 replicates, latent-FID + CLIP-FID).
Teacher yardstick: 50-step DDIM at CFG 3 from the cached x0 model.

Run on the TPU:  python scripts/probe_fewstep_sweep.py
Cached under --ckpt-dir; delete student_sweep_*.pkl to re-distill.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-eval", type=int, default=None)
    ap.add_argument("--replicates", type=int, default=None)
    ap.add_argument("--ckpt-dir", default="/tmp/toyq_ckpt")
    ap.add_argument("--quick", action="store_true",
                    help="one replicate, fewer variants (smoke)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import toy_benchmark as tb

    from transformer_latent_diffusion_tpu.configs import (
        DataConfig,
        ModelConfig,
        TrainConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.train import (
        consistency_apply,
        distill_consistency,
    )

    print(f"backend={jax.default_backend()}", flush=True)

    bench = tb.Benchmark()
    data_paths = bench.write_dataset(os.path.join(tempfile.gettempdir(),
                                                  "toyq_data"))
    dcfg = tb.base_denoiser_cfg()
    n_eval = args.n_eval or tb.N_EVAL
    n_rep = args.replicates or (1 if args.quick else tb.N_REPLICATES)
    clip_feats = tb.clip_features_fn(bench.img)

    teacher, _ = tb.train_or_load("x0", dcfg, data_paths, args.ckpt_dir)
    lp, tp, vp = data_paths

    def distill(name, guidance, label_dropout=0.0, epochs=40):
        path = os.path.join(args.ckpt_dir, f"student_sweep_{name}.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        print(f"distilling {name} (g={guidance} drop={label_dropout} "
              f"epochs={epochs})...", flush=True)
        cfg = ModelConfig(
            data_config=DataConfig(lp, tp, vp),
            denoiser_config=dcfg,
            train_config=TrainConfig(
                n_epoch=epochs, batch_size=64, lr=1e-3,
                save_model=False, use_wandb=False,
                save_and_eval_every_iters=10 ** 9,
                checkpoint_dir=args.ckpt_dir, compute_dtype="float32"),
            vae_cfg=VaeConfig(block_out_channels=(8, 16),
                              layers_per_block=1),
        )
        dres = distill_consistency(cfg, teacher, n_schedule=50,
                                   guidance=guidance,
                                   label_dropout=label_dropout)
        print(f"  loss first {np.mean(dres['losses'][:10]):.4f} "
              f"last {np.mean(dres['losses'][-10:]):.4f}", flush=True)
        student = jax.device_get(dres["ema_params"])
        with open(path, "wb") as f:
            pickle.dump(student, f)
        return student

    def score(tag, params, steps, sample_cfg, fast=True):
        sample = tb.make_sampler(
            dcfg, params,
            fast_apply_factory=consistency_apply if fast else None,
            class_guidance=sample_cfg, n_iter=steps,
            fresh_noise=fast)
        rec = {"mode": tag}
        rec.update(tb.score_replicates(bench, sample, n_eval=n_eval,
                                       n_replicates=n_rep,
                                       clip_feats=clip_feats))
        print(json.dumps(rec), flush=True)
        return rec

    # yardstick
    score("teacher-50 (cfg 3)", teacher, 50, 3.0, fast=False)

    steps_grid = (1, 2, 4)
    # baked-guidance sweep, sampled at class_guidance=1 (LCM-style)
    for g in (1.5, 3.0):
        stud = distill(f"g{g}", guidance=g)
        for steps in steps_grid:
            score(f"baked-g{g} student-{steps}", stud, steps, 1.0)

    # guidance-1 recipe: uncond branch kept alive, CFG sampler-side
    stud1 = distill("g1drop", guidance=1.0, label_dropout=0.15)
    for cfg_g in (1.0, 2.0, 3.0):
        for steps in steps_grid:
            score(f"g1drop student-{steps} cfg{cfg_g}", stud1, steps,
                  cfg_g)

    if not args.quick:
        # budget leg on the guidance-1 recipe
        stud1b = distill("g1drop_e120", guidance=1.0, label_dropout=0.15,
                         epochs=120)
        for cfg_g in (1.0, 2.0, 3.0):
            for steps in (1, 2, 4):
                score(f"g1drop-e120 student-{steps} cfg{cfg_g}", stud1b,
                      steps, cfg_g)


if __name__ == "__main__":
    main()
