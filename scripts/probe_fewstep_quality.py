"""Quality numbers for few-step (consistency-distilled) generation on
the strengthened shared benchmark (scripts/toy_benchmark.py).

VERDICT r2 #6 attached fidelity evidence to the LCM-style sampler on an
8-cluster memorization task; round 4 re-bases it on the shared 32-class
rank-8-covariance benchmark so the distillation numbers live on the
same scale as the objective/sampler/guidance tables (latent-FID +
CLIP-FID vs fresh truth draws, 3 eval replicates, mean +- std).

Pipeline:
  1. teacher = the cached x0 model from probe_objective_quality
     (train_or_load name="x0" — run that probe first, or this one
     trains it);
  2. distill with train/distill.py (teacher DDIM-step targets on the
     sampler's own 50-point schedule, CFG guidance 3 BAKED into the
     teacher step, pseudo-huber loss, EMA target net);
  3. score the teacher (50-step DDIM @ CFG 3) and the student at
     1/2/4/8 fresh-noise consistency steps (class_guidance=1 — the
     student needs no CFG double batch, that's the point);
  4. also report the student's 1-step agreement with the teacher's
     full ODE endpoint from the SAME init noise (cosine/MSE — the
     consistency function approximates that endpoint pairwise).

Interpretation notes (measured, round 2-3, still apply): more
consistency steps do NOT monotonically help — with guidance baked in,
each extra f-application compounds the guidance overshoot (the known
LCM multistep artifact), so 1-2 steps is the fidelity sweet spot.

SUPERSEDED (round 5): scripts/probe_fewstep_sweep.py swept the baked
guidance and found it IS the artifact — distill at guidance=1.0 with
label_dropout=0.15 and the 1-step student beats this probe's teacher
(latent-FID 1034 vs 1288) with gently-degrading multistep; see the
DESIGN.md few-step table. This probe is kept for the baked-g3 baseline.

Run on the TPU:  python scripts/probe_fewstep_quality.py
Cached under --ckpt-dir (shared with the other knob probes); delete
student_g*.pkl to re-distill.
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
    ap.add_argument("--distill-epochs", type=int, default=40)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--n-eval", type=int, default=None)
    ap.add_argument("--replicates", type=int, default=None)
    ap.add_argument("--ckpt-dir", default="/tmp/toyq_ckpt")
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
    n_rep = args.replicates or tb.N_REPLICATES
    clip_feats = tb.clip_features_fn(bench.img)

    teacher, _ = tb.train_or_load("x0", dcfg, data_paths, args.ckpt_dir)

    s_path = os.path.join(args.ckpt_dir, f"student_g{args.guidance}.pkl")
    if os.path.exists(s_path):
        print(f"loading cached student from {s_path}", flush=True)
        with open(s_path, "rb") as f:
            student = pickle.load(f)
    else:
        print("distilling...", flush=True)
        lp, tp, vp = data_paths
        cfg = ModelConfig(
            data_config=DataConfig(lp, tp, vp),
            denoiser_config=dcfg,
            train_config=TrainConfig(
                n_epoch=args.distill_epochs, batch_size=64, lr=1e-3,
                save_model=False, use_wandb=False,
                save_and_eval_every_iters=10 ** 9,
                checkpoint_dir=args.ckpt_dir, compute_dtype="float32"),
            vae_cfg=VaeConfig(block_out_channels=(8, 16),
                              layers_per_block=1),
        )
        dres = distill_consistency(cfg, teacher, n_schedule=50,
                                   guidance=args.guidance)
        print(f"distill loss: first {np.mean(dres['losses'][:10]):.4f} "
              f"last {np.mean(dres['losses'][-10:]):.4f}", flush=True)
        student = jax.device_get(dres["ema_params"])
        with open(s_path, "wb") as f:
            pickle.dump(student, f)

    # ---- distributional scores on the shared benchmark ----
    teach_sample = tb.make_sampler(dcfg, teacher,
                                   class_guidance=args.guidance)
    rec = {"mode": f"teacher-50 (cfg {args.guidance})"}
    rec.update(tb.score_replicates(bench, teach_sample, n_eval=n_eval,
                                   n_replicates=n_rep,
                                   clip_feats=clip_feats))
    print(json.dumps(rec), flush=True)

    for steps in (1, 2, 4, 8):
        stud_sample = tb.make_sampler(
            dcfg, student, fast_apply_factory=consistency_apply,
            class_guidance=1.0, n_iter=steps, fresh_noise=True)
        rec = {"mode": f"student-{steps}"}
        rec.update(tb.score_replicates(bench, stud_sample, n_eval=n_eval,
                                       n_replicates=n_rep,
                                       clip_feats=clip_feats))
        print(json.dumps(rec), flush=True)

    # ---- same-init agreement with the teacher ODE endpoint ----
    labels, _, seed = bench.eval_set(0, n_eval)
    t = teach_sample(labels, seed)
    s1 = tb.make_sampler(dcfg, student, fast_apply_factory=consistency_apply,
                         class_guidance=1.0, n_iter=1)(labels, seed)
    flat = lambda a: a.reshape(a.shape[0], -1)  # noqa: E731
    cos = float(np.mean(
        np.sum(flat(t) * flat(s1), 1)
        / (np.linalg.norm(flat(t), axis=1)
           * np.linalg.norm(flat(s1), axis=1) + 1e-8)))
    print(json.dumps({"mode": "student-1 vs teacher-50, same init",
                      "cos": round(cos, 4),
                      "mse": round(float(np.mean((s1 - t) ** 2)), 4)}),
          flush=True)


if __name__ == "__main__":
    main()
