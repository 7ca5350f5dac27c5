"""Quality numbers for few-step (consistency-distilled) generation.

VERDICT r2 #6: the LCM-style sampler shipped with throughput figures
only (114.5 imgs/s at 4 steps, 137.2 at 2). This probe attaches fidelity
evidence on a TRAINED model, end to end and hermetic:

1. train a small denoiser to convergence on a memorizable synthetic
   conditional dataset (8 latent clusters keyed by 8 text embeddings);
2. distill it with train/distill.py (CFG baked in, guidance 3);
3. generate with the teacher (50-step DDIM, CFG 3) and the student at
   1/2/4 fresh-noise consistency steps;
4. report, per step count:
   - latent-FID between teacher-set and student-set latents
     (distributional fidelity; the teacher-vs-teacher FID across two
     seeds is printed as the sampling-noise floor),
   - latent-FID of teacher and student against fresh TRUTH samples from
     the generating distribution (the meaningful yardstick when CFG>1:
     guidance overshoot puts the teacher itself far from truth, so
     student-vs-teacher FID alone overstates the quality loss),
   - cosine similarity / MSE of the student's output against the
     teacher run from the SAME init noise (the consistency function
     approximates the teacher ODE endpoint, so pairwise comparison is
     meaningful at 1 step).

Interpretation notes (measured): raw latent-FID values are large in
absolute terms because the feature dim (1024) exceeds the eval-set
size, so the covariance trace term scales with any per-dim variance
mismatch x 1024 — compare FIDs to each other, not to image-FID scales.
More consistency steps do NOT monotonically help: with guidance baked
in, each extra f-application compounds the guidance overshoot (the
known LCM multistep artifact) — 1-2 steps are the fidelity sweet spot.

Prints one JSON line per mode; paste the table into docs/DESIGN.md.
Runs on CPU in ~20 min (tiny model); pass --epochs/--batch to scale.
Trained params are cached under --ckpt-dir so metric-only reruns skip
training. Usage: python scripts/probe_fewstep_quality.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--distill-epochs", type=int, default=80)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-data", type=int, default=512)
    ap.add_argument("--n-eval", type=int, default=512)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--ckpt-dir", default="/tmp/fewstep_quality_ckpt",
                    help="cache trained teacher/student params here; "
                         "reruns skip training if the files exist")
    args = ap.parse_args()

    import pickle

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from transformer_latent_diffusion_tpu.configs import (
        DataConfig,
        DenoiserConfig,
        ModelConfig,
        TrainConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
    from transformer_latent_diffusion_tpu.train import (
        consistency_apply,
        distill_consistency,
        main as train_main,
    )
    from transformer_latent_diffusion_tpu.utils.fid import compute_fid

    print(f"backend={jax.default_backend()}", flush=True)

    # ---- synthetic conditional dataset: 8 clusters, memorizable ----
    dcfg = DenoiserConfig(image_size=16, embed_dim=128, n_layers=3,
                          noise_embed_dims=128)
    rng = np.random.default_rng(0)
    n_classes = 8
    mus = rng.standard_normal((n_classes, 4, 16, 16)).astype(np.float32)
    embs = rng.standard_normal((n_classes, 768)).astype(np.float32)
    cls = rng.integers(0, n_classes, size=args.n_data)
    latents = (mus[cls] + 0.1 * rng.standard_normal(
        (args.n_data, 4, 16, 16))).astype(np.float32)
    text = embs[cls].astype(np.float32)

    tmp = tempfile.mkdtemp()
    np.save(os.path.join(tmp, "latents.npy"), latents * 8.0)  # /8 in-loop
    np.save(os.path.join(tmp, "text.npy"), text)
    np.save(os.path.join(tmp, "val.npy"), embs)

    cfg = ModelConfig(
        data_config=DataConfig(os.path.join(tmp, "latents.npy"),
                               os.path.join(tmp, "text.npy"),
                               os.path.join(tmp, "val.npy")),
        denoiser_config=dcfg,
        train_config=TrainConfig(
            n_epoch=args.epochs, batch_size=args.batch, lr=2e-3,
            save_model=False, use_wandb=False,
            save_and_eval_every_iters=10**9, checkpoint_dir=tmp,
            compute_dtype="float32"),
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
    )
    os.makedirs(args.ckpt_dir, exist_ok=True)
    t_path = os.path.join(args.ckpt_dir, "teacher.pkl")
    s_path = os.path.join(args.ckpt_dir, f"student_g{args.guidance}.pkl")

    if os.path.exists(t_path):
        print(f"loading cached teacher from {t_path}", flush=True)
        with open(t_path, "rb") as f:
            teacher = pickle.load(f)
    else:
        print("training teacher...", flush=True)
        result = train_main(cfg)
        print(f"teacher loss: first {np.mean(result['losses'][:10]):.4f} "
              f"last {np.mean(result['losses'][-10:]):.4f}", flush=True)
        teacher = jax.device_get(result["state"]["ema_params"])
        with open(t_path, "wb") as f:
            pickle.dump(teacher, f)

    if os.path.exists(s_path):
        print(f"loading cached student from {s_path}", flush=True)
        with open(s_path, "rb") as f:
            student = pickle.load(f)
    else:
        print("distilling...", flush=True)
        cfg.train_config.n_epoch = args.distill_epochs
        cfg.train_config.lr = 1e-3
        dres = distill_consistency(cfg, teacher, n_schedule=50,
                                   guidance=args.guidance)
        print(f"distill loss: first {np.mean(dres['losses'][:10]):.4f} "
              f"last {np.mean(dres['losses'][-10:]):.4f}", flush=True)
        student = jax.device_get(dres["ema_params"])
        with open(s_path, "wb") as f:
            pickle.dump(student, f)

    # ---- evaluation ----
    model = Denoiser(**dcfg.__dict__)
    n_eval = args.n_eval
    eval_cls = rng.integers(0, n_classes, size=n_eval)
    labels = jnp.asarray(embs[eval_cls])

    gen_t = DiffusionGenerator(model=model, params=teacher, vae=None)
    gen_s = DiffusionGenerator(model=model, params=student, vae=None,
                               fast_apply=consistency_apply(model))

    def teacher_lat(seed):
        _, lat = gen_t.generate(
            labels=labels, num_imgs=n_eval, img_size=16, n_iter=50,
            class_guidance=args.guidance, seed=seed, sharp_f=0, bright_f=0,
            use_ddpm_plus=False, scale_factor=1.0)
        return np.asarray(lat, np.float32)

    def student_lat(steps, seed):
        _, lat = gen_s.generate(
            labels=labels, num_imgs=n_eval, img_size=16, n_iter=steps,
            class_guidance=1.0, seed=seed, sharp_f=0, bright_f=0,
            use_ddpm_plus=False, fresh_noise=True, scale_factor=1.0)
        return np.asarray(lat, np.float32)

    t_a = teacher_lat(7)
    t_b = teacher_lat(1234)
    flat = lambda a: a.reshape(a.shape[0], -1)  # noqa: E731
    floor = compute_fid(flat(t_a), flat(t_b))
    # fresh truth samples from the generating distribution, same classes
    truth = (mus[eval_cls] + 0.1 * rng.standard_normal(
        (n_eval, 4, 16, 16))).astype(np.float32)
    fid_teacher_truth = compute_fid(flat(truth), flat(t_a))
    # how well does the teacher hit the true conditional clusters?
    mse_teacher = float(np.mean((t_a - mus[eval_cls]) ** 2))
    print(json.dumps({"mode": "teacher-50 vs teacher-50 (seeds)",
                      "latent_fid": round(floor, 4),
                      "teacher_vs_truth_fid": round(fid_teacher_truth, 4),
                      "teacher_vs_truth_mse": round(mse_teacher, 4)}),
          flush=True)

    for steps in (1, 2, 4, 8):
        s = student_lat(steps, 7)
        fid = compute_fid(flat(t_a), flat(s))
        fid_truth = compute_fid(flat(truth), flat(s))
        cos = float(np.mean(
            np.sum(flat(t_a) * flat(s), 1)
            / (np.linalg.norm(flat(t_a), axis=1)
               * np.linalg.norm(flat(s), axis=1) + 1e-8)))
        mse = float(np.mean((s - t_a) ** 2))
        mse_truth = float(np.mean((s - mus[eval_cls]) ** 2))
        print(json.dumps({
            "mode": f"student-{steps} vs teacher-50",
            "latent_fid": round(fid, 4),
            "student_vs_truth_fid": round(fid_truth, 4),
            "same_init_cos": round(cos, 4),
            "same_init_mse": round(mse, 4),
            "student_vs_truth_mse": round(mse_truth, 4)}), flush=True)


if __name__ == "__main__":
    main()
