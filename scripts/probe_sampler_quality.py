"""Sampler/schedule quality at matched NFE on the hermetic 8-cluster
benchmark, using the x0/v models cached by probe_objective_quality.py
(run that first; this one only samples).

NFE accounting: ddim/dpm make n_iter denoiser calls per generation
(n_iter-1 scan steps + the final extra denoise); heun makes
2*(n_iter-1)+1. So at a call budget B: ddim/dpm n_iter=B,
heun n_iter=(B+1)//2.

Sweep: NFE in {8, 16, 50} x sampler in {ddim, dpm, heun} (poly grid),
plus schedule in {poly, cosine, karras} for ddim at each NFE; guidance 3
(the operating point probe_objective_quality.py established). Reports
truth-FID / truth-MSE (same yardstick + latent-FID caveats as the other
probes; compare values to each other).

Usage: python scripts/probe_sampler_quality.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-eval", type=int, default=512)
    ap.add_argument("--ckpt-dir", default="/tmp/objective_quality_ckpt")
    args = ap.parse_args()

    import pickle
    from dataclasses import replace

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
    from transformer_latent_diffusion_tpu.utils.fid import compute_fid

    print(f"backend={jax.default_backend()}", flush=True)

    # same dataset constants as probe_objective_quality (rng stream
    # replayed: mus/embs are the first two draws from seed 0)
    base_dcfg = DenoiserConfig(image_size=16, embed_dim=128, n_layers=3,
                               noise_embed_dims=128)
    rng = np.random.default_rng(0)
    n_classes = 8
    mus = rng.standard_normal((n_classes, 4, 16, 16)).astype(np.float32)
    embs = rng.standard_normal((n_classes, 768)).astype(np.float32)

    n_eval = args.n_eval
    eval_rng = np.random.default_rng(42)
    eval_cls = eval_rng.integers(0, n_classes, size=n_eval)
    labels = jnp.asarray(embs[eval_cls])
    truth = (mus[eval_cls] + 0.1 * eval_rng.standard_normal(
        (n_eval, 4, 16, 16))).astype(np.float32)
    flat = lambda a: a.reshape(a.shape[0], -1)  # noqa: E731

    for objective in ("x0", "v"):
        path = os.path.join(args.ckpt_dir, f"{objective}.pkl")
        if not os.path.exists(path):
            print(f"missing {path} — run probe_objective_quality.py first",
                  flush=True)
            return
        with open(path, "rb") as f:
            params = pickle.load(f)
        model = Denoiser(**replace(base_dcfg, objective=objective).__dict__)
        gen = DiffusionGenerator(model=model, params=params, vae=None)

        def report(tag, **gen_kw):
            _, lat = gen.generate(
                labels=labels, num_imgs=n_eval, img_size=16,
                class_guidance=3.0, seed=7, sharp_f=0, bright_f=0,
                scale_factor=1.0, **gen_kw)
            lat = np.asarray(lat, np.float32)
            print(json.dumps({
                "objective": objective, **tag,
                "truth_fid": round(compute_fid(flat(truth), flat(lat)), 4),
                "truth_mse": round(
                    float(np.mean((lat - mus[eval_cls]) ** 2)), 4)}),
                flush=True)

        for nfe in (8, 16, 50):
            report({"nfe": nfe, "sampler": "ddim"},
                   sampler="ddim", n_iter=nfe)
            report({"nfe": nfe, "sampler": "dpm"},
                   sampler="dpm", n_iter=nfe)
            report({"nfe": nfe, "sampler": "heun"},
                   sampler="heun", n_iter=(nfe + 1) // 2)
            for schedule in ("cosine", "karras"):
                report({"nfe": nfe, "sampler": "ddim", "schedule": schedule},
                       sampler="ddim", schedule=schedule, n_iter=nfe)


if __name__ == "__main__":
    main()
