"""Sampler/schedule quality at matched NFE on the strengthened shared
benchmark (scripts/toy_benchmark.py, VERDICT r3 #9), using the x0/v
models cached by probe_objective_quality.py (run that first; this one
only samples).

NFE accounting: ddim/dpm make n_iter denoiser calls per generation
(n_iter-1 scan steps + the final extra denoise); heun makes
2*(n_iter-1)+1. So at a call budget B: ddim/dpm n_iter=B,
heun n_iter=(B+1)//2.

Sweep: NFE in {8, 16, 50} x sampler in {ddim, dpm, heun} (poly grid),
plus schedule in {poly, cosine, karras} for ddim at each NFE; guidance 3
(the operating point probe_objective_quality.py established). Reports
latent-FID + CLIP-FID (in-repo image tower) + MSE, mean +- std over 3
eval replicates (compare values to each other, not to image-FID scales).

Usage: python scripts/probe_sampler_quality.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-eval", type=int, default=None)
    ap.add_argument("--replicates", type=int, default=None)
    ap.add_argument("--ckpt-dir", default="/tmp/toyq_ckpt")
    args = ap.parse_args()

    from dataclasses import replace

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import toy_benchmark as tb

    print(f"backend={jax.default_backend()}", flush=True)

    bench = tb.Benchmark()
    base_dcfg = tb.base_denoiser_cfg()
    n_eval = args.n_eval or tb.N_EVAL
    n_rep = args.replicates or tb.N_REPLICATES
    clip_feats = tb.clip_features_fn(bench.img)

    for objective in ("x0", "v"):
        path = os.path.join(args.ckpt_dir, f"{objective}.pkl")
        if not os.path.exists(path):
            print(f"missing {path} — run probe_objective_quality.py first",
                  flush=True)
            return
        with open(path, "rb") as f:
            params = pickle.load(f)
        dcfg = replace(base_dcfg, objective=objective)

        def report(tag, **gen_kw):
            sample = tb.make_sampler(dcfg, params, class_guidance=3.0,
                                     **gen_kw)
            rec = {"objective": objective, **tag}
            rec.update(tb.score_replicates(bench, sample, n_eval=n_eval,
                                           n_replicates=n_rep,
                                           clip_feats=clip_feats))
            print(json.dumps(rec), flush=True)

        for nfe in (8, 16, 50):
            report({"nfe": nfe, "sampler": "ddim"},
                   sampler="ddim", n_iter=nfe, use_ddpm_plus=False)
            report({"nfe": nfe, "sampler": "dpm"},
                   sampler="dpm", n_iter=nfe, use_ddpm_plus=True)
            report({"nfe": nfe, "sampler": "heun"},
                   sampler="heun", n_iter=(nfe + 1) // 2,
                   use_ddpm_plus=False)
            for schedule in ("cosine", "karras"):
                report({"nfe": nfe, "sampler": "ddim", "schedule": schedule},
                       sampler="ddim", schedule=schedule, n_iter=nfe,
                       use_ddpm_plus=False)


if __name__ == "__main__":
    main()
