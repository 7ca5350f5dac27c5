"""Quality effect of the guidance knobs (cfg_rescale, guidance_interval)
on the strengthened shared benchmark (scripts/toy_benchmark.py, VERDICT
r3 #9) — the cost side is measured in probe_guidance_cost.py (rescale
free, interval ~1.3%); this probe asks whether they actually help, using
the x0/v models cached by probe_objective_quality.py (run that first;
this one only samples).

High guidance overshoots the conditional mean (that is why
probe_objective_quality evaluates at guidance 3, not 6) — guidance-
rescale and interval-limited guidance are the two standard mitigations.
Sweep: guidance in {3, 6}, cfg_rescale in {0, 0.5, 0.75, 1.0} and
guidance_interval in {None, (0.1, 0.95), (0.2, 0.8)}; reports latent-FID
+ CLIP-FID (in-repo image tower) + MSE, mean +- std over 3 eval
replicates (compare values to each other).

Usage: python scripts/probe_guidance_quality.py [--cpu]
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

        def report(tag, guidance, rescale, interval):
            sample = tb.make_sampler(dcfg, params, class_guidance=guidance,
                                     cfg_rescale=rescale,
                                     guidance_interval=interval)
            rec = {"objective": objective, "guidance": guidance, **tag}
            rec.update(tb.score_replicates(bench, sample, n_eval=n_eval,
                                           n_replicates=n_rep,
                                           clip_feats=clip_feats))
            print(json.dumps(rec), flush=True)

        for guidance in (3.0, 6.0):
            for rescale in (0.0, 0.5, 0.75, 1.0):
                report({"cfg_rescale": rescale}, guidance, rescale, None)
            for interval in ((0.1, 0.95), (0.2, 0.8)):
                report({"guidance_interval": list(interval)},
                       guidance, 0.0, interval)


if __name__ == "__main__":
    main()
