"""Quality verdicts for the training knobs: prediction objective
(x0/eps/v), min-SNR-gamma loss weighting, and offset noise.

Round-3 ran this on an 8-point-cluster / 512-sample benchmark scored by
single-replicate latent-FID — too weak for small-effect knobs (min_snr
came back "neutral", offset_noise had no number). This version runs on
the strengthened shared benchmark (scripts/toy_benchmark.py, VERDICT r3
#9): 32 classes with rank-8 within-class covariance, 4096 train / 1024
eval samples, latent-FID AND CLIP-FID via the in-repo image tower, and
mean +- std over 3 eval replicates.

For each variant (same data, same training seed, same epochs/lr):
  1. train.main with DenoiserConfig.objective / TrainConfig.loss_weighting
     / TrainConfig.offset_noise
  2. sample 50-step DDIM at guidance 3 per replicate
  3. score against fresh truth draws from the generating distribution
     (compare FIDs to each other, not to image-FID scales).

Prints one JSON line per variant; tables in docs/DESIGN.md. Params cache
under --ckpt-dir so metric-only reruns skip training.
Usage: python scripts/probe_objective_quality.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-eval", type=int, default=None,
                    help="eval samples per replicate (default: benchmark)")
    ap.add_argument("--replicates", type=int, default=None)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--ckpt-dir", default="/tmp/toyq_ckpt")
    args = ap.parse_args()

    from dataclasses import replace

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import toy_benchmark as tb

    print(f"backend={jax.default_backend()}", flush=True)

    bench = tb.Benchmark()
    data_paths = bench.write_dataset(os.path.join(tempfile.gettempdir(),
                                                  "toyq_data"))
    base_dcfg = tb.base_denoiser_cfg()
    n_eval = args.n_eval or tb.N_EVAL
    n_rep = args.replicates or tb.N_REPLICATES
    clip_feats = tb.clip_features_fn(bench.img)

    # (name, objective, loss_weighting, offset_noise)
    variants = [
        ("x0", "x0", None, 0.0),
        ("eps", "eps", None, 0.0),
        ("v", "v", None, 0.0),
        ("x0+min_snr", "x0", "min_snr", 0.0),
        ("v+min_snr", "v", "min_snr", 0.0),
        ("x0+offset", "x0", None, 0.1),
        ("v+offset", "v", None, 0.1),
    ]

    for name, objective, weighting, offset in variants:
        dcfg = replace(base_dcfg, objective=objective)
        params, losses = tb.train_or_load(
            name, dcfg, data_paths, args.ckpt_dir, epochs=args.epochs,
            batch=args.batch, loss_weighting=weighting,
            offset_noise=offset)
        sample = tb.make_sampler(dcfg, params,
                                 class_guidance=args.guidance)
        rec = {"variant": name}
        rec.update(tb.score_replicates(bench, sample, n_eval=n_eval,
                                       n_replicates=n_rep,
                                       clip_feats=clip_feats))
        if losses is not None:
            import numpy as np

            rec["train_loss_first10"] = round(float(np.mean(losses[:10])), 4)
            rec["train_loss_last10"] = round(float(np.mean(losses[-10:])), 4)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
