"""eta-stochastic-DDIM QUALITY probe on the shared toy benchmark.

Stochastic sampling (eta > 0) re-injects fresh noise each step — on
image models it often trades a little sample sharpness for better
distribution coverage (classic DDPM-vs-DDIM behavior). This probe
measures where that trade lands on this repo's benchmark: x0 and v
models, eta in {0, 0.25, 0.5, 0.75, 1} x NFE in {8, 50}, sampler=ddim
(eta requires the DDIM update), guidance 3. eta=1 IS the fresh-noise
ancestral path (bit-equal, tests/test_samplers.py), so the eta=1 column
doubles as the ancestral sampler's score.

Usage (TPU): python scripts/probe_eta_quality.py
"""

import argparse
import json
import os
import sys

from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.toy_benchmark import (  # noqa: E402
    Benchmark,
    base_denoiser_cfg,
    clip_features_fn,
    make_sampler,
    score_replicates,
    train_or_load,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="/tmp/eta_quality_ckpt")
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--out", default="/tmp/eta_quality_ckpt/report.json")
    args = ap.parse_args()

    bench = Benchmark()
    data_dir = os.path.join(args.ckpt_dir, "data")
    paths = bench.write_dataset(data_dir)
    clip_feats = clip_features_fn(bench.img)

    report = []
    for objective in ("x0", "v"):
        dcfg = replace(base_denoiser_cfg(), objective=objective)
        print(f"== train {objective}", flush=True)
        params, losses = train_or_load(objective, dcfg, paths,
                                       args.ckpt_dir, epochs=args.epochs)
        for nfe in (8, 50):
            for eta in (0.0, 0.25, 0.5, 0.75, 1.0):
                sample = make_sampler(dcfg, params, class_guidance=3.0,
                                      sampler="ddim", n_iter=nfe, eta=eta)
                rec = {"objective": objective, "nfe": nfe, "eta": eta}
                rec.update(score_replicates(bench, sample,
                                            clip_feats=clip_feats))
                print(json.dumps(rec), flush=True)
                report.append(rec)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("report ->", args.out, flush=True)


if __name__ == "__main__":
    main()
