"""Schedule-shift QUALITY probe: does the SD3 timestep shift help hi-res?

TrainConfig.schedule_shift="auto" re-balances each multires bucket's
Beta noise draw toward high noise (k = bucket px / native px) and
generate(schedule_shift=...) re-balances the solver grid the same way
(sampling/diffusion.shift_noise_levels — Esser et al. 2024 §5.3.2
applies verbatim to this repo's interpolation corruption). This probe
measures both levers on the shared toy benchmark
(scripts/toy_benchmark.py), reusing probe_multires_quality's two-bucket
setup (16px native + 2x upsampled 32px bucket).

Arms (train):
  * multires        — bucketed training, no shift (the round-4 baseline
                      recipe; shares probe_multires_quality's cache key).
  * multires_shift  — identical run with schedule_shift="auto"
                      (native bucket's draw is bit-identical to off;
                      only the 32px bucket sees shifted noise).
Eval grid:
  * @16 (native): both arms, no sampler shift ("auto" would be k=1) —
    does shift-training cost anything at the native size?
  * @32: BOTH arms x sampler shift {off, auto=2} — the full 2x2,
    separating the training-side and sampling-side effects.

Run on the TPU:  python scripts/probe_schedule_shift.py
"""

import argparse
import json
import os
import sys

import numpy as np

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


def main():
    ap = argparse.ArgumentParser()
    # same dir as probe_multires_quality so the unshifted arm's cached
    # params are shared when both probes run
    ap.add_argument("--ckpt-dir", default="/tmp/multires_quality_ckpt")
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--out",
                    default="/tmp/multires_quality_ckpt/shift_report.json")
    args = ap.parse_args()

    bench = Benchmark()
    data_dir = os.path.join(args.ckpt_dir, "data")
    lo_paths = bench.write_dataset(data_dir)
    hi_paths = write_hi_dataset(bench, data_dir)

    dcfg = base_denoiser_cfg()
    arms = {}
    for name, extra in (("multires", {}),
                        ("multires_shift", dict(schedule_shift="auto"))):
        print(f"== train {name}", flush=True)
        arms[name], losses = train_or_load(
            name, dcfg, lo_paths, args.ckpt_dir, epochs=args.epochs,
            extra_buckets=(hi_paths,), **extra)
        if losses is not None:
            print(f"{name}: {len(losses)} steps, loss "
                  f"{np.mean(losses[:20]):.4f} -> "
                  f"{np.mean(losses[-20:]):.4f}", flush=True)

    feats16 = clip_features_fn(16)
    feats32 = clip_features_fn(IMG_HI)
    hi_eval = UpsampledEval(bench)
    report = {}

    def score(tag, params, img_size, eval_bench, feats, **gen_kw):
        sampler = make_sampler(dcfg, params, img_size=img_size, **gen_kw)
        report[tag] = score_replicates(eval_bench, sampler,
                                       clip_feats=feats)
        print(tag, report[tag], flush=True)

    # native size: shift training must not cost anything at 16px
    score("multires@16", arms["multires"], 16, bench, feats16)
    score("shift@16", arms["multires_shift"], 16, bench, feats16)
    # 32px 2x2: train-shift x sample-shift
    score("multires@32", arms["multires"], IMG_HI, hi_eval, feats32)
    score("multires@32+sampleshift", arms["multires"], IMG_HI, hi_eval,
          feats32, schedule_shift="auto")
    score("shift@32", arms["multires_shift"], IMG_HI, hi_eval, feats32)
    score("shift@32+sampleshift", arms["multires_shift"], IMG_HI, hi_eval,
          feats32, schedule_shift="auto")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("report ->", args.out, flush=True)


if __name__ == "__main__":
    main()
