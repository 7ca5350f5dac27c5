"""Multi-resolution bucketed training QUALITY probe (VERDICT r3 #2).

Does ONE multires-trained model sample BOTH sizes as well as two
single-size specialists? The reference's story is a 256px model
fine-tuned to 512/1024 (reference README.md:22-26); this repo's
DataConfig.extra_latent_paths trains all resolutions jointly against
one master positional table (differentiable bilinear resize inside the
loss). This probe scores that claim on the shared toy benchmark
(scripts/toy_benchmark.py — 32 classes, rank-8 covariance, latent-FID
+ CLIP-FID, 3 eval replicates).

Setup (mirrors the real use-case: SAME content at two resolutions):
  * native bucket: 16px latents straight from the benchmark.
  * 2x bucket: fresh draws from the same class distribution,
    bilinearly upsampled to 32px (like 512px crops of the same photos).
Variants:
  * multires  — image_size=16 model trained on 16px (4096) + 32px
    (2048) buckets interleaved.
  * solo16    — image_size=16 model, 16px data only (specialist).
  * solo32    — image_size=32 model, 32px data only (specialist).
Eval:
  * at 16px: multires vs solo16.
  * at 32px: multires (sampler auto pos-resize) vs solo32 vs solo16
    sampled zero-shot at 32px (pos-resize with NO 32px training — the
    column multires training has to beat to justify itself).

Cached like the other knob probes: params .pkl per variant under
--ckpt-dir; delete to retrain.

Run on the TPU:  python scripts/probe_multires_quality.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.toy_benchmark import (  # noqa: E402
    DATA_SEED,
    N_EVAL,
    Benchmark,
    base_denoiser_cfg,
    clip_features_fn,
    make_sampler,
    score_replicates,
    train_or_load,
)

IMG_HI = 32


def upsample(lat: np.ndarray, size: int) -> np.ndarray:
    """Bilinear NCHW upsample (jax.image, like resize_pos_embed)."""
    import jax
    import jax.numpy as jnp

    out = jax.image.resize(
        jnp.asarray(lat), (lat.shape[0], lat.shape[1], size, size),
        method="bilinear")
    return np.asarray(out, np.float32)


class UpsampledEval:
    """bench.eval_set at the upsampled resolution (fresh truth draws
    from the SAME generating distribution, then 2x bilinear)."""

    def __init__(self, base: Benchmark, img: int = IMG_HI):
        self.base, self.img = base, img

    def eval_set(self, replicate: int, n_eval: int = N_EVAL):
        labels, truth, seed = self.base.eval_set(replicate, n_eval)
        return labels, upsample(truth, self.img), seed


def write_hi_dataset(bench: Benchmark, out_dir: str, n: int = 2048):
    """32px training bucket: fresh draws (seed disjoint from both the
    16px train split and every eval replicate), upsampled, x8 scale."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(DATA_SEED + 8)
    cls = rng.integers(0, bench.n_classes, size=n)
    latents = upsample(bench.sample(cls, rng), IMG_HI)
    text = (bench.embs[cls]
            + 0.05 * rng.standard_normal((n, 768))).astype(np.float32)
    lp = os.path.join(out_dir, "latents_hi.npy")
    tp = os.path.join(out_dir, "text_hi.npy")
    np.save(lp, latents * 8.0)
    np.save(tp, text)
    return lp, tp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="/tmp/multires_quality_ckpt")
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--out", default="/tmp/multires_quality_ckpt/report.json")
    args = ap.parse_args()

    bench = Benchmark()
    data_dir = os.path.join(args.ckpt_dir, "data")
    lo_paths = bench.write_dataset(data_dir)
    hi_paths = write_hi_dataset(bench, data_dir)

    dcfg16 = base_denoiser_cfg()
    from dataclasses import replace

    dcfg32 = replace(dcfg16, image_size=IMG_HI)

    variants = {
        "multires": (dcfg16, dict(extra_buckets=(hi_paths,))),
        "solo16": (dcfg16, {}),
        "solo32": (dcfg32, {}),
    }
    params = {}
    for name, (dcfg, kw) in variants.items():
        if name == "solo32":
            # specialist trains on the 32px bucket as its MAIN dataset
            paths = (hi_paths[0], hi_paths[1], lo_paths[2])
        else:
            paths = lo_paths
        print(f"== train {name}", flush=True)
        params[name], losses = train_or_load(
            name, dcfg, paths, args.ckpt_dir, epochs=args.epochs, **kw)
        if losses is not None:
            print(f"{name}: {len(losses)} steps, loss "
                  f"{np.mean(losses[:20]):.4f} -> "
                  f"{np.mean(losses[-20:]):.4f}", flush=True)

    feats16 = clip_features_fn(16)
    feats32 = clip_features_fn(IMG_HI)
    hi_eval = UpsampledEval(bench)
    report = {}

    def score(tag, dcfg, p, img_size, eval_bench, feats, **gen_kw):
        sampler = make_sampler(dcfg, p, img_size=img_size, **gen_kw)
        report[tag] = score_replicates(eval_bench, sampler,
                                       clip_feats=feats)
        print(tag, report[tag], flush=True)

    # 16px leg
    score("multires@16", dcfg16, params["multires"], 16, bench, feats16)
    score("solo16@16", dcfg16, params["solo16"], 16, bench, feats16)
    # 32px leg (multires + solo16 rely on sampler-side auto pos-resize)
    score("multires@32", dcfg16, params["multires"], IMG_HI, hi_eval,
          feats32)
    score("solo32@32", dcfg32, params["solo32"], IMG_HI, hi_eval, feats32)
    score("solo16@32_zeroshot", dcfg16, params["solo16"], IMG_HI, hi_eval,
          feats32)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("report ->", args.out, flush=True)


if __name__ == "__main__":
    main()
