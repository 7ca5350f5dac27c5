"""LoRA adaptation evidence (VERDICT r4 #6).

The LoRA feature (train/lora.py) ships with exactness/merge/save tests
but nothing showing a LoRA fine-tune actually ADAPTS a model. This
probe measures that on the shared toy benchmark:

  * distribution A: Benchmark(seed=0) — the base model's world.
  * distribution B: Benchmark(seed=5) — new class means / factors /
    text embeddings (a distribution shift, like a style domain).
  * variants, all scored by latent-FID / CLIP-FID on B at matched
    fine-tune budget:
      - base          (trained on A, never saw B)
      - lora-r8       (rank-8 adapters on B, base frozen)
      - full-ft       (all weights fine-tuned on B)
      - scratch       (trained on B only, same budget — context)
    plus the base scored on A (sanity yardstick: the base is good at
    its own world).

Done-bar (VERDICT): LoRA lands meaningfully below the frozen base on
B, approaching full fine-tune — "the gradients flow" becomes
"it adapts".

Usage (real TPU):  python scripts/probe_lora_adapt.py
Cached under --ckpt-dir; delete *.pkl to retrain.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ft-epochs", type=int, default=8)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--ckpt-dir", default="/tmp/lora_adapt_ckpt")
    ap.add_argument("--out", default="/tmp/lora_adapt_ckpt/report.json")
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
    from transformer_latent_diffusion_tpu.train import main as train_main
    from transformer_latent_diffusion_tpu.train.lora import merge_lora

    print(f"backend={jax.default_backend()}", flush=True)

    benchA = tb.Benchmark()
    benchB = tb.Benchmark(seed=5)
    dirA = os.path.join(args.ckpt_dir, "dataA")
    dirB = os.path.join(args.ckpt_dir, "dataB")
    pathsA = benchA.write_dataset(dirA)
    pathsB = benchB.write_dataset(dirB)
    dcfg = tb.base_denoiser_cfg()
    clip_feats = tb.clip_features_fn(benchB.img)

    base, _ = tb.train_or_load("lora_baseA", dcfg, pathsA, args.ckpt_dir,
                               epochs=24)
    scratchB, _ = tb.train_or_load("lora_scratchB", dcfg, pathsB,
                                   args.ckpt_dir, epochs=args.ft_epochs)

    def b_cfg(**tkw):
        defaults = dict(n_epoch=args.ft_epochs, batch_size=64, lr=2e-3,
                        save_model=False, use_wandb=False,
                        save_and_eval_every_iters=10 ** 9,
                        checkpoint_dir=args.ckpt_dir,
                        compute_dtype="float32")
        defaults.update(tkw)
        return ModelConfig(
            data_config=DataConfig(*pathsB),
            denoiser_config=dcfg,
            train_config=TrainConfig(**defaults),
            vae_cfg=VaeConfig(block_out_channels=(8, 16),
                              layers_per_block=1))

    def cached(name, fn):
        path = os.path.join(args.ckpt_dir, f"{name}.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        out = fn()
        with open(path, "wb") as f:
            pickle.dump(out, f)
        return out

    def run_lora():
        import jax.numpy as jnp

        res = train_main(b_cfg(lora_rank=args.rank), init_params=base)
        print(f"lora: {res['global_step']} steps, loss "
              f"{np.mean(res['losses'][:10]):.4f} -> "
              f"{np.mean(res['losses'][-10:]):.4f}", flush=True)
        merged = merge_lora(jax.tree.map(jnp.asarray, base),
                            res["lora"], res["scale"])
        return jax.device_get(merged)

    def run_full():
        res = train_main(b_cfg(), init_params=base)
        print(f"full-ft: loss {np.mean(res['losses'][:10]):.4f} -> "
              f"{np.mean(res['losses'][-10:]):.4f}", flush=True)
        return jax.device_get(res["state"]["ema_params"])

    lora_merged = cached("lora_mergedB", run_lora)
    full_ft = cached("lora_fullftB", run_full)

    report = {"ft_epochs": args.ft_epochs, "rank": args.rank}
    variants = (("base on A (yardstick)", base, benchA),
                ("base on B (frozen)", base, benchB),
                (f"lora-r{args.rank} on B", lora_merged, benchB),
                ("full-ft on B", full_ft, benchB),
                ("scratch on B", scratchB, benchB))
    for tag, params, bench in variants:
        sampler = tb.make_sampler(dcfg, params)
        rec = tb.score_replicates(bench, sampler, clip_feats=clip_feats)
        report[tag] = rec
        print(json.dumps({"mode": tag, **rec}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
