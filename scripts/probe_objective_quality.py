"""Quality numbers for the prediction objectives (x0/eps/v) and min-SNR
loss weighting — the round-3 training additions ship with correctness
proofs (objective-invariance, exact conversions) but no evidence about
which setting actually trains better; this probe attaches that, on the
same hermetic synthetic-cluster setup probe_fewstep_quality.py
established (8 memorizable latent clusters keyed by 8 text embeddings).

For each variant (same data, same seed, same epochs/lr):
  1. train.main with DenoiserConfig.objective / TrainConfig.loss_weighting
  2. sample 50-step DDIM at guidance 3 with the matching conversion
  3. report latent-FID and MSE against fresh TRUTH samples from the
     generating distribution (same yardstick and caveats as
     probe_fewstep_quality.py: compare FIDs to each other, not to
     image-FID scales).

Prints one JSON line per variant; paste the table into docs/DESIGN.md.
Params cache under --ckpt-dir so metric-only reruns skip training.
Usage: python scripts/probe_objective_quality.py [--cpu]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-data", type=int, default=512)
    ap.add_argument("--n-eval", type=int, default=512)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--ckpt-dir", default="/tmp/objective_quality_ckpt")
    args = ap.parse_args()

    import pickle
    from dataclasses import replace

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
    from transformer_latent_diffusion_tpu.train import main as train_main
    from transformer_latent_diffusion_tpu.utils.fid import compute_fid

    print(f"backend={jax.default_backend()}", flush=True)

    # ---- synthetic conditional dataset (probe_fewstep_quality setup) ----
    base_dcfg = DenoiserConfig(image_size=16, embed_dim=128, n_layers=3,
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
    data_cfg = DataConfig(os.path.join(tmp, "latents.npy"),
                          os.path.join(tmp, "text.npy"),
                          os.path.join(tmp, "val.npy"))
    os.makedirs(args.ckpt_dir, exist_ok=True)

    n_eval = args.n_eval
    eval_cls = rng.integers(0, n_classes, size=n_eval)
    labels = jnp.asarray(embs[eval_cls])
    truth = (mus[eval_cls] + 0.1 * rng.standard_normal(
        (n_eval, 4, 16, 16))).astype(np.float32)
    flat = lambda a: a.reshape(a.shape[0], -1)  # noqa: E731

    variants = [
        ("x0", "x0", None),
        ("eps", "eps", None),
        ("v", "v", None),
        ("x0+min_snr", "x0", "min_snr"),
        ("v+min_snr", "v", "min_snr"),
    ]

    for name, objective, weighting in variants:
        dcfg = replace(base_dcfg, objective=objective)
        cfg = ModelConfig(
            data_config=data_cfg,
            denoiser_config=dcfg,
            train_config=TrainConfig(
                n_epoch=args.epochs, batch_size=args.batch, lr=2e-3,
                save_model=False, use_wandb=False,
                save_and_eval_every_iters=10**9, checkpoint_dir=tmp,
                compute_dtype="float32", loss_weighting=weighting),
            vae_cfg=VaeConfig(block_out_channels=(8, 16),
                              layers_per_block=1),
        )
        path = os.path.join(args.ckpt_dir, f"{name}.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                params = pickle.load(f)
            losses = None
        else:
            result = train_main(cfg)
            params = jax.device_get(result["state"]["ema_params"])
            losses = result["losses"]
            with open(path, "wb") as f:
                pickle.dump(params, f)

        model = Denoiser(**dcfg.__dict__)
        gen = DiffusionGenerator(model=model, params=params, vae=None)
        _, lat = gen.generate(
            labels=labels, num_imgs=n_eval, img_size=16, n_iter=50,
            class_guidance=args.guidance, seed=7, sharp_f=0, bright_f=0,
            use_ddpm_plus=False, scale_factor=1.0)
        lat = np.asarray(lat, np.float32)
        rec = {
            "variant": name,
            "truth_fid": round(compute_fid(flat(truth), flat(lat)), 4),
            "truth_mse": round(float(np.mean((lat - mus[eval_cls]) ** 2)),
                               4),
        }
        if losses is not None:
            rec["train_loss_first10"] = round(float(np.mean(losses[:10])), 4)
            rec["train_loss_last10"] = round(float(np.mean(losses[-10:])), 4)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
