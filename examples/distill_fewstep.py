"""Consistency-distillation example: trained checkpoint -> few-step model.

Implements the reference README's open TODO ("how to speed up generation
even more - LCMs?") end to end: load a trained denoiser checkpoint,
distill it on the same latents/text-embedding artifacts the train loop
uses, save the distilled EMA weights, and render a sample strip with
2/4/8-step fresh-noise sampling.

    python examples/distill_fewstep.py --weights denoiser.npz \
        --latents latents.npy --text-emb text_emb.npy \
        --epochs 4 --out fewstep.png

Defaults follow the measured round-5 recipe (docs/DESIGN.md few-step
table): guidance 1.0 baked + label dropout 0.15, so the student keeps a
trained unconditional branch and classifier-free guidance is chosen at
SAMPLING time (--sample-guidance). Deploy the saved weights through the
full serving surface with `LTDConfig(consistency=True,
denoiser_load=DenoiserLoad(local_filename="distilled_ema.npz"))`.
"""

import argparse
import os
import sys

# allow running from a source checkout without pip install
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help=".npz/.pth trained denoiser (untrained if omitted)")
    ap.add_argument("--latents", default="latents.npy")
    ap.add_argument("--text-emb", default="text_emb.npy")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--guidance", type=float, default=1.0,
                    help="CFG strength baked into the teacher step "
                         "(1.0 = the measured-best recipe; CFG is then "
                         "applied sampler-side)")
    ap.add_argument("--label-dropout", type=float, default=0.15,
                    help="label dropout during distillation — keeps "
                         "the uncond branch trained for sampler-side "
                         "CFG (set 0 for baked-guidance students)")
    ap.add_argument("--sample-guidance", type=float, default=1.0,
                    help="CFG strength for the output strip")
    ap.add_argument("--n-schedule", type=int, default=50)
    ap.add_argument("--steps", type=int, default=4,
                    help="sampling steps for the output strip")
    ap.add_argument("--save", default="distilled_ema.npz")
    ap.add_argument("--out", default="fewstep.png")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + random data (CPU smoke test)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from transformer_latent_diffusion_tpu.configs import (
        DataConfig, DenoiserConfig, ModelConfig, TrainConfig)
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.models.vae import FlaxVae
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
    from transformer_latent_diffusion_tpu.train import (
        consistency_apply, distill_consistency)
    from transformer_latent_diffusion_tpu.train.checkpoint import save_npz
    from transformer_latent_diffusion_tpu.utils import (
        init_denoiser_params, to_pil)

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        dcfg = DenoiserConfig()
        rng = np.random.default_rng(0)
        args.latents, args.text_emb = "/tmp/_lat.npy", "/tmp/_txt.npy"
        np.save(args.latents, rng.standard_normal(
            (64, 4, dcfg.image_size, dcfg.image_size)).astype(np.float32))
        np.save(args.text_emb,
                rng.standard_normal((64, 768)).astype(np.float32))
        args.batch_size, args.epochs, args.n_schedule = 16, 1, 8
    else:
        dcfg = DenoiserConfig(image_size=32, embed_dim=768, n_layers=12,
                              noise_embed_dims=256)

    model = Denoiser(**dcfg.__dict__)
    if args.weights:
        from transformer_latent_diffusion_tpu.sampling.pipeline import (
            load_denoiser_params,
        )
        teacher = load_denoiser_params(args.weights, model, dcfg)
    else:
        print("no --weights: distilling an untrained teacher (smoke only)")
        teacher = init_denoiser_params(model, dcfg)

    cfg = ModelConfig(
        data_config=DataConfig(args.latents, args.text_emb, args.text_emb),
        denoiser_config=dcfg,
        train_config=TrainConfig(batch_size=args.batch_size, lr=args.lr,
                                 n_epoch=args.epochs, use_wandb=False,
                                 save_model=False),
    )
    out = distill_consistency(cfg, teacher, n_schedule=args.n_schedule,
                              guidance=args.guidance,
                              label_dropout=args.label_dropout)
    print(f"distilled {out['global_step']} steps, "
          f"loss {out['losses'][0]:.4f} -> {out['losses'][-1]:.4f}")
    save_npz(args.save, out["ema_params"])
    print(f"saved {args.save}")

    vae = (FlaxVae.create(block_out_channels=(8, 16), layers_per_block=1)
           if args.tiny else FlaxVae.create())
    gen = DiffusionGenerator(model=model, params=out["ema_params"], vae=vae,
                             fast_apply=consistency_apply(model))
    labels = np.load(args.text_emb)[:4]
    img, _ = gen.generate(labels=labels, num_imgs=4,
                          img_size=dcfg.image_size, n_iter=args.steps,
                          class_guidance=args.sample_guidance, seed=7,
                          sharp_f=0, bright_f=0,
                          use_ddpm_plus=False, fresh_noise=True)
    from transformer_latent_diffusion_tpu.utils import make_grid

    to_pil(np.clip((np.asarray(make_grid(np.asarray(img), nrow=4,
                                         padding=4)) + 1) / 2, 0, 1)
           ).save(args.out)
    print(f"saved {args.out} ({args.steps}-step sampling)")


if __name__ == "__main__":
    main()
