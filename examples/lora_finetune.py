"""LoRA fine-tuning example: base checkpoint -> rank-r adapters -> images.

Fine-tunes low-rank adapters on the five dense projections of every
decoder block (the base weights stay frozen), saves the adapters as a
small `lora.npz` (~3 MB at rank 8 for the 101M model vs ~400 MB for a
full checkpoint), and renders a sample strip from the merged model.
Mirrors the reference's fine-tuning story (README.md:22-26 of the
reference describes full fine-tunes; LoRA is this framework's cheap
alternative) on the same latents/text-embedding artifacts train.main
uses.

    python examples/lora_finetune.py --weights denoiser.npz \
        --latents latents.npy --text-emb text_emb.npy \
        --rank 8 --epochs 4 --out lora_samples.png

Load the adapters elsewhere with `DiffusionTransformer.load_lora(path)`
(optionally with a `scale=` strength knob) or `train.lora.merge_lora`.
"""

import argparse
import os
import sys

# allow running from a source checkout without pip install
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help=".npz/.pth base denoiser (untrained if omitted)")
    ap.add_argument("--latents", default="latents.npy")
    ap.add_argument("--text-emb", default="text_emb.npy")
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=None,
                    help="merge numerator (defaults to rank)")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--save", default="lora.npz")
    ap.add_argument("--out", default="lora_samples.png")
    ap.add_argument("--n-iter", type=int, default=15)
    ap.add_argument("--guidance", type=float, default=4.5)
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
    from transformer_latent_diffusion_tpu.train import main as train_main
    from transformer_latent_diffusion_tpu.train.lora import (
        count_lora_parameters, merge_lora, save_lora)
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
        args.batch_size, args.epochs, args.rank = 16, 1, 2
        args.n_iter = 4
    else:
        dcfg = DenoiserConfig(image_size=32, embed_dim=768, n_layers=12,
                              noise_embed_dims=256)

    model = Denoiser(**dcfg.__dict__)
    if args.weights:
        from transformer_latent_diffusion_tpu.sampling.pipeline import (
            load_denoiser_params,
        )
        base = load_denoiser_params(args.weights, model, dcfg)
    else:
        print("no --weights: adapting an untrained base (smoke only)")
        base = init_denoiser_params(model, dcfg)

    cfg = ModelConfig(
        data_config=DataConfig(args.latents, args.text_emb, args.text_emb),
        denoiser_config=dcfg,
        train_config=TrainConfig(batch_size=args.batch_size, lr=args.lr,
                                 n_epoch=args.epochs, use_wandb=False,
                                 save_model=False, lora_rank=args.rank,
                                 lora_alpha=args.alpha),
    )
    out = train_main(cfg, init_params=base)
    lora, scale = out["lora"], out["scale"]
    print(f"trained {out['global_step']} steps, "
          f"loss {out['losses'][0]:.4f} -> {out['losses'][-1]:.4f}; "
          f"{count_lora_parameters(lora)} adapter params")
    save_lora(args.save, lora, scale=scale, raw=out["raw_lora"])
    print(f"saved {args.save}")

    merged = merge_lora(base, lora, scale)
    vae = (FlaxVae.create(block_out_channels=(8, 16), layers_per_block=1)
           if args.tiny else FlaxVae.create())
    gen = DiffusionGenerator(model=model, params=merged, vae=vae)
    labels = np.load(args.text_emb)[:4]
    img, _ = gen.generate(labels=labels, num_imgs=4,
                          img_size=dcfg.image_size, n_iter=args.n_iter,
                          class_guidance=args.guidance, seed=7,
                          sharp_f=0, bright_f=0)
    from transformer_latent_diffusion_tpu.utils import make_grid

    to_pil(np.clip((np.asarray(make_grid(np.asarray(img), nrow=4,
                                         padding=4)) + 1) / 2, 0, 1)
           ).save(args.out)
    print(f"saved {args.out} (rank-{args.rank} adapters merged)")


if __name__ == "__main__":
    main()
