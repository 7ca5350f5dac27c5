"""Training example (mirrors the reference README's training flow).

Expects precomputed latents (see examples/prepare_data.py):
    latents.npy   (N, 4, S, S) float32/float16/uint8-quantized
    text_emb.npy  (N, 768)
    val_emb.npy   (8, 768)

    python examples/train_from_latents.py --batch-size 256 --dp 8
"""

import argparse
import os
import sys

# allow running from a source checkout without pip install
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latents", default="latents.npy")
    ap.add_argument("--text-emb", default="text_emb.npy")
    ap.add_argument("--val-emb", default="val_emb.npy")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--dp", type=int, default=None, help="data-parallel ways")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel ways")
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--embed-dim", type=int, default=768)
    ap.add_argument("--n-layers", type=int, default=12)
    ap.add_argument("--lora-rank", type=int, default=0,
                    help="> 0: LoRA fine-tune — train only rank-r "
                         "adapters on a base checkpoint (--init-npz)")
    ap.add_argument("--init-npz", default=None,
                    help="warm-start params (.npz); the frozen base "
                         "for --lora-rank")
    ap.add_argument("--eval-every", type=int, default=1000,
                    help="save_and_eval_every_iters")
    ap.add_argument("--no-save", action="store_true",
                    help="skip orbax checkpoints (smoke runs)")
    args = ap.parse_args()

    import jax

    from transformer_latent_diffusion_tpu.configs import (
        DataConfig, DenoiserConfig, ModelConfig, TrainConfig)
    from transformer_latent_diffusion_tpu.train import main as train_main

    dp = args.dp or (len(jax.devices()) // args.tp)
    cfg = ModelConfig(
        data_config=DataConfig(args.latents, args.text_emb, args.val_emb),
        denoiser_config=DenoiserConfig(
            image_size=args.image_size, embed_dim=args.embed_dim,
            n_layers=args.n_layers, noise_embed_dims=256),
        train_config=TrainConfig(
            batch_size=args.batch_size, lr=args.lr, n_epoch=args.epochs,
            mesh_shape=(dp, args.tp), compute_dtype="bfloat16",
            model_name="tld_tpu", use_wandb=False,
            save_and_eval_every_iters=args.eval_every,
            save_model=not args.no_save,
            lora_rank=args.lora_rank),
    )
    init_params = None
    if args.init_npz:
        from transformer_latent_diffusion_tpu.train import unflatten_npz

        init_params = unflatten_npz(args.init_npz)
    elif args.lora_rank > 0:
        ap.error("--lora-rank needs a base checkpoint (--init-npz)")
    train_main(cfg, init_params=init_params)


if __name__ == "__main__":
    main()
