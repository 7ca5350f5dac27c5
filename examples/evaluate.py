"""Generation-quality evaluation: generate one image per prompt and
report CLIP score — plus CLIP-FID (or VAE-latent FID) against a real
image set when one is provided.

With real converted towers (scripts/convert_towers.py, incl.
--clip-vision) the numbers are the standard literature metrics:

    python examples/evaluate.py --weights state_dict_378000.pth \
        --vae-npz towers/vae.npz --clip-npz towers/clip.npz \
        --vocab towers/bpe_simple_vocab_16e6.txt.gz \
        --clip-vision-npz towers/clip_vision.npz \
        --prompts prompts.txt --real-images real.npy

--tiny runs everything with tiny random towers (CPU smoke test; the
numbers are then relative-only, the repo's usual hermetic degradation).
Prints ONE JSON line; --save-images also writes the generated set as a
(N, H, W, 3) uint8 .npy for reuse (e.g. scripts/compute_fid.py)."""

import argparse
import json
import os
import sys

# allow running from a source checkout without pip install
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", default=None,
                    help="text file, one prompt per line")
    ap.add_argument("--prompt", action="append", default=None,
                    help="inline prompt (repeatable); overrides --prompts")
    ap.add_argument("--weights", default=None, help=".pth/.npz/.safetensors")
    ap.add_argument("--class-guidance", type=float, default=6)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--n-iter", type=int, default=15)
    ap.add_argument("--vae-npz", default=None)
    ap.add_argument("--clip-npz", default=None)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--clip-vision-npz", default=None,
                    help="converted image tower "
                         "(convert_towers.py --clip-vision)")
    ap.add_argument("--real-images", default=None,
                    help="(N,3,H,W) float[-1,1] or (N,H,W,3) uint8 .npy "
                         "of real images for FID")
    ap.add_argument("--save-images", default=None,
                    help="write generated images as uint8 .npy")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny towers (CPU-friendly smoke test)")
    args = ap.parse_args()

    import numpy as np

    from transformer_latent_diffusion_tpu.configs import (
        ClipConfig, ClipVisionConfig, DenoiserConfig, DenoiserLoad,
        LTDConfig, VaeConfig)
    from transformer_latent_diffusion_tpu.models.clip import FlaxClipVision
    from transformer_latent_diffusion_tpu.sampling import DiffusionTransformer
    from transformer_latent_diffusion_tpu.utils.clip_eval import (
        clip_image_features, clip_score)
    from transformer_latent_diffusion_tpu.utils.fid import compute_fid

    if args.prompt:
        prompts = list(args.prompt)
    elif args.prompts:
        with open(args.prompts) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
    else:
        prompts = ["a cute cat", "a red bicycle leaning on a wall",
                   "a watercolor mountain landscape", "a bowl of ramen"]

    if args.tiny:
        cfg = LTDConfig(
            denoiser_cfg=DenoiserConfig(),
            denoiser_load=DenoiserLoad(local_filename=args.weights),
            vae_cfg=VaeConfig(weights_path=args.vae_npz,
                              block_out_channels=(8, 16), layers_per_block=1),
            clip_cfg=ClipConfig(weights_path=args.clip_npz,
                                vocab_path=args.vocab,
                                width=64, heads=2, layers=2),
            use_pallas=False,
        )
        # embed_dim must match the text tower's projection (clip_score
        # compares the two in the shared embedding space)
        vcfg = ClipVisionConfig(weights_path=args.clip_vision_npz,
                                image_size=32, patch_size=8, width=64,
                                heads=2, layers=1, embed_dim=768)
    else:
        cfg = LTDConfig(
            denoiser_cfg=DenoiserConfig(
                image_size=32, embed_dim=768, n_layers=12,
                noise_embed_dims=256),
            denoiser_load=DenoiserLoad(local_filename=args.weights),
            vae_cfg=VaeConfig(weights_path=args.vae_npz),
            clip_cfg=ClipConfig(weights_path=args.clip_npz,
                                vocab_path=args.vocab),
        )
        vcfg = ClipVisionConfig(weights_path=args.clip_vision_npz)

    dt = DiffusionTransformer(cfg)
    imgs = dt.generate_array_from_text(
        prompts, class_guidance=args.class_guidance, seed=args.seed,
        n_iter=args.n_iter, pad_to=args.batch_size)
    if args.save_images:
        np.save(args.save_images, imgs)

    vision = FlaxClipVision.from_config(vcfg)
    report = {
        "n_images": int(imgs.shape[0]),
        "image_px": int(imgs.shape[1]),
        "n_iter": args.n_iter,
        "clip_score": clip_score(imgs, prompts, dt.clip_model, vision,
                                 batch_size=args.batch_size),
        "real_weights": bool(args.clip_vision_npz and args.clip_npz),
    }

    if args.real_images:
        real = np.load(args.real_images)
        if real.ndim == 4 and real.shape[1] == 3:  # NCHW [-1,1] -> NHWC u8
            real = ((real.transpose(0, 2, 3, 1) + 1.0) * 127.5).astype(
                np.uint8)
        report["clip_fid"] = compute_fid(
            clip_image_features(real, vision, batch_size=args.batch_size),
            clip_image_features(imgs, vision, batch_size=args.batch_size))

    print(json.dumps(report))


if __name__ == "__main__":
    main()
