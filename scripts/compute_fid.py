"""Compute FID between two sets of features or images.

Ships the reference's open TODO ("add script to compute FID",
reference README.md TODOS section). Extractor-agnostic:

  # literature-comparable FID: bring your own extractor features
  python scripts/compute_fid.py --features-a real.npy --features-b fake.npy

  # CLIP-FID (literature metric with real converted ViT-L/14 weights)
  python scripts/compute_fid.py --images-a real_imgs.npy \
      --images-b gen_imgs.npy --clip-vision towers/clip_vision.npz

  # tower-free relative metric: VAE-latent FID between two image sets
  python scripts/compute_fid.py --images-a real_imgs.npy \
      --images-b gen_imgs.npy --vae-npz towers/vae.npz

  # precomputed reference stats (fit the real set once, reuse forever)
  python scripts/compute_fid.py --features-a real.npy --save-stats ref.npz
  python scripts/compute_fid.py --features-a ref.npz --features-b fake.npy

Feature files are (N, D) .npy arrays (or a stats .npz from
--save-stats). Image files are (N, 3, H, W) float [-1,1] or uint8 .npy
arrays. Prints one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _load_images(path):
    arr = np.load(path)
    if arr.ndim != 4 or arr.shape[1] != 3:
        raise ValueError(f"{path}: expected (N,3,H,W), got {arr.shape}")
    if np.issubdtype(arr.dtype, np.integer):
        arr = arr.astype(np.float32) / 127.5 - 1.0
    return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features-a", help="(N,D) .npy of extractor features")
    ap.add_argument("--features-b")
    ap.add_argument("--images-a", help="(N,3,H,W) .npy; VAE-latent features")
    ap.add_argument("--images-b")
    ap.add_argument("--vae-npz", default=None,
                    help="converted VAE weights (scripts/convert_towers.py);"
                         " random-init without (relative numbers only)")
    ap.add_argument("--vae-blocks", default=None,
                    help="comma-separated block_out_channels if the VAE is "
                         "not the sdxl default")
    ap.add_argument("--vae-layers", type=int, default=None)
    ap.add_argument("--vae-latent", type=int, default=None)
    ap.add_argument("--clip-vision", default=None, nargs="?", const="",
                    help="CLIP-FID on the image sets: converted image-"
                         "tower .npz (convert_towers.py --clip-vision); "
                         "pass bare --clip-vision for a random-init "
                         "tower (relative numbers only)")
    ap.add_argument("--clip-vision-arch", default=None,
                    help="size,patch,width,heads,layers,embed_dim if not "
                         "the ViT-L/14 default (tests use tiny towers)")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--save-stats", default=None,
                    help="fit gaussian stats on side A only and write "
                         "them to this .npz (pytorch-fid-style "
                         "precomputed reference); pass the file later "
                         "as --features-a/--features-b")
    args = ap.parse_args()

    from transformer_latent_diffusion_tpu.utils.fid import (
        frechet_distance,
        gaussian_stats,
        load_stats,
        save_stats,
        vae_latent_features,
    )

    def _finish(fa, fb, kind):
        """fa/fb: (N, D) features, or a stats-.npz path string."""
        def stats_of(f):
            if isinstance(f, str):
                return load_stats(f)
            return gaussian_stats(f)

        def n_of(f):
            if isinstance(f, str):
                with np.load(f) as z:
                    return int(z["n"]) if "n" in z else -1
            return int(f.shape[0])

        if args.save_stats:
            if isinstance(fa, str):
                raise SystemExit("--save-stats input is already a stats file")
            save_stats(args.save_stats, fa)
            print(json.dumps({"metric": f"{kind}_stats", "n": n_of(fa),
                              "path": args.save_stats}))
            return
        print(json.dumps({"metric": kind,
                          "value": frechet_distance(*stats_of(fa),
                                                    *stats_of(fb)),
                          "n_a": n_of(fa), "n_b": n_of(fb)}))

    def _feats_or_stats(path):
        if path.endswith(".npz"):
            return path  # precomputed stats (save_stats / --save-stats)
        return np.load(path)

    one_sided = args.save_stats is not None
    if args.features_a and (args.features_b or one_sided):
        _finish(_feats_or_stats(args.features_a),
                _feats_or_stats(args.features_b) if args.features_b
                else None, "feature_fid")
        return
    elif args.images_a and (args.images_b or one_sided) \
            and args.clip_vision is not None:
        # CLIP-FID: literature-comparable once real converted ViT-L/14
        # weights are supplied (scripts/convert_towers.py --clip-vision)
        from transformer_latent_diffusion_tpu.configs import ClipVisionConfig
        from transformer_latent_diffusion_tpu.models.clip import (
            FlaxClipVision,
        )
        from transformer_latent_diffusion_tpu.utils.clip_eval import (
            clip_image_features,
        )

        vcfg = ClipVisionConfig(
            weights_path=args.clip_vision or None)
        if args.clip_vision_arch:
            s, p, w, h, L, e = (int(v) for v in
                                args.clip_vision_arch.split(","))
            vcfg = ClipVisionConfig(weights_path=args.clip_vision or None,
                                    image_size=s, patch_size=p, width=w,
                                    heads=h, layers=L, embed_dim=e)
        vt = FlaxClipVision.from_config(vcfg)

        def _nhwc_uint8(path):
            arr = _load_images(path)  # (N,3,H,W) float [-1,1]
            return ((arr.transpose(0, 2, 3, 1) + 1.0) * 127.5).astype(
                np.uint8)

        fa = clip_image_features(_nhwc_uint8(args.images_a), vt,
                                 args.batch_size)
        fb = (clip_image_features(_nhwc_uint8(args.images_b), vt,
                                  args.batch_size)
              if args.images_b else None)
        _finish(fa, fb, "clip_fid")
        return
    elif args.images_a and (args.images_b or one_sided):
        from transformer_latent_diffusion_tpu.models.torch_compat import (
            load_vae_params,
        )
        from transformer_latent_diffusion_tpu.models.vae import FlaxVae

        from transformer_latent_diffusion_tpu.configs import VaeConfig

        overrides = {}
        if args.vae_blocks:
            overrides["block_out_channels"] = tuple(
                int(c) for c in args.vae_blocks.split(","))
        if args.vae_layers is not None:
            overrides["layers_per_block"] = args.vae_layers
        if args.vae_latent is not None:
            overrides["latent_channels"] = args.vae_latent
        vae_cfg = VaeConfig(**overrides)
        params = None
        if args.vae_npz:
            params = load_vae_params(args.vae_npz, vae_cfg)
        vae = FlaxVae.create(
            block_out_channels=vae_cfg.block_out_channels,
            layers_per_block=vae_cfg.layers_per_block,
            latent_channels=vae_cfg.latent_channels, params=params)
        fa = vae_latent_features(_load_images(args.images_a), vae,
                                 args.batch_size)
        fb = (vae_latent_features(_load_images(args.images_b), vae,
                                  args.batch_size)
              if args.images_b else None)
        _finish(fa, fb, "vae_latent_fid")
        return
    else:
        ap.error("give --features-a/--features-b or --images-a/--images-b "
                 "(B side optional with --save-stats)")


if __name__ == "__main__":
    main()
