"""One-command pretrained-tower conversion: VAE + CLIP -> .npz.

The reference pulls its frozen towers from the hub at runtime
(/root/reference/tld/diffusion.py:157-161: diffusers AutoencoderKL
"madebyollin/sdxl-vae-fp16-fix" + openai CLIP "ViT-L/14"). This framework
loads pre-converted Flax .npz files instead (hermetic, torch-free at
serving time). This script is the bridge: point it at the published
checkpoints (local paths or URLs) and it writes the .npz files plus the
LTDConfig wiring.

Usage:
  python scripts/convert_towers.py \
      --vae  path-or-url/to/diffusion_pytorch_model.safetensors \
      --clip path-or-url/to/clip model.safetensors (HF) or ViT-L/14.pt \
      --vocab path-or-url/to/bpe_simple_vocab_16e6.txt.gz \
      --out-dir towers/

Published artifact URLs (fetch with any downloader, or pass directly):
  VAE:   https://huggingface.co/madebyollin/sdxl-vae-fp16-fix/resolve/main/diffusion_pytorch_model.safetensors
  CLIP:  https://huggingface.co/openai/clip-vit-large-patch14/resolve/main/model.safetensors
  vocab: https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz

Then:
  from transformer_latent_diffusion_tpu.configs import LTDConfig, VaeConfig, ClipConfig
  cfg = LTDConfig(vae_cfg=VaeConfig(weights_path="towers/vae.npz"),
                  clip_cfg=ClipConfig(weights_path="towers/clip.npz",
                                      vocab_path="towers/bpe_simple_vocab_16e6.txt.gz"))

Accepts diffusers safetensors/bin for the VAE and either the HF
transformers CLIPModel layout (model.safetensors) or the openai
TorchScript archive (ViT-L/14.pt) for CLIP. --verify round-trips the
written files through FlaxVae/FlaxClip and runs a smoke forward.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(path_or_url: str, out_dir: str) -> str:
    if not path_or_url.startswith(("http://", "https://")):
        return path_or_url
    from transformer_latent_diffusion_tpu.sampling.pipeline import (
        download_file,
    )

    local = os.path.join(out_dir, os.path.basename(path_or_url))
    if not os.path.exists(local):
        print(f"downloading {path_or_url} -> {local}")
        download_file(path_or_url, local)
    return local


def main():
    ap = argparse.ArgumentParser(
        description="Convert pretrained VAE/CLIP checkpoints to Flax .npz")
    ap.add_argument("--vae", help="diffusers AutoencoderKL checkpoint "
                                  "(.safetensors/.bin/.pth) or URL")
    ap.add_argument("--clip", help="CLIP checkpoint: HF transformers "
                                   "model.safetensors or openai ViT-L/14.pt, "
                                   "or URL")
    ap.add_argument("--clip-vision",
                    help="also convert the CLIP *image* tower (same HF "
                         "model.safetensors or openai ViT-L/14.pt input) "
                         "-> clip_vision.npz for CLIP-FID / CLIP-score "
                         "eval (utils/clip_eval.py)")
    ap.add_argument("--vocab", help="openai CLIP BPE vocab "
                                    "(bpe_simple_vocab_16e6.txt.gz) or URL")
    ap.add_argument("--out-dir", default="towers")
    ap.add_argument("--verify", action="store_true",
                    help="load the written .npz back and run a smoke forward")
    ap.add_argument("--vae-blocks", default=None,
                    help="comma-separated block_out_channels if the VAE is "
                         "not the sdxl default (e.g. '8,16' for test VAEs)")
    ap.add_argument("--vae-layers", type=int, default=None,
                    help="layers_per_block if not the sdxl default (2)")
    ap.add_argument("--vae-latent", type=int, default=None,
                    help="latent_channels if not the sdxl default (4)")
    args = ap.parse_args()
    if not (args.vae or args.clip or args.clip_vision or args.vocab):
        ap.error("nothing to do: pass --vae and/or --clip and/or "
                 "--clip-vision and/or --vocab")

    os.makedirs(args.out_dir, exist_ok=True)

    from transformer_latent_diffusion_tpu.configs import ClipConfig, VaeConfig
    from transformer_latent_diffusion_tpu.train.checkpoint import save_npz

    wiring = {}

    if args.vae:
        from transformer_latent_diffusion_tpu.models.torch_compat import (
            load_vae_params,
        )

        overrides = {}
        if args.vae_blocks:
            overrides["block_out_channels"] = tuple(
                int(c) for c in args.vae_blocks.split(","))
        if args.vae_layers is not None:
            overrides["layers_per_block"] = args.vae_layers
        if args.vae_latent is not None:
            overrides["latent_channels"] = args.vae_latent
        vae_cfg = VaeConfig(**overrides)
        src = _fetch(args.vae, args.out_dir)
        print(f"converting VAE {src} ...")
        params = load_vae_params(src, vae_cfg)
        out = os.path.join(args.out_dir, "vae.npz")
        save_npz(out, params)
        print(f"wrote {out}")
        wiring["vae_cfg"] = f'VaeConfig(weights_path="{out}")'
        if args.verify:
            import jax.numpy as jnp

            from transformer_latent_diffusion_tpu.models.torch_compat import (
                load_vae_params as reload,
            )
            from transformer_latent_diffusion_tpu.models.vae import FlaxVae

            vae = FlaxVae.create(
                block_out_channels=vae_cfg.block_out_channels,
                layers_per_block=vae_cfg.layers_per_block,
                latent_channels=vae_cfg.latent_channels,
                params=reload(out, vae_cfg))
            img = vae.decode(
                jnp.zeros((1, vae_cfg.latent_channels, 8, 8)))
            up = 2 ** (len(vae_cfg.block_out_channels) - 1)
            assert img.shape == (1, 3, 8 * up, 8 * up), img.shape
            print("VAE verify OK:", img.shape)

    if args.clip:
        from transformer_latent_diffusion_tpu.models.torch_compat import (
            load_clip_params,
        )

        clip_cfg = ClipConfig()
        src = _fetch(args.clip, args.out_dir)
        print(f"converting CLIP {src} ...")
        params = load_clip_params(src, clip_cfg)
        out = os.path.join(args.out_dir, "clip.npz")
        save_npz(out, params)
        print(f"wrote {out}")
        wiring["clip"] = out

    if args.clip_vision:
        from transformer_latent_diffusion_tpu.models.torch_compat import (
            load_clip_vision_params,
        )

        src = _fetch(args.clip_vision, args.out_dir)
        print(f"converting CLIP image tower {src} ...")
        vparams = load_clip_vision_params(src, layers=24)
        vout = os.path.join(args.out_dir, "clip_vision.npz")
        save_npz(vout, vparams)
        print(f"wrote {vout}")
        print("use: ClipVisionConfig(weights_path="
              f'"{vout}") with utils/clip_eval.py (CLIP-FID / CLIP score)')
        if args.verify:
            import numpy as _np

            from transformer_latent_diffusion_tpu.configs import (
                ClipVisionConfig,
            )
            from transformer_latent_diffusion_tpu.models.clip import (
                FlaxClipVision,
            )

            vt = FlaxClipVision.from_config(
                ClipVisionConfig(weights_path=vout))
            emb = vt.embed(_np.zeros((1, 224, 224, 3), _np.uint8))
            assert emb.shape == (1, 768), emb.shape
            print("CLIP vision verify OK:", emb.shape)

    vocab_out = None
    if args.vocab:
        src = _fetch(args.vocab, args.out_dir)
        vocab_out = os.path.join(args.out_dir, os.path.basename(src))
        if os.path.abspath(src) != os.path.abspath(vocab_out):
            shutil.copyfile(src, vocab_out)
        print(f"vocab at {vocab_out}")
    elif args.clip:
        print("WARNING: no --vocab given. CLIP weights without the BPE "
              "vocab fall back to the HashTokenizer stub and produce "
              "garbage embeddings at runtime.")

    if "clip" in wiring:
        vp = f', vocab_path="{vocab_out}"' if vocab_out else ""
        wiring["clip_cfg"] = f'ClipConfig(weights_path="{wiring.pop("clip")}"{vp})'
        if args.verify:
            from transformer_latent_diffusion_tpu.models.clip import FlaxClip
            from transformer_latent_diffusion_tpu.models.torch_compat import (
                load_clip_params as reload,
            )

            clip = FlaxClip.create(
                params=reload(os.path.join(args.out_dir, "clip.npz"),
                              ClipConfig()),
                vocab_path=vocab_out)
            emb = clip.encode_text(["a cute cat"])
            assert emb.shape == (1, 768), emb.shape
            print("CLIP verify OK:", emb.shape)

    if wiring:
        print("\nLTDConfig wiring:\n  LTDConfig(" +
              ", ".join(wiring.values()) + ")")


if __name__ == "__main__":
    main()
