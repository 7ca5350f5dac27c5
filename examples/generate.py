"""Text-to-image generation example (mirrors the reference README's
inference flow with the same public API).

With pretrained weights (converted from the reference's published torch
checkpoint on the fly) and real towers (converted once via
scripts/convert_towers.py):

    python examples/generate.py --weights state_dict_378000.pth \
        --vae-npz towers/vae.npz --clip-npz towers/clip.npz \
        --vocab towers/bpe_simple_vocab_16e6.txt.gz \
        --prompt "a cute puppy wearing a cape" --num-imgs 9

Without weights it runs the untrained flagship model end-to-end (useful
as a smoke test)."""

import argparse
import os
import sys

# allow running from a source checkout without pip install
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a cute cat")
    ap.add_argument("--weights", default=None, help=".pth or .npz denoiser weights")
    ap.add_argument("--class-guidance", type=float, default=6)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--num-imgs", type=int, default=1)
    ap.add_argument("--n-iter", type=int, default=15)
    ap.add_argument("--out", default="out.png")
    ap.add_argument("--vae-npz", default=None,
                    help="converted VAE weights (scripts/convert_towers.py)")
    ap.add_argument("--clip-npz", default=None,
                    help="converted CLIP weights")
    ap.add_argument("--vocab", default=None,
                    help="CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny towers (CPU-friendly smoke test)")
    ap.add_argument("--negative-prompt", default=None,
                    help="CFG steers away from this instead of the zero vector")
    ap.add_argument("--init-image", default=None,
                    help="img2img: start from this image (PNG/JPEG path)")
    ap.add_argument("--mask", default=None,
                    help="inpainting: white = regenerate (requires --init-image)")
    ap.add_argument("--strength", type=float, default=None,
                    help="img2img departure, (0,1]; default 0.5 (1.0 with --mask)")
    ap.add_argument("--interpolate-to", default=None,
                    help="morph --prompt -> this prompt: one strip of "
                         "--num-imgs frames, shared init noise")
    ap.add_argument("--consistency", action="store_true",
                    help="--weights is a consistency-distilled student "
                         "(examples/distill_fewstep.py): fresh-noise "
                         "multistep sampling — pair with --n-iter 1-4")
    ap.add_argument("--sampler", default=None,
                    choices=("ddim", "dpm", "heun"),
                    help="solver (default: reference DPM++(2M))")
    ap.add_argument("--schedule", default="poly",
                    choices=("poly", "cosine", "karras"),
                    help="noise-level spacing")
    ap.add_argument("--eta", type=float, default=0.0,
                    help="stochastic DDIM in [0,1] (requires "
                         "--sampler ddim); 1 = ancestral")
    ap.add_argument("--cfg-rescale", type=float, default=0.0,
                    help="guidance-rescale in [0,1] (Lin et al. 2023)")
    ap.add_argument("--schedule-shift", type=float, default=None,
                    help="SD3 timestep shift k > 0 (k > 1 = more time "
                         "at high noise)")
    args = ap.parse_args()

    from transformer_latent_diffusion_tpu.configs import (
        ClipConfig, DenoiserConfig, DenoiserLoad, LTDConfig, VaeConfig)
    from transformer_latent_diffusion_tpu.sampling import DiffusionTransformer

    if args.tiny:
        # --vae-npz/--clip-npz still load under --tiny (weights converted
        # for the matching tiny architecture), so the pretrained-weights
        # wiring is exercisable offline — tests/test_examples.py drives it.
        cfg = LTDConfig(
            denoiser_cfg=DenoiserConfig(),
            denoiser_load=DenoiserLoad(local_filename=args.weights),
            vae_cfg=VaeConfig(weights_path=args.vae_npz,
                              block_out_channels=(8, 16), layers_per_block=1),
            clip_cfg=ClipConfig(weights_path=args.clip_npz,
                                vocab_path=args.vocab,
                                width=64, heads=2, layers=2),
            use_pallas=False,
            consistency=args.consistency,
        )
    else:
        cfg = LTDConfig(
            denoiser_cfg=DenoiserConfig(
                image_size=32, embed_dim=768, n_layers=12, noise_embed_dims=256),
            denoiser_load=DenoiserLoad(local_filename=args.weights),
            vae_cfg=VaeConfig(weights_path=args.vae_npz),
            clip_cfg=ClipConfig(weights_path=args.clip_npz,
                                vocab_path=args.vocab),
            consistency=args.consistency,
        )

    if args.init_image is None and (args.mask is not None
                                    or args.strength is not None):
        ap.error("--mask/--strength require --init-image")

    dt = DiffusionTransformer(cfg)
    if args.init_image is not None:
        import PIL.Image

        src = PIL.Image.open(args.init_image).convert("RGB")
        if args.mask is not None:
            mask = PIL.Image.open(args.mask).convert("L")
            img = dt.inpaint(
                src, mask, args.prompt,
                strength=args.strength if args.strength is not None else 1.0,
                class_guidance=args.class_guidance, seed=args.seed,
                num_imgs=args.num_imgs, n_iter=args.n_iter,
                negative_prompt=args.negative_prompt)
        else:
            img = dt.image_to_image(
                src, args.prompt,
                strength=args.strength if args.strength is not None else 0.5,
                class_guidance=args.class_guidance, seed=args.seed,
                num_imgs=args.num_imgs, n_iter=args.n_iter,
                negative_prompt=args.negative_prompt)
    elif args.interpolate_to is not None:
        img = dt.interpolate(
            args.prompt, args.interpolate_to,
            n_frames=max(args.num_imgs, 2), class_guidance=args.class_guidance,
            seed=args.seed, n_iter=args.n_iter,
            negative_prompt=args.negative_prompt)
    else:
        solver_kw = {}
        if args.sampler is not None:
            solver_kw["sampler"] = args.sampler
        if args.schedule != "poly":
            solver_kw["schedule"] = args.schedule
        if args.eta:
            solver_kw["eta"] = args.eta
        if args.cfg_rescale:
            solver_kw["cfg_rescale"] = args.cfg_rescale
        if args.schedule_shift is not None:
            solver_kw["schedule_shift"] = args.schedule_shift
        img = dt.generate_image_from_text(
            prompt=args.prompt, class_guidance=args.class_guidance,
            seed=args.seed, num_imgs=args.num_imgs, n_iter=args.n_iter,
            negative_prompt=args.negative_prompt, **solver_kw)
    img.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
