"""Export a trained Flax denoiser checkpoint to a reference-layout torch
state_dict, so TPU-trained weights deploy on the reference stack
(reference load path: diffusion.py:148-153).

    python scripts/export_torch.py --in ckpt.npz --out state_dict.pth
    python scripts/export_torch.py --in checkpoints/run1 --out sd.pth  # orbax

Input: a .npz param tree (train/checkpoint.save_npz), or an orbax
checkpoint dir (exports the EMA weights, matching what the reference
checkpoints). Output: .pth via torch.save, .safetensors via the
pure-numpy writer (torch-free, HF-ecosystem loadable — and our own
load_denoiser_params round-trips it), or .npz of the flat torch-layout
dict (torch-free).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transformer_latent_diffusion_tpu.configs import DenoiserConfig  # noqa: E402
from transformer_latent_diffusion_tpu.models.torch_compat import (  # noqa: E402
    export_torch_denoiser_state_dict,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True,
                    help=".npz param tree or orbax checkpoint dir")
    ap.add_argument("--out", required=True, help=".pth or .npz output")
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--embed-dim", type=int, default=768)
    ap.add_argument("--n-layers", type=int, default=12)
    ap.add_argument("--noise-embed-dims", type=int, default=256)
    args = ap.parse_args()

    cfg = DenoiserConfig(
        image_size=args.image_size, embed_dim=args.embed_dim,
        n_layers=args.n_layers, noise_embed_dims=args.noise_embed_dims)

    if os.path.isdir(args.inp):
        from transformer_latent_diffusion_tpu.train.checkpoint import (
            CheckpointManager,
        )

        state = CheckpointManager(args.inp).restore()
        if state is None:
            raise SystemExit(f"no checkpoint found under {args.inp}")
        params = state.get("ema_params") or state["params"]
    else:
        from transformer_latent_diffusion_tpu.train.checkpoint import (
            unflatten_npz,
        )

        params = unflatten_npz(args.inp)
        # full train-state npz -> prefer the EMA weights like the
        # reference; fall back to raw params (EMA-less states)
        if "ema_params" in params:
            params = params["ema_params"]
        elif "params" in params:
            params = params["params"]

    sd = export_torch_denoiser_state_dict(params, cfg)
    if args.out.endswith(".npz"):
        import numpy as np

        np.savez(args.out, **sd)
    elif args.out.endswith(".safetensors"):
        from transformer_latent_diffusion_tpu.models.torch_compat import (
            write_safetensors,
        )

        write_safetensors(sd, args.out,
                          metadata={"format": "pt"})
    else:
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
