"""Data preparation example (mirrors the reference README's data flow):
(url, caption) parquet -> downloaded shards -> VAE latents + CLIP
embeddings -> HDF5 -> .npy for training.

    python examples/prepare_data.py --parquet grit.parquet --first-n 100000
"""

import argparse
import os
import sys

# allow running from a source checkout without pip install
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parquet", required=True)
    ap.add_argument("--latent-dir", default="latents_folder")
    ap.add_argument("--raw-dir", default="raw_imgs_folder")
    ap.add_argument("--first-n", type=int, default=1000000)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--no-download", action="store_true",
                    help="use pre-downloaded .tar shards in --raw-dir")
    args = ap.parse_args()

    import jax

    from transformer_latent_diffusion_tpu.configs import DataDownloadConfig
    from transformer_latent_diffusion_tpu.data import hdf5_to_npy, main as data_main

    data_main(DataDownloadConfig(
        data_link=args.parquet,
        latent_save_path=args.latent_dir,
        raw_imgs_save_path=args.raw_dir,
        first_n_rows=args.first_n,
        image_size=args.image_size,
        batch_size=args.batch_size,
        download_data=not args.no_download,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    ))
    lp, tp = hdf5_to_npy(
        args.latent_dir,
        out_latents=os.path.join(args.latent_dir, "latents.npy"),
        out_text=os.path.join(args.latent_dir, "text_emb.npy"))
    print(f"wrote {lp} and {tp}")


if __name__ == "__main__":
    main()
