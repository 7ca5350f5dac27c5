"""Data-pipeline encode throughput on the real TPU.

Times the hot loop of data/pipeline.get_text_and_latent_embeddings_hdf5:
VAE encode of 256px images (x*2-1, encode, sample) + CLIP text encode,
at the pipeline's default batch size. The reference runs this stage on
GPU via diffusers/CLIP (data.py:70-109); here both towers are our Flax
ports.

Usage: python scripts/bench_data_encode.py [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    b = args.batch

    from transformer_latent_diffusion_tpu.data.pipeline import (
        encode_image,
        encode_text,
    )
    from transformer_latent_diffusion_tpu.models.clip import FlaxClip
    from transformer_latent_diffusion_tpu.models.vae import FlaxVae

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"backend={jax.default_backend()} batch={b}", flush=True)
    vae = FlaxVae.create(dtype=dtype)
    clip_model = FlaxClip.create()

    rng = np.random.default_rng(0)
    # uint8, like the tar-shard reader yields (4x less upload than f32)
    imgs = rng.integers(0, 256, size=(b, 3, 256, 256), dtype=np.uint8)
    texts = [f"a photo of object number {i}" for i in range(b)]

    t0 = time.time()
    lat = encode_image(jnp.asarray(imgs), vae)
    txt = encode_text(texts, clip_model)
    print(f"compile+first: {time.time() - t0:.1f}s "
          f"lat={lat.shape} txt={txt.shape}", flush=True)

    t0 = time.time()
    for _ in range(args.reps):
        lat = encode_image(jnp.asarray(imgs), vae)
        txt = encode_text(texts, clip_model)
    dt = (time.time() - t0) / args.reps
    print(f"encode: {b / dt:.1f} imgs/s ({dt * 1e3:.0f} ms/batch-{b}, "
          f"VAE 256px + CLIP text)", flush=True)


if __name__ == "__main__":
    main()
