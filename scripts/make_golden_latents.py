"""Generate the committed golden latents (tests/goldens/flagship_latents.npz)
on the CPU exact path. Run once; re-run ONLY if the sampling semantics
intentionally change (then bench history restarts its drift baseline).

    python scripts/make_golden_latents.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from transformer_latent_diffusion_tpu.utils.goldens import (  # noqa: E402
    GOLDEN_PATH,
    GOLDEN_SPEC,
    golden_flagship_latents,
)


def main():
    lat = golden_flagship_latents(use_pallas=False)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, latents=lat,
                        spec=np.array(sorted(GOLDEN_SPEC.items()), dtype=object))
    print(f"golden latents {lat.shape} std={lat.std():.4f} -> {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
