"""Generate the committed golden latents.

Default (CPU exact path -> tests/goldens/flagship_latents.npz): run
once; re-run ONLY if the sampling semantics intentionally change (then
bench history restarts its drift baseline).

    python scripts/make_golden_latents.py

--tpu (bf16 fused engine on the real chip ->
tests/goldens/flagship_latents_tpu.npz): the reproducibility tripwire
baseline bench.py's golden audit leg 3 compares against. Regenerate in
the SAME commit as any deliberate kernel-numerics change.

    python scripts/make_golden_latents.py --tpu
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="regenerate the TPU-engine golden instead of "
                         "the CPU-exact one")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from transformer_latent_diffusion_tpu.utils.goldens import (
        GOLDEN_PATH,
        GOLDEN_SPEC,
        TPU_GOLDEN_PATH,
        golden_flagship_latents,
    )

    if args.tpu:
        assert jax.default_backend() not in ("cpu",), (
            "--tpu needs the real chip: the TPU golden pins the fused "
            "engine's numerics on hardware")
        path = TPU_GOLDEN_PATH
        lat = golden_flagship_latents(use_pallas=True, dtype=jnp.bfloat16)
    else:
        path = GOLDEN_PATH
        lat = golden_flagship_latents(use_pallas=False)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, latents=lat,
                        spec=np.array(sorted(GOLDEN_SPEC.items()), dtype=object))
    print(f"golden latents {lat.shape} std={lat.std():.4f} -> {path}")


if __name__ == "__main__":
    main()
