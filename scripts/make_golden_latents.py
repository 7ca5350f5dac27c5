"""Generate the committed goldens (sampling latents + training grads).

Default (CPU exact path -> tests/goldens/flagship_latents.npz): run
once; re-run ONLY if the sampling semantics intentionally change (then
bench history restarts its drift baseline).

    python scripts/make_golden_latents.py

--tpu (bf16 fused engine on the real chip ->
tests/goldens/flagship_latents_tpu.npz): the reproducibility tripwire
baseline bench.py's golden audit leg 3 compares against. Regenerate in
the SAME commit as any deliberate kernel-numerics change.

    python scripts/make_golden_latents.py --tpu

--train (CPU f32 XLA grads fingerprint -> tests/goldens/train_grads.npz)
and --train-tpu (fused bf16 grads fingerprint on the real chip ->
tests/goldens/train_grads_tpu.npz): the training-side audit's goldens
(utils/goldens.audit_train_numerics, VERDICT r4 #3). Same regeneration
discipline as their sampling twins.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="regenerate the TPU-engine sampling golden "
                         "instead of the CPU-exact one")
    ap.add_argument("--train", action="store_true",
                    help="regenerate the CPU f32 training-grads golden")
    ap.add_argument("--train-tpu", action="store_true",
                    help="regenerate the TPU fused training-grads golden")
    args = ap.parse_args()

    import jax

    on_tpu_mode = args.tpu or args.train_tpu
    if not on_tpu_mode:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from transformer_latent_diffusion_tpu.utils.goldens import (
        GOLDEN_PATH,
        GOLDEN_SPEC,
        TPU_GOLDEN_PATH,
        TRAIN_GOLDEN_PATH,
        TRAIN_GOLDEN_SPEC,
        TRAIN_TPU_GOLDEN_PATH,
        golden_flagship_latents,
        golden_train_grads,
        grad_fingerprint,
    )

    if on_tpu_mode:
        assert jax.default_backend() not in ("cpu",), (
            "--tpu/--train-tpu need the real chip: these goldens pin "
            "the fused kernels' numerics on hardware")

    if args.train or args.train_tpu:
        path = TRAIN_TPU_GOLDEN_PATH if args.train_tpu else TRAIN_GOLDEN_PATH
        grads = golden_train_grads(
            fused=args.train_tpu,
            dtype=jnp.bfloat16 if args.train_tpu else jnp.float32)
        fp = grad_fingerprint(grads)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(
            path, fingerprint=fp,
            spec=np.array(sorted(TRAIN_GOLDEN_SPEC.items()), dtype=object))
        print(f"train-grad fingerprint {fp.shape} "
              f"norm[0]={fp[0, 0]:.5g} -> {path}")
        return

    if args.tpu:
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
