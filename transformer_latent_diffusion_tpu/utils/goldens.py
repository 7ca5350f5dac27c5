"""Golden-latent numerics guard (VERDICT r3 #3).

A fixed-seed flagship sampling run whose final latents are committed to
the repo (tests/goldens/flagship_latents.npz, generated on the CPU
exact path by scripts/make_golden_latents.py). Two consumers:

- bench.py runs the SAME spec through the TPU fused Pallas engine every
  round and emits ``golden_rel_l2`` next to the speed fields, asserting
  it under the 1e-2 parity budget (BASELINE.md / SURVEY §6) — a kernel
  regression that drifts latents but not latency now fails the bench
  instead of shipping green.
- tests/test_goldens.py regenerates the latents on CPU and asserts they
  match the committed file, so the golden itself stays reproducible.

The spec is deliberately small (4 images, 8 DDIM steps, no VAE): the
fused engine kernels are batch-shape-specialized, so the check costs
one extra small-batch kernel compile the first time and pennies after;
on CPU the whole run is ~1-2 min single-core.
"""

import os

import numpy as np

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "goldens", "flagship_latents.npz")

# flagship 101M denoiser (reference README.md:161,192)
GOLDEN_DENOISER = dict(
    image_size=32, noise_embed_dims=256, patch_size=2, embed_dim=768,
    dropout=0, n_layers=12, text_emb_size=768,
)
GOLDEN_SPEC = dict(num_imgs=4, n_iter=8, class_guidance=6.0, seed=11,
                   img_size=32, label_seed=0)


def golden_flagship_latents(use_pallas: bool = False, dtype=None,
                            quantize=None):
    """Run the golden sampling spec and return the final x0 latents as
    float32 numpy (num_imgs, 4, 32, 32).

    use_pallas=False + dtype f32 is the exact reference path (what the
    committed golden was generated with, on CPU); use_pallas=True +
    bf16 is the TPU fused-engine path bench.py audits against it.
    """
    import jax
    import jax.numpy as jnp

    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    if dtype is None:
        dtype = jnp.float32
    cfg = DenoiserConfig(**GOLDEN_DENOISER)
    model = Denoiser(**cfg.__dict__, dtype=dtype)
    # init is a pure threefry function of the seed — bit-identical on
    # every backend, so bench.py can reconstruct the exact params the
    # golden was generated from without shipping 400MB of weights
    params = init_denoiser_params(model, cfg)
    fast_apply = None
    if use_pallas:
        from transformer_latent_diffusion_tpu.models.fast_denoiser import (
            make_fused_apply,
        )

        fast_apply = make_fused_apply(cfg, compute_dtype=dtype,
                                      quantize=quantize)
    gen = DiffusionGenerator(model=model, params=params, vae=None,
                             model_dtype=dtype, fast_apply=fast_apply)
    labels = jax.random.normal(
        jax.random.PRNGKey(GOLDEN_SPEC["label_seed"]),
        (GOLDEN_SPEC["num_imgs"], cfg.text_emb_size))
    _, lat = gen.generate(
        labels=labels, n_iter=GOLDEN_SPEC["n_iter"],
        num_imgs=GOLDEN_SPEC["num_imgs"],
        class_guidance=GOLDEN_SPEC["class_guidance"],
        seed=GOLDEN_SPEC["seed"], img_size=GOLDEN_SPEC["img_size"],
        sharp_f=0.0, bright_f=0.0, use_ddpm_plus=False,
    )
    return np.asarray(jax.device_get(lat), np.float32)


def load_golden():
    with np.load(GOLDEN_PATH) as z:
        return z["latents"]


def rel_l2(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))
