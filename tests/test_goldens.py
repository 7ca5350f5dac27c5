"""Golden-latent drift guard (VERDICT r3 #3).

The committed golden (tests/goldens/flagship_latents.npz) is what
bench.py audits the TPU fused engine against every round. This test
regenerates it on the CPU exact path and asserts it matches the file,
so the baseline itself stays reproducible — if sampling semantics
change intentionally, regenerate with scripts/make_golden_latents.py
in the same commit.
"""

import numpy as np

from transformer_latent_diffusion_tpu.utils.goldens import (
    GOLDEN_SPEC,
    golden_flagship_latents,
    load_golden,
    rel_l2,
)


def test_tpu_golden_committed():
    """The TPU-engine reproducibility baseline (audit leg 3) can only
    be REGENERATED on hardware, but its shape/sanity is checkable
    anywhere — and its absence would silently skip the tripwire."""
    from transformer_latent_diffusion_tpu.utils.goldens import (
        TPU_GOLDEN_PATH,
    )

    gold = load_golden(TPU_GOLDEN_PATH)
    assert gold.shape == (GOLDEN_SPEC["num_imgs"], 4,
                          GOLDEN_SPEC["img_size"], GOLDEN_SPEC["img_size"])
    assert np.isfinite(gold).all()
    assert gold.std() > 0.01


def test_golden_latents_reproducible():
    gold = load_golden()
    assert gold.shape == (GOLDEN_SPEC["num_imgs"], 4,
                          GOLDEN_SPEC["img_size"], GOLDEN_SPEC["img_size"])
    assert np.isfinite(gold).all()
    lat = golden_flagship_latents(use_pallas=False)
    # identical code + threefry PRNG; tolerance only absorbs XLA CPU
    # fusion-order changes across library versions
    assert rel_l2(lat, gold) < 1e-4, rel_l2(lat, gold)
