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


def test_train_tpu_golden_committed():
    """The TPU train-grad reproducibility baseline (train audit leg 3)
    must be present and well-formed — its absence silently skips the
    tripwire."""
    from transformer_latent_diffusion_tpu.utils.goldens import (
        TRAIN_TPU_GOLDEN_PATH,
        load_train_golden,
    )

    gold = load_train_golden(TRAIN_TPU_GOLDEN_PATH)
    assert gold.ndim == 2 and gold.shape[1] == 2
    assert np.isfinite(gold).all()
    assert (gold[:, 0] > 0).all()  # every leaf received gradient


def test_train_grad_golden_reproducible():
    """Training-grad audit baseline (VERDICT r4 #3): the committed CPU
    f32 fingerprint (tests/goldens/train_grads.npz) regenerates
    bit-close from the fixed spec, and the fingerprint actually
    discriminates — a small perturbation of one leaf's gradient is
    visible at the per-leaf relative scale."""
    import jax.numpy as jnp

    from transformer_latent_diffusion_tpu.utils.goldens import (
        fingerprint_max_rel,
        golden_train_grads,
        grad_fingerprint,
        load_train_golden,
    )

    gold = load_train_golden()
    assert gold.ndim == 2 and gold.shape[1] == 2
    assert np.isfinite(gold).all()
    grads = golden_train_grads(fused=False, dtype=jnp.float32)
    fp = grad_fingerprint(grads)
    d = fingerprint_max_rel(fp, gold)
    assert d < 1e-4, d

    # sensitivity: +1% on a single leaf's gradient must trip the
    # per-leaf measure at ~1% (a global rel-L2 would dilute it)
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(grads)
    leaves = list(leaves)
    leaves[3] = leaves[3] * 1.01
    fp_bad = grad_fingerprint(jax.tree_util.tree_unflatten(treedef, leaves))
    d_bad = fingerprint_max_rel(fp_bad, gold)
    assert d_bad > 5e-3, d_bad
