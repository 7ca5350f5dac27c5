"""Serving micro-batcher tests (beyond-reference capability).

Asserts (a) concurrent heterogeneous requests coalesce into ONE batched
scan call, and (b) every batched result is identical to what the solo
`DiffusionTransformer.generate_image_from_text` path produces for the
same arguments — per-request seeds and per-image CFG vectors must
preserve exact single-request determinism.
"""

import threading

import numpy as np
import PIL.Image

from transformer_latent_diffusion_tpu.sampling import DiffusionTransformer
from transformer_latent_diffusion_tpu.serve.app import GenerationService
from transformer_latent_diffusion_tpu.serve.batcher import MicroBatcher


def _tiny_transformer():
    from tests.test_diffusion import tiny_ltd_config

    return DiffusionTransformer(tiny_ltd_config())


REQS = [
    dict(prompt="a cute cat", class_guidance=6, seed=11, num_imgs=1, n_iter=4),
    dict(prompt="a red car", class_guidance=2.5, seed=3, num_imgs=1, n_iter=4),
    dict(prompt="a blue bird", class_guidance=6, seed=11, num_imgs=4, n_iter=4),
    # negative-prompt request must batch with the zero-uncond ones (the
    # CFG uncond half is a per-image embedding in the batched call)
    dict(prompt="a green tree", class_guidance=6, seed=7, num_imgs=1,
         n_iter=4, negative_prompt="blurry"),
]


def test_microbatcher_coalesces_and_matches_solo():
    tr = _tiny_transformer()

    # solo references first (each its own scan call)
    solo = [np.asarray(tr.generate_image_from_text(**r)) for r in REQS]

    calls = []
    orig_generate = tr.diffuser.generate

    def counting_generate(*a, **kw):
        calls.append(kw.get("num_imgs"))
        return orig_generate(*a, **kw)

    tr.diffuser.generate = counting_generate
    mb = MicroBatcher(tr, max_batch=8, max_wait_ms=300.0)
    try:
        results = [None] * len(REQS)
        errors = []

        def run(i):
            try:
                results[i] = mb.generate(**REQS[i], timeout=300)
            except BaseException as e:  # surface in main thread
                errors.append(e)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(REQS))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
    finally:
        mb.close()
        tr.diffuser.generate = orig_generate

    # 1+1+4+1 images pad to the 8-bucket and run as ONE device call
    assert calls == [8], calls

    for i, (img, ref) in enumerate(zip(results, solo)):
        assert isinstance(img, PIL.Image.Image)
        got = np.asarray(img)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        # same math modulo batched-vs-solo XLA scheduling; uint8 pixels
        # may differ by 1 from float rounding at the boundary
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"req {i}: max pixel diff {diff.max()}"


def test_microbatcher_groups_by_n_iter():
    tr = _tiny_transformer()
    mb = MicroBatcher(tr, max_batch=8, max_wait_ms=300.0)
    try:
        results = {}

        def run(name, **kw):
            results[name] = mb.generate(**kw, timeout=300)

        threads = [
            threading.Thread(target=run, args=("a",),
                             kwargs=dict(prompt="x", n_iter=4, seed=1)),
            threading.Thread(target=run, args=("b",),
                             kwargs=dict(prompt="y", n_iter=5, seed=2)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert isinstance(results["a"], PIL.Image.Image)
        assert isinstance(results["b"], PIL.Image.Image)
    finally:
        mb.close()


def test_service_microbatch_route():
    """GenerationService(microbatch=...) serves concurrent generate_jpeg
    calls through the batcher and still returns valid JPEGs."""
    svc = GenerationService(transformer=_tiny_transformer(), microbatch=4,
                            max_wait_ms=200.0)
    try:
        out = [None, None]

        def run(i, seed):
            out[i] = svc.generate_jpeg(prompt="a cute cat", seed=seed,
                                       n_iter=4)

        ts = [threading.Thread(target=run, args=(i, s))
              for i, s in enumerate((1, 2))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for jpeg in out:
            assert jpeg[:3] == b"\xff\xd8\xff"  # JPEG magic
        assert out[0] != out[1]  # different seeds -> different images
    finally:
        svc.batcher.close()


def test_microbatcher_carry_and_close():
    """A request that doesn't fit the current cycle is carried to the
    next one (not starved or stranded); close() serves pending work and
    rejects late arrivals instead of hanging them."""
    tr = _tiny_transformer()
    mb = MicroBatcher(tr, max_batch=2, max_wait_ms=150.0)
    try:
        results, errors = {}, []

        def run(name, **kw):
            try:
                results[name] = mb.generate(**kw, timeout=300)
            except BaseException as e:
                errors.append((name, e))

        # 1 + 2 + 1 images against max_batch=2: some cycle must carry
        threads = [
            threading.Thread(target=run, args=(n,), kwargs=k) for n, k in [
                ("a", dict(prompt="x", num_imgs=1, n_iter=4, seed=1)),
                ("b", dict(prompt="y", num_imgs=2, n_iter=4, seed=2)),
                ("c", dict(prompt="z", num_imgs=1, n_iter=4, seed=3)),
            ]
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert set(results) == {"a", "b", "c"}
        for img in results.values():
            assert isinstance(img, PIL.Image.Image)
    finally:
        mb.close()

    try:
        mb.generate("late", n_iter=4)
        raise AssertionError("expected RuntimeError after close()")
    except RuntimeError:
        pass


def test_service_oversize_falls_back_to_solo():
    """num_imgs > the batcher's max_batch must take the solo path (not a
    500) when micro-batching is enabled."""
    svc = GenerationService(transformer=_tiny_transformer(), microbatch=2,
                            max_wait_ms=50.0)
    try:
        jpeg = svc.generate_jpeg(prompt="a cute cat", num_imgs=4, n_iter=4)
        assert jpeg[:3] == b"\xff\xd8\xff"
    finally:
        svc.batcher.close()


def test_microbatcher_rejects_bad_num_imgs():
    """num_imgs < 1 must be rejected at the caller (not crash the whole
    batch group it would have joined)."""
    tr = _tiny_transformer()
    mb = MicroBatcher(tr, max_batch=4, max_wait_ms=10.0)
    try:
        for bad in (0, -1, 5):
            try:
                mb.generate("x", num_imgs=bad, n_iter=4, timeout=30)
                raise AssertionError(f"num_imgs={bad} accepted")
            except ValueError:
                pass
    finally:
        mb.close()
