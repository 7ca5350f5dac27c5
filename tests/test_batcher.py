"""Serving micro-batcher tests (beyond-reference capability).

Asserts (a) concurrent heterogeneous requests coalesce into ONE batched
scan call, and (b) every batched result is identical to what the solo
`DiffusionTransformer.generate_image_from_text` path produces for the
same arguments — per-request seeds and per-image CFG vectors must
preserve exact single-request determinism.
"""

import io
import threading

import pytest

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


def test_microbatcher_eta_matches_solo():
    """eta-stochastic DDIM requests coalesce like any t2i traffic and
    reproduce their solo results: the batcher builds per-request noise
    keys (fresh_noise_image_keys) so each image's fresh-noise stream
    depends only on its own seed, never on batch composition."""
    tr = _tiny_transformer()
    reqs = [
        dict(prompt="a cute cat", class_guidance=6, seed=11, num_imgs=1,
             n_iter=4, sampler="ddim", eta=0.5),
        dict(prompt="a red car", class_guidance=2.5, seed=3, num_imgs=2,
             n_iter=4, sampler="ddim", eta=0.5),
    ]
    solo = [np.asarray(tr.generate_image_from_text(**r)) for r in reqs]

    calls = []
    orig_generate = tr.diffuser.generate

    def counting_generate(*a, **kw):
        calls.append((kw.get("num_imgs"), kw.get("eta"),
                      kw.get("fresh_noise_keys") is not None))
        return orig_generate(*a, **kw)

    tr.diffuser.generate = counting_generate
    mb = MicroBatcher(tr, max_batch=8, max_wait_ms=300.0)
    try:
        results = [None] * len(reqs)
        errors = []

        def run(i):
            try:
                results[i] = mb.generate(**reqs[i], timeout=300)
            except BaseException as e:
                errors.append(e)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
    finally:
        mb.close()
        tr.diffuser.generate = orig_generate

    # 1+2 images pad to the 4-bucket, ONE call carrying eta + per-image keys
    assert calls == [(4, 0.5, True)], calls
    for i, (img, ref) in enumerate(zip(results, solo)):
        got = np.asarray(img)
        assert got.shape == ref.shape
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"req {i}: max pixel diff {diff.max()}"

    # eta without the ddim sampler is refused at enqueue time
    mb2 = MicroBatcher(tr, max_batch=4, max_wait_ms=10.0)
    try:
        with pytest.raises(ValueError, match="stochastic DDIM"):
            mb2.generate(prompt="x", n_iter=4, eta=0.5, timeout=30)
    finally:
        mb2.close()


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


def test_microbatcher_batches_editing_and_matches_solo():
    """Editing traffic batches (VERDICT r3 #8): concurrent img2img
    requests sharing a strength coalesce into ONE masked-free scan,
    inpainting gets its own (masked) group, and every batched result
    matches the solo pipeline call within the same +-1 uint8 bound as
    text-to-image."""
    import numpy as np

    tr = _tiny_transformer()
    px = 32  # tiny 2-block VAE downsamples by 2 -> 16-latent model
    rng = np.random.default_rng(5)
    img_a = PIL.Image.fromarray(
        rng.integers(0, 255, size=(px, px, 3), dtype=np.uint8))
    img_b = PIL.Image.fromarray(
        rng.integers(0, 255, size=(px, px, 3), dtype=np.uint8))
    mask = np.zeros((px, px), dtype=np.uint8)
    mask[: px // 2] = 255
    mask_img = PIL.Image.fromarray(mask)

    # solo references (each its own scan call; pad_to=None like the
    # batcher, which pads to its own buckets)
    solo = [
        np.asarray(tr.image_to_image(img_a, "an oil painting",
                                     strength=0.5, seed=11, num_imgs=1,
                                     n_iter=4)),
        np.asarray(tr.image_to_image(img_b, "a watercolor", strength=0.5,
                                     class_guidance=2.5, seed=3,
                                     num_imgs=2, n_iter=4)),
        np.asarray(tr.inpaint(img_a, mask_img, "a castle", seed=7,
                              num_imgs=1, n_iter=4)),
        np.asarray(tr.generate_image_from_text("a cute cat", seed=11,
                                               num_imgs=1, n_iter=4)),
    ]

    calls = []
    orig_generate = tr.diffuser.generate

    def counting_generate(*a, **kw):
        calls.append((kw.get("num_imgs"),
                      kw.get("mask") is not None,
                      kw.get("init_latents") is not None))
        return orig_generate(*a, **kw)

    tr.diffuser.generate = counting_generate
    mb = MicroBatcher(tr, max_batch=8, max_wait_ms=400.0)
    try:
        results = [None] * 4
        errors = []

        def run(i, fn):
            try:
                results[i] = fn()
            except BaseException as e:
                errors.append((i, e))

        jobs = [
            lambda: mb.generate("an oil painting", init_image=img_a,
                                strength=0.5, seed=11, num_imgs=1,
                                n_iter=4, timeout=300),
            lambda: mb.generate("a watercolor", init_image=img_b,
                                strength=0.5, class_guidance=2.5, seed=3,
                                num_imgs=2, n_iter=4, timeout=300),
            lambda: mb.generate("a castle", init_image=img_a,
                                mask=mask_img, seed=7, num_imgs=1,
                                n_iter=4, timeout=300),
            lambda: mb.generate("a cute cat", seed=11, num_imgs=1,
                                n_iter=4, timeout=300),
        ]
        threads = [threading.Thread(target=run, args=(i, f))
                   for i, f in enumerate(jobs)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
    finally:
        mb.close()
        tr.diffuser.generate = orig_generate

    # three groups: img2img(strength=0.5) x2 requests coalesced into one
    # 4-bucket call, inpaint solo (masked scan), t2i solo
    assert sorted(calls) == [(1, False, False), (1, True, True),
                             (4, False, True)], calls

    for i, (img, ref) in enumerate(zip(results, solo)):
        got = np.asarray(img)
        assert got.shape == ref.shape, (i, got.shape, ref.shape)
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"req {i}: max pixel diff {diff.max()}"


def test_microbatcher_editing_validation():
    """mask without init_image and strength without init_image are
    caller errors, raised before anything enqueues."""
    import numpy as np

    tr = _tiny_transformer()
    mb = MicroBatcher(tr, max_batch=4, max_wait_ms=10.0)
    try:
        for kw in (dict(mask=np.ones((32, 32))), dict(strength=0.5)):
            try:
                mb.generate("x", n_iter=4, timeout=30, **kw)
                raise AssertionError(f"{kw} accepted")
            except ValueError:
                pass
    finally:
        mb.close()


def test_service_editing_rides_batcher():
    """The HTTP service routes img2img/inpaint through the batcher when
    micro-batching is enabled (contract for VERDICT r3 #8)."""
    import base64

    import numpy as np

    svc = GenerationService(transformer=_tiny_transformer(), microbatch=4,
                            max_wait_ms=50.0)
    try:
        seen = []
        orig = svc.batcher.generate

        def spy(*a, **kw):
            seen.append(kw.get("init_image") is not None)
            return orig(*a, **kw)

        svc.batcher.generate = spy
        px = 32
        rng = np.random.default_rng(0)
        buf = io.BytesIO()
        PIL.Image.fromarray(rng.integers(
            0, 255, size=(px, px, 3), dtype=np.uint8)).save(buf, "PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        jpeg = svc.generate_jpeg(prompt="an oil painting", n_iter=4,
                                 init_image=b64, strength=0.5)
        assert jpeg[:3] == b"\xff\xd8\xff"
        assert seen == [True], seen
    finally:
        svc.batcher.close()


def test_microbatcher_backpressure_queue_full():
    """Bounded queue (VERDICT r4 #4): once queued+in-flight images reach
    max_queue_imgs, generate() sheds load with QueueFull immediately
    instead of queueing; capacity is returned as requests complete."""
    import time

    from transformer_latent_diffusion_tpu.serve.errors import QueueFull

    tr = _tiny_transformer()
    gate = threading.Event()
    orig_generate = tr.diffuser.generate

    def gated_generate(*a, **kw):
        gate.wait(30)
        return orig_generate(*a, **kw)

    tr.diffuser.generate = gated_generate
    mb = MicroBatcher(tr, max_batch=1, max_wait_ms=5.0, max_queue_imgs=2)
    try:
        results, errors = [], []

        def run():
            try:
                results.append(mb.generate("x", n_iter=4, timeout=60))
            except BaseException as e:
                errors.append(e)

        threads = [threading.Thread(target=run) for _ in range(2)]
        for t in threads:
            t.start()
        # wait for both to hold budget (one in flight, one queued)
        for _ in range(200):
            if mb.queue_depth() == 2:
                break
            time.sleep(0.01)
        assert mb.queue_depth() == 2
        with pytest.raises(QueueFull):
            mb.generate("overflow", n_iter=4)
        gate.set()
        for t in threads:
            t.join()
        assert not errors, errors
        assert len(results) == 2
        assert mb.queue_depth() == 0  # budget fully returned
        # capacity is back: a new request succeeds
        assert isinstance(mb.generate("y", n_iter=4, timeout=60),
                          PIL.Image.Image)
        assert mb.queue_depth() == 0
    finally:
        gate.set()
        mb.close()
        tr.diffuser.generate = orig_generate


def test_microbatcher_backpressure_release_on_timeout_and_close():
    """Cancelled (timed-out) and close-drained requests return their
    budget exactly once — the bound must not leak capacity."""
    import time

    tr = _tiny_transformer()
    gate = threading.Event()
    orig_generate = tr.diffuser.generate
    tr.diffuser.generate = lambda *a, **kw: (gate.wait(30),
                                             orig_generate(*a, **kw))[1]
    mb = MicroBatcher(tr, max_batch=2, max_wait_ms=5.0, max_queue_imgs=4)
    try:
        holder = threading.Thread(
            target=lambda: mb.generate("hold", n_iter=4, timeout=60))
        holder.start()
        for _ in range(200):
            if mb.queue_depth() == 1:
                break
            time.sleep(0.01)
        # a queued request that times out releases its budget when the
        # worker reaches (and skips) it
        with pytest.raises(TimeoutError):
            mb.generate("late", n_iter=4, num_imgs=2, timeout=0.05)
        assert mb.queue_depth() == 3  # still held until worker skips it
        gate.set()
        holder.join()
        for _ in range(400):
            if mb.queue_depth() == 0:
                break
            time.sleep(0.01)
        assert mb.queue_depth() == 0
    finally:
        gate.set()
        mb.close()
        tr.diffuser.generate = orig_generate
    assert mb.queue_depth() == 0
