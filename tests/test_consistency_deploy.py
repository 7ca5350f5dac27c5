"""Consistency-distilled model DEPLOYMENT (round 5).

train/distill.py produces few-step students (and the guidance-1 +
label-dropout recipe measures at/below the teacher — DESIGN few-step
table), but until round 5 a student could only be sampled via a raw
DiffusionGenerator. `LTDConfig.consistency=True` wires it through the
whole serving surface: DiffusionTransformer (fresh-noise multistep
sampling, fused engine's prepare protocol preserved), the HTTP service
(with 422s for the knobs that don't apply) and the micro-batcher.
"""

import json
import os
import threading

import jax
import numpy as np
import PIL.Image
import pytest

from transformer_latent_diffusion_tpu.sampling import (
    DiffusionGenerator,
    DiffusionTransformer,
)
from transformer_latent_diffusion_tpu.train import consistency_apply


def _tiny_consistency_cfg():
    from tests.test_diffusion import tiny_ltd_config

    cfg = tiny_ltd_config()
    cfg.consistency = True
    return cfg


@pytest.fixture(scope="module")
def tr():
    return DiffusionTransformer(_tiny_consistency_cfg())


def test_pipeline_matches_raw_generator(tr):
    """The deployed path samples EXACTLY like the hand-built
    DiffusionGenerator(fast_apply=consistency_apply(model)) recipe the
    distillation docs describe."""
    img = tr.generate_image_from_text("a cute cat", num_imgs=4, seed=7,
                                      n_iter=2)
    assert isinstance(img, PIL.Image.Image)
    # deterministic per seed
    img2 = tr.generate_image_from_text("a cute cat", num_imgs=4, seed=7,
                                       n_iter=2)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))

    raw = DiffusionGenerator(
        model=tr.diffuser.model, params=tr.diffuser.params, vae=tr.vae,
        fast_apply=consistency_apply(tr.diffuser.model),
        noise_on_host=True)
    labels = tr.clip_model.encode_text(["a cute cat"] * 4)
    out, _ = raw.generate(
        labels=labels, num_imgs=4, img_size=tr.diffuser.model.image_size,
        class_guidance=6, seed=7, n_iter=2, exponent=1,
        scale_factor=tr._scale_factor, sharp_f=0, bright_f=0,
        output="uint8", fresh_noise=True, use_ddpm_plus=False)
    arr = tr.generate_array_from_text("a cute cat", num_imgs=4, seed=7,
                                      n_iter=2)
    np.testing.assert_array_equal(arr, np.asarray(out))

    # sampler-side CFG values change the output (the guidance-1 recipe)
    g1 = tr.generate_array_from_text("x", num_imgs=1, seed=3, n_iter=2,
                                     class_guidance=1.0)
    g3 = tr.generate_array_from_text("x", num_imgs=1, seed=3, n_iter=2,
                                     class_guidance=3.0)
    assert np.abs(g1.astype(int) - g3.astype(int)).max() > 0


def test_rejects_non_t2i_features(tr):
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="consistency"):
        tr.image_to_image(im, "x", n_iter=2)
    with pytest.raises(ValueError, match="consistency"):
        tr.inpaint(im, np.ones((32, 32), np.uint8) * 255, "x", n_iter=2)
    with pytest.raises(ValueError, match="consistency"):
        tr.interpolate("a", "b", n_frames=2, n_iter=2)
    with pytest.raises(ValueError, match="consistency"):
        tr.generate_image_from_text("x", n_iter=2, sampler="heun")
    with pytest.raises(ValueError, match="consistency"):
        tr.generate_image_from_text("x", n_iter=2, schedule="karras")
    with pytest.raises(ValueError, match="consistency"):
        tr.generate_image_from_text("x", n_iter=2, cache_interval=2)
    with pytest.raises(ValueError, match="consistency"):
        tr.generate_image_from_text("x", n_iter=2, eta=0.5)
    with pytest.raises(ValueError, match="consistency"):
        tr.generate_image_from_text("x", n_iter=2, schedule_shift=2.0)


def test_best_of_rides_consistency(tr):
    arr = tr.generate_best_of("a cute cat", n_candidates=2, top_k=1,
                              n_iter=2, seed=5)
    assert arr.shape[0] == 1 and arr.dtype == np.uint8


def test_http_service_contract(tr):
    from tests.test_api import WsgiClient
    from transformer_latent_diffusion_tpu.serve.app import (
        GenerationService,
        create_wsgi_app,
    )

    os.environ.setdefault("API_TOKEN", "test-token")
    svc = GenerationService(transformer=tr)
    cl = WsgiClient(create_wsgi_app(service=svc))
    auth = {"Authorization": f"Bearer {os.environ['API_TOKEN']}"}

    r = cl.post_json("/generate-image/",
                     {"prompt": "a cute cat", "n_iter": 4}, headers=auth)
    assert r["status"] == 200, r
    assert r["body"][:3] == b"\xff\xd8\xff"

    for bad in ({"sampler": "dpm"}, {"schedule": "karras"},
                {"cache_interval": 2}, {"init_image": "aGk="},
                {"interpolate_to": "y"}, {"seed_b": 3},
                {"sampler": "ddim", "eta": 0.5}):
        r = cl.post_json("/generate-image/",
                         {"prompt": "x", "n_iter": 4, **bad},
                         headers=auth)
        assert r["status"] == 422, (bad, r)
        assert "consistency" in json.loads(r["body"])["detail"]


def test_batcher_coalesces_and_matches_solo(tr):
    from transformer_latent_diffusion_tpu.serve.batcher import MicroBatcher

    reqs = [dict(prompt="a cute cat", seed=11, num_imgs=1, n_iter=2),
            dict(prompt="a red car", seed=3, num_imgs=2, n_iter=2,
                 class_guidance=2.5)]
    solo = [np.asarray(tr.generate_image_from_text(**r)) for r in reqs]

    calls = []
    orig = tr.diffuser.generate

    def counting(*a, **kw):
        calls.append((kw.get("num_imgs"), kw.get("fresh_noise")))
        return orig(*a, **kw)

    tr.diffuser.generate = counting
    mb = MicroBatcher(tr, max_batch=4, max_wait_ms=300.0)
    try:
        results = [None] * len(reqs)
        errs = []

        def run(i):
            try:
                results[i] = mb.generate(**reqs[i], timeout=300)
            except BaseException as e:
                errs.append(e)

        ts = [threading.Thread(target=run, args=(i,))
              for i in range(len(reqs))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        with pytest.raises(ValueError, match="consistency"):
            mb.generate("x", n_iter=2, sampler="dpm")
    finally:
        mb.close()
        tr.diffuser.generate = orig
    # 1 + 2 images pad to the 4-bucket, ONE fresh-noise scan
    assert calls == [(4, True)], calls
    for got, ref in zip(results, solo):
        d = np.abs(np.asarray(got).astype(int) - ref.astype(int))
        assert d.max() <= 1, d.max()


def test_config_json_roundtrip():
    from transformer_latent_diffusion_tpu.configs import (
        config_to_json,
        ltd_config_from_json,
    )

    cfg = _tiny_consistency_cfg()
    back = ltd_config_from_json(json.loads(config_to_json(cfg)))
    assert back.consistency is True


def test_lora_composes_with_consistency(tr):
    """load_lora on a consistency deployment: the merged params flow
    through the consistency wrapper (both act on diffuser.params), so
    adapter swap/restore works unchanged."""
    from transformer_latent_diffusion_tpu.train.lora import (
        init_lora_params,
    )

    base = tr.generate_array_from_text("a cute cat", num_imgs=1, seed=9,
                                       n_iter=2)
    lora = init_lora_params(tr.diffuser.params, rank=2)
    # non-zero B so the merge actually changes the function
    lora = jax.tree.map(lambda a: a + 0.05, lora)
    tr.load_lora(lora)
    adapted = tr.generate_array_from_text("a cute cat", num_imgs=1,
                                          seed=9, n_iter=2)
    assert np.abs(adapted.astype(int) - base.astype(int)).max() > 0
    tr.load_lora(lora, scale=0.0)  # restore
    back = tr.generate_array_from_text("a cute cat", num_imgs=1, seed=9,
                                       n_iter=2)
    np.testing.assert_array_equal(back, base)
