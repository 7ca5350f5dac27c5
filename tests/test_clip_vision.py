"""CLIP image tower: converter oracles, preprocessing, CLIP-FID/score.

The reference uses only CLIP's text side; the vision tower exists here
to give FID a literature-comparable in-repo extractor (CLIP-FID) and to
ship CLIP score (reference README "TODOS": FID). Oracle-tested against
transformers' CLIPModel the same way the text converter is."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_latent_diffusion_tpu.models.clip import (
    ClipVisionModel,
    FlaxClip,
    FlaxClipVision,
    preprocess_images,
)


def test_hf_clip_vision_converter_matches_transformers(tmp_path):
    """convert_hf_clip_vision_state_dict + npz round-trip: our Flax
    image tower must reproduce transformers' CLIPModel.get_image_features
    on a tiny random model."""
    transformers = pytest.importorskip("transformers")
    import torch as _torch

    tcfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=49408, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=2,
            max_position_embeddings=77, hidden_act="quick_gelu"),
        vision_config=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
            hidden_act="quick_gelu"),
        projection_dim=16,
    )
    _torch.manual_seed(0)
    tm = transformers.CLIPModel(tcfg).eval()

    from transformer_latent_diffusion_tpu.models.torch_compat import (
        convert_hf_clip_vision_state_dict,
        load_clip_vision_params,
    )
    from transformer_latent_diffusion_tpu.train.checkpoint import save_npz

    params = convert_hf_clip_vision_state_dict(tm.state_dict(), layers=2)
    path = str(tmp_path / "clip_vision.npz")
    save_npz(path, params)
    reloaded = load_clip_vision_params(path, layers=2)

    rng = np.random.default_rng(0)
    # CLIP-normalized pixel range
    pixels = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)

    module = ClipVisionModel(image_size=32, patch_size=8, width=64,
                             heads=2, layers=2, embed_dim=16)
    got = np.asarray(module.apply({"params": reloaded},
                                  jnp.asarray(pixels)))
    with _torch.no_grad():
        want = tm.get_image_features(
            pixel_values=_torch.tensor(
                pixels.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_hf_vision_converter_requires_projection():
    """A bare CLIPVisionModel state_dict (no visual_projection) must be
    rejected with a pointer at the full CLIPModel."""
    from transformer_latent_diffusion_tpu.models.torch_compat import (
        convert_hf_clip_vision_state_dict,
    )

    with pytest.raises(KeyError, match="visual_projection"):
        convert_hf_clip_vision_state_dict(
            {"vision_model.embeddings.class_embedding": np.zeros(4)},
            layers=0)


def test_openai_layout_vision_converter_roundtrip():
    """Synthesize an openai-layout (`visual.*`) state_dict from a flax
    tree via the inverse layout transforms; the converter must
    reconstruct the original tree exactly (catches transpose slips)."""
    from transformer_latent_diffusion_tpu.models.torch_compat import (
        convert_torch_clip_vision_state_dict,
    )

    vt = FlaxClipVision.create(image_size=32, patch_size=8, width=64,
                               heads=2, layers=2, embed_dim=16, seed=3)
    p = jax.tree.map(lambda x: np.asarray(x, np.float32), vt.params)

    sd = {
        "visual.class_embedding": p["class_embedding"],
        "visual.positional_embedding": p["positional_embedding"],
        # flax HWIO -> torch OIHW
        "visual.conv1.weight": p["conv1"]["kernel"].transpose(3, 2, 0, 1),
        "visual.ln_pre.weight": p["ln_pre"]["scale"],
        "visual.ln_pre.bias": p["ln_pre"]["bias"],
        "visual.ln_post.weight": p["ln_post"]["scale"],
        "visual.ln_post.bias": p["ln_post"]["bias"],
        "visual.proj": p["proj"],
    }
    for i in range(2):
        b = p[f"resblock_{i}"]
        base = f"visual.transformer.resblocks.{i}"
        sd[f"{base}.ln_1.weight"] = b["ln_1"]["scale"]
        sd[f"{base}.ln_1.bias"] = b["ln_1"]["bias"]
        sd[f"{base}.attn.in_proj_weight"] = b["attn_in_proj"]["kernel"].T
        sd[f"{base}.attn.in_proj_bias"] = b["attn_in_proj"]["bias"]
        sd[f"{base}.attn.out_proj.weight"] = b["attn_out_proj"]["kernel"].T
        sd[f"{base}.attn.out_proj.bias"] = b["attn_out_proj"]["bias"]
        sd[f"{base}.ln_2.weight"] = b["ln_2"]["scale"]
        sd[f"{base}.ln_2.bias"] = b["ln_2"]["bias"]
        sd[f"{base}.mlp.c_fc.weight"] = b["mlp_c_fc"]["kernel"].T
        sd[f"{base}.mlp.c_fc.bias"] = b["mlp_c_fc"]["bias"]
        sd[f"{base}.mlp.c_proj.weight"] = b["mlp_c_proj"]["kernel"].T
        sd[f"{base}.mlp.c_proj.bias"] = b["mlp_c_proj"]["bias"]

    out = convert_torch_clip_vision_state_dict(sd, layers=2)
    assert jax.tree.structure(out) == jax.tree.structure(p)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(out)):
        np.testing.assert_array_equal(a, b)


def test_preprocess_images_shapes_and_range():
    rng = np.random.default_rng(0)
    # non-square uint8: shorter side resized, center-cropped
    imgs = rng.integers(0, 255, (2, 64, 48, 3), dtype=np.uint8)
    out = preprocess_images(imgs, image_size=32)
    assert out.shape == (2, 32, 32, 3) and out.dtype == np.float32
    # CLIP normalization: a mid-gray image maps near zero
    gray = np.full((1, 32, 32, 3), 118, np.uint8)
    g = preprocess_images(gray, image_size=32)
    assert np.all(np.abs(g) < 0.35)
    # float [0,1] input accepted unscaled
    f = preprocess_images(np.ones((1, 32, 32, 3), np.float32), image_size=32)
    assert np.all(f > 1.5)  # (1 - mean)/std ~ 1.9-2.2

    PIL = pytest.importorskip("PIL.Image")
    pil = PIL.fromarray(imgs[0])
    out_pil = preprocess_images([pil], image_size=32)
    assert out_pil.shape == (1, 32, 32, 3)

    # float [-1,1] (the VAE's native range) rescales to [0,1] instead of
    # being clipped at 0 (ADVICE r3): identical features either way
    x01 = rng.random((2, 32, 32, 3)).astype(np.float32)
    a = preprocess_images(x01, image_size=32)
    b = preprocess_images(x01 * 2.0 - 1.0, image_size=32)
    np.testing.assert_allclose(a, b, atol=1e-5)

    # explicit input_range: an all-bright [-1,1] frame (every pixel
    # >= 0) is indistinguishable from [0,1] to the auto-detector —
    # declaring "pm1" rescales it anyway
    bright01 = 0.5 + 0.5 * rng.random((1, 32, 32, 3)).astype(np.float32)
    auto = preprocess_images(bright01 * 2.0 - 1.0, image_size=32)
    pm1 = preprocess_images(bright01 * 2.0 - 1.0, image_size=32,
                            input_range="pm1")
    want = preprocess_images(bright01, image_size=32, input_range="01")
    np.testing.assert_allclose(pm1, want, atol=1e-5)
    assert np.abs(auto - want).max() > 0.1  # the ambiguity is real
    with pytest.raises(ValueError):
        preprocess_images(x01, image_size=32, input_range="0-255")

    # an explicit declaration beats the /255 magnitude heuristic
    # (ADVICE r4): an unclamped VAE decode overshooting [-1,1] (here a
    # pixel at 1.7) must NOT be divided by 255 when declared pm1
    over = bright01 * 2.0 - 1.0
    over[0, 0, 0, 0] = 1.7
    pm1_over = preprocess_images(over, image_size=32, input_range="pm1")
    want_over = preprocess_images(np.clip((over + 1) / 2, 0, 1),
                                  image_size=32, input_range="01")
    np.testing.assert_allclose(pm1_over, want_over, atol=1e-5)
    # ... and grossly violated declarations fail loudly (0-255 floats)
    with pytest.raises(ValueError, match="declared"):
        preprocess_images(imgs.astype(np.float32), image_size=32,
                          input_range="pm1")


def test_clip_image_features_ragged_batches():
    from transformer_latent_diffusion_tpu.utils.clip_eval import (
        clip_image_features,
    )

    vt = FlaxClipVision.create(image_size=32, patch_size=8, width=64,
                               heads=2, layers=1, embed_dim=16)
    imgs = np.random.default_rng(1).integers(
        0, 255, (5, 32, 32, 3), dtype=np.uint8)
    feats = clip_image_features(imgs, vt, batch_size=2)
    assert feats.shape == (5, 16)
    # padding must not leak into the ragged tail
    solo = clip_image_features(imgs[4:5], vt, batch_size=2)
    np.testing.assert_allclose(feats[4], solo[0], atol=1e-5)


def test_clip_fid_and_score():
    from transformer_latent_diffusion_tpu.utils.clip_eval import (
        clip_image_features,
        clip_score,
    )
    from transformer_latent_diffusion_tpu.utils.fid import compute_fid

    vt = FlaxClipVision.create(image_size=32, patch_size=8, width=64,
                               heads=2, layers=1, embed_dim=16)
    tt = FlaxClip.create(width=32, heads=2, layers=1, embed_dim=16)

    rng = np.random.default_rng(2)
    a = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)

    fa = clip_image_features(a, vt, batch_size=4)
    same = compute_fid(fa, clip_image_features(a, vt, batch_size=4))
    diff = compute_fid(fa, clip_image_features(b, vt, batch_size=4))
    assert same < 1e-6 and diff > same

    s = clip_score(a, "a cute cat", tt, vt, batch_size=4)
    assert np.isfinite(s) and -100.0 <= s <= 100.0
    # per-image prompts must match counts
    with pytest.raises(ValueError, match="images vs"):
        clip_score(a, ["one", "two"], tt, vt)
