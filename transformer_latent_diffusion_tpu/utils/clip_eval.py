"""CLIP-based generation quality metrics: CLIP-FID features + CLIP score.

The reference lists FID as an open TODO (reference README.md "TODOS");
utils/fid.py ships the extractor-agnostic Fréchet metric, and this
module supplies a *real* in-repo extractor for it: the Flax CLIP image
tower (models/clip.ClipVisionModel). CLIP-FID (Fréchet distance on CLIP
image features) is a standard literature metric — unlike the VAE-latent
fallback it is comparable across papers once real ViT-L/14 weights are
converted (scripts/convert_towers.py --clip-vision).

Also ships CLIP score: mean cosine similarity between image and prompt
embeddings × 100 (the standard text-image alignment metric).
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np


def clip_image_features(images, vision, batch_size: int = 32,
                        input_range: str | None = None) -> np.ndarray:
    """Images (PIL list, or uint8/float NHWC array) -> (N, D) CLIP image
    embeddings via FlaxClipVision, batched through one compiled program
    (ragged tail zero-padded to `batch_size` and sliced back).
    `input_range` ("01"/"pm1"/None=auto) declares float scaling — see
    models.clip.preprocess_images; callers chunking [-1,1] decodes
    should pass "pm1" so an all-bright chunk can't auto-detect as
    [0,1]."""
    from transformer_latent_diffusion_tpu.models.clip import preprocess_images

    pixels = preprocess_images(images, vision.module.image_size,
                               input_range=input_range)
    n = pixels.shape[0]
    feats = []
    for i in range(0, n, batch_size):
        batch = pixels[i: i + batch_size]
        m = batch.shape[0]
        if m < batch_size:
            batch = np.concatenate(
                [batch, np.zeros((batch_size - m,) + batch.shape[1:],
                                 np.float32)], axis=0)
        emb = vision.encode_image(batch)[:m]
        feats.append(np.asarray(emb, np.float32))
    return np.concatenate(feats, axis=0)


def clip_score(images, texts: Union[str, Sequence[str]], clip_text,
               vision, batch_size: int = 32) -> float:
    """Mean 100 * cos(image_emb, text_emb) over (image, prompt) pairs.

    `clip_text`: models.clip.FlaxClip (text tower);
    `vision`: models.clip.FlaxClipVision. A single prompt broadcasts to
    every image. `texts` may instead be a precomputed (N, D) array of
    CLIP text embeddings (e.g. a training pipeline's text_emb.npy), in
    which case `clip_text` may be None. Meaningful absolute numbers need
    real converted weights AND the real BPE vocab — with random towers
    it is a relative metric only (same degradation mode as the rest of
    the hermetic test stack).
    """
    img = clip_image_features(images, vision, batch_size=batch_size)
    if isinstance(texts, np.ndarray) and texts.ndim == 2:
        txt = texts.astype(np.float32)
    else:
        if isinstance(texts, str):
            texts = [texts]
        txt = np.asarray(clip_text.encode_text(list(texts)), np.float32)
    if txt.shape[0] == 1 and img.shape[0] > 1:
        txt = np.broadcast_to(txt, (img.shape[0], txt.shape[1]))
    if txt.shape[0] != img.shape[0]:
        raise ValueError(
            f"{img.shape[0]} images vs {txt.shape[0]} prompts")
    img = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    return float(100.0 * np.mean(np.sum(img * txt, axis=-1)))
