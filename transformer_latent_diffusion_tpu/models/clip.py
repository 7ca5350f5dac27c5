"""Flax CLIP text tower (ViT-L/14 text transformer) + BPE tokenizer.

The reference uses the frozen openai/CLIP "ViT-L/14" text encoder as an
external tower (`clip.tokenize` + `model.encode_text`,
/root/reference/tld/diffusion.py:136-140, data.py:29-32, configured at
configs.py:45-48). This module is a from-scratch Flax implementation of
that text transformer: token embedding + positional embedding, 12 pre-LN
causal blocks (width 768, 12 heads, QuickGELU), final LayerNorm, and the
pooled output taken at the EOT token position projected by
`text_projection` — the 768-d embedding the denoiser conditions on.

Weights convert from an openai CLIP / HF checkpoint via
`models/torch_compat.py`; with no checkpoint available the tower
random-initializes (tests run this way, like the reference runs untrained
denoisers).

Tokenizer: the real CLIP BPE when a vocab file is available
(ClipConfig.vocab_path), otherwise a deterministic hash fallback that
keeps the full pipeline runnable hermetically.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77
SOT_TOKEN = 49406
EOT_TOKEN = 49407


def _quick_gelu(x):
    # openai CLIP activation
    return x * jax.nn.sigmoid(1.702 * x)


class ClipTextBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        b, n, d = h.shape
        dh = d // self.heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="attn_in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.heads, dh).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(dh)
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="attn_out_proj")(attn)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="mlp_c_fc")(h)
        h = _quick_gelu(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class ClipTextModel(nn.Module):
    """Causal text transformer with EOT pooling + projection."""

    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    width: int = 768
    heads: int = 12
    layers: int = 12
    embed_dim: int = 768  # projected output dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens (B, 77) int32 -> pooled text embedding (B, embed_dim)."""
        b, n = tokens.shape
        tok_emb = nn.Embed(self.vocab_size, self.width,
                           name="token_embedding")(tokens)
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width),
        )
        x = tok_emb + pos_emb[None, :n, :].astype(tok_emb.dtype)

        causal = jnp.tril(jnp.ones((n, n), dtype=bool))[None, None]
        for i in range(self.layers):
            x = ClipTextBlock(self.width, self.heads, dtype=self.dtype,
                              name=f"resblock_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)

        # pooled output at the EOT position (highest token id), then project
        eot_pos = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eot_pos]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ proj.astype(pooled.dtype)


class ClipVisionModel(nn.Module):
    """CLIP ViT image tower (defaults = ViT-L/14 visual transformer).

    The reference uses only CLIP's *text* side (its FID/CLIP-score evals
    are listed as open TODOs, reference README.md "TODOS"). This tower
    completes the pair: patchify conv (stride=patch, no bias), class
    token, learned pos-embed, ln_pre, the same pre-LN QuickGELU blocks
    as the text transformer (non-causal), ln_post on the class token,
    and a (width, embed_dim) projection — the openai `visual` graph.
    Enables CLIP-FID / CLIP-score (utils/clip_eval.py) with weights
    converted by models/torch_compat.py (openai or HF layout).
    """

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    heads: int = 16
    layers: int = 24
    embed_dim: int = 768  # projected output dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        """pixels (B, S, S, 3) CLIP-normalized -> image embedding (B, embed_dim)."""
        b = pixels.shape[0]
        p = self.patch_size
        x = nn.Conv(self.width, (p, p), strides=(p, p), use_bias=False,
                    dtype=self.dtype, name="conv1")(pixels.astype(self.dtype))
        x = x.reshape(b, -1, self.width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(stddev=self.width ** -0.5),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.width)), x],
            axis=1)
        n_pos = (self.image_size // p) ** 2 + 1
        pos = self.param("positional_embedding",
                         nn.initializers.normal(stddev=0.01),
                         (n_pos, self.width))
        x = x + pos[None, : x.shape[1], :].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)

        full = jnp.ones((1, 1, x.shape[1], x.shape[1]), dtype=bool)
        for i in range(self.layers):
            x = ClipTextBlock(self.width, self.heads, dtype=self.dtype,
                              name=f"resblock_{i}")(x, full)

        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="ln_post")(x[:, 0])
        proj = self.param("proj",
                          nn.initializers.normal(stddev=self.width ** -0.5),
                          (self.width, self.embed_dim))
        return pooled @ proj.astype(pooled.dtype)


# CLIP's published preprocessing constants (openai/CLIP clip/clip.py)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_images(images, image_size: int = 224,
                      input_range: str | None = None) -> np.ndarray:
    """CLIP image preprocessing: (list of PIL) or uint8/float (N, H, W, 3)
    -> normalized float32 (N, image_size, image_size, 3).

    Resize shorter side to `image_size` (bicubic, jax.image.resize — a
    close stand-in for torchvision's bicubic), center crop, scale to
    [0, 1], normalize with the CLIP mean/std. Square inputs resize
    directly (the generation pipeline always produces squares).

    `input_range` declares how FLOAT inputs are scaled: "01" ([0, 1]),
    "pm1" ([-1, 1], the VAE's native range), or None (auto-detect:
    any value < -0.01 selects pm1, any value > 1.5 selects 0-255).
    Auto-detection is batch-global and inherently ambiguous for
    all-bright [-1, 1] images (a frame with every pixel >= 0 is
    indistinguishable from a [0, 1] frame) — callers that KNOW their
    range should say so. An explicit declaration overrides every
    heuristic (values grossly outside it raise); integer inputs are
    always /255 regardless."""
    if not isinstance(images, np.ndarray):
        try:  # a single PIL image or a list of them
            import PIL.Image

            if isinstance(images, PIL.Image.Image):
                images = [images]
            images = np.stack([np.asarray(im.convert("RGB")) for im in images])
        except ImportError:  # pragma: no cover
            images = np.asarray(images)
    if images.ndim == 3:
        images = images[None]
    if images.shape[-1] != 3:
        raise ValueError(f"expected NHWC RGB, got {images.shape}")
    if input_range not in (None, "01", "pm1"):
        raise ValueError(f"input_range must be '01', 'pm1' or None, "
                         f"got {input_range!r}")
    x = images.astype(np.float32)
    if np.issubdtype(images.dtype, np.integer):
        x = x / 255.0
    elif input_range is not None:
        # an explicit declaration wins over the magnitude heuristic: an
        # unclamped VAE decode can overshoot [-1, 1] slightly, and the
        # old `x.max() > 1.5 -> /255` check ran first, silently
        # rescaling a declared-pm1 batch per-chunk (ADVICE r4). Gross
        # violations still fail loudly — a [0, 255] float batch declared
        # "pm1"/"01" is a caller bug, not an overshoot.
        if np.abs(x).max() > 4.0:
            raise ValueError(
                f"float input declared input_range={input_range!r} has "
                f"values in [{x.min():.3g}, {x.max():.3g}] — looks like "
                f"0-255 data; pass integers or drop input_range")
        if input_range == "pm1":
            x = (x + 1.0) / 2.0
    elif x.max() > 1.5:
        x = x / 255.0
    elif x.min() < -0.01:
        # float inputs in [-1, 1] (the VAE's native range) would be
        # silently clipped at 0 below, corrupting CLIP features/FID —
        # rescale to [0, 1] instead (ADVICE r3)
        x = (x + 1.0) / 2.0

    n, h, w, _ = x.shape
    scale = image_size / min(h, w)
    nh, nw = max(image_size, round(h * scale)), max(image_size, round(w * scale))
    if (nh, nw) != (h, w):
        x = np.asarray(jax.image.resize(
            jnp.asarray(x), (n, nh, nw, 3), method="bicubic"))
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    x = x[:, top: top + image_size, left: left + image_size, :]
    mean = np.asarray(CLIP_IMAGE_MEAN, np.float32)
    std = np.asarray(CLIP_IMAGE_STD, np.float32)
    return (np.clip(x, 0.0, 1.0) - mean[None, None, None]) / std[None, None, None]


# ----------------------------- tokenizer -----------------------------------


def _basic_clean(text: str) -> str:
    return " ".join(text.lower().strip().split())


class HashTokenizer:
    """Deterministic fallback tokenizer (no vocab file needed).

    Maps whitespace-separated words to stable ids in [1, 49405]. NOT the
    real CLIP BPE — embeddings only align with a pretrained tower when the
    real vocab file is supplied — but keeps the text->image path fully
    runnable in hermetic environments.
    """

    def encode(self, text: str) -> List[int]:
        ids = []
        for word in _basic_clean(text).split(" "):
            if not word:
                continue
            h = int.from_bytes(hashlib.sha256(word.encode()).digest()[:4], "little")
            ids.append(1 + h % (SOT_TOKEN - 1))
        return ids


class BpeTokenizer:
    """The CLIP byte-pair tokenizer, loaded from the standard
    `bpe_simple_vocab_16e6.txt.gz` vocab file."""

    def __init__(self, vocab_path: str):
        import regex as re  # dependency of `transformers`, present

        self._re = re
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        bs = list(range(ord("!"), ord("~") + 1)) + \
            list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
        cs = bs[:]
        n = 0
        for b in range(256):
            if b not in bs:
                bs.append(b)
                cs.append(256 + n)
                n += 1
        self.byte_encoder = dict(zip(bs, [chr(c) for c in cs]))

        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges[1 : 49152 - 256 - 2 + 1]]
        vocab = [self.byte_encoder[b] for b in bs]
        vocab = sorted(set(vocab))
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache: Dict[str, str] = {}

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in self._re.findall(self.pat, _basic_clean(text)):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids


def tokenize(texts: Union[str, Sequence[str]], tokenizer=None,
             context_length: int = CONTEXT_LENGTH, truncate: bool = True) -> np.ndarray:
    """`clip.tokenize` equivalent: (B, 77) int32 with SOT/EOT and padding."""
    if isinstance(texts, str):
        texts = [texts]
    tokenizer = tokenizer or HashTokenizer()
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        ids = [SOT_TOKEN] + tokenizer.encode(text) + [EOT_TOKEN]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(f"Input too long for context {context_length}")
            ids = ids[:context_length]
            ids[-1] = EOT_TOKEN
        out[i, : len(ids)] = ids
    return out


@dataclass
class FlaxClip:
    """Stateful wrapper bundling tokenizer + text tower + jit cache.

    Replaces the reference's `clip.load("ViT-L/14")` +
    `model.encode_text(...)` pair for the text side.
    """

    module: ClipTextModel
    params: Any
    tokenizer: Any
    _jitted: Any = field(default=None, repr=False)

    @classmethod
    def create(cls, width: int = 768, heads: int = 12, layers: int = 12,
               embed_dim: int = 768, seed: int = 0, params=None,
               vocab_path: Optional[str] = None, dtype=jnp.float32):
        module = ClipTextModel(width=width, heads=heads, layers=layers,
                               embed_dim=embed_dim, dtype=dtype)
        real_weights = params is not None
        if params is None:
            tokens = jnp.zeros((1, CONTEXT_LENGTH), dtype=jnp.int32)
            params = jax.jit(module.init)(jax.random.PRNGKey(seed), tokens)["params"]
        if vocab_path and os.path.exists(vocab_path):
            tokenizer = BpeTokenizer(vocab_path)
        else:
            if real_weights:
                # real CLIP weights + hash-stub tokenizer produce
                # silently-garbage embeddings (the stub's token ids do
                # not correspond to the trained vocabulary) — be loud.
                import warnings

                warnings.warn(
                    "CLIP weights were provided but no BPE vocab_path: "
                    "falling back to the HashTokenizer stub, whose token "
                    "ids DO NOT match the trained vocabulary — text "
                    "embeddings will be garbage. Pass "
                    "ClipConfig(vocab_path=...) pointing at the openai "
                    "CLIP bpe_simple_vocab_16e6.txt.gz (see "
                    "scripts/convert_towers.py).",
                    stacklevel=2)
            tokenizer = HashTokenizer()
        return cls(module=module, params=params, tokenizer=tokenizer)

    def encode_text(self, texts: Union[str, Sequence[str]]) -> jax.Array:
        """Parity with reference `encode_text` (diffusion.py:136-140)."""
        tokens = jnp.asarray(tokenize(texts, self.tokenizer))
        if self._jitted is None:
            self._jitted = jax.jit(
                lambda p, t: self.module.apply({"params": p}, t)
            )
        return self._jitted(self.params, tokens)


@dataclass
class FlaxClipVision:
    """Stateful wrapper bundling the image tower + preprocessing + jit
    cache — `clip.load("ViT-L/14")`'s `encode_image` half (the side the
    reference never ships; used for CLIP-FID / CLIP-score eval)."""

    module: ClipVisionModel
    params: Any
    _jitted: Any = field(default=None, repr=False)

    @classmethod
    def create(cls, image_size: int = 224, patch_size: int = 14,
               width: int = 1024, heads: int = 16, layers: int = 24,
               embed_dim: int = 768, seed: int = 0, params=None,
               dtype=jnp.float32):
        module = ClipVisionModel(image_size=image_size, patch_size=patch_size,
                                 width=width, heads=heads, layers=layers,
                                 embed_dim=embed_dim, dtype=dtype)
        if params is None:
            pixels = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            params = jax.jit(module.init)(
                jax.random.PRNGKey(seed), pixels)["params"]
        return cls(module=module, params=params)

    @classmethod
    def from_config(cls, cfg) -> "FlaxClipVision":
        """Build from a configs.ClipVisionConfig (converted weights via
        cfg.weights_path; random-init otherwise, with the same loud
        hermetic degradation as the other towers)."""
        params = None
        if cfg.weights_path:
            from transformer_latent_diffusion_tpu.models.torch_compat import (
                load_clip_vision_params,
            )

            params = load_clip_vision_params(cfg.weights_path, cfg.layers)
        else:
            print("CLIP vision tower: no weights_path — random-init "
                  "(convert real weights with scripts/convert_towers.py "
                  "--clip-vision)")
        return cls.create(
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            width=cfg.width, heads=cfg.heads, layers=cfg.layers,
            embed_dim=cfg.embed_dim, params=params,
            dtype=jnp.dtype(cfg.dtype))

    def encode_image(self, pixels) -> jax.Array:
        """Preprocessed pixels (B, S, S, 3) -> embeddings (B, embed_dim)."""
        if self._jitted is None:
            self._jitted = jax.jit(
                lambda p, x: self.module.apply({"params": p}, x)
            )
        return self._jitted(self.params, jnp.asarray(pixels))

    def embed(self, images) -> jax.Array:
        """Raw images (PIL list / uint8 or float NHWC) -> embeddings."""
        return self.encode_image(
            preprocess_images(images, self.module.image_size))
