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
