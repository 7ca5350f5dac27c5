"""Flax AutoencoderKL (the SDXL "sdxl-vae-fp16-fix" architecture), TPU-first.

The reference uses the pretrained diffusers `AutoencoderKL` as a frozen
external tower (encode: /root/reference/tld/data.py:36-41, decode:
/root/reference/tld/diffusion.py:91, config at configs.py:39-43). There is
no maintained Flax port, so this module implements the architecture from
scratch in NHWC (TPU-native layout) with a weight-structure that the
torch->flax converter in `models/torch_compat.py` fills from a diffusers
checkpoint when one is available; otherwise it random-initializes (tests
use a tiny config, matching the reference test strategy of untrained
towers where possible).

Public API keeps the reference's NCHW latent/image conventions:
`encode(img) -> latent sample`, `decode(lat) -> img in [-1, 1]`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

GN_EPS = 1e-6


def _norm(channels: int, num_groups: int = 32, name: str | None = None):
    # sdxl-vae uses 32 groups everywhere (all channels divisible by 32);
    # gcd keeps tiny test configs valid.
    import math

    return nn.GroupNorm(num_groups=math.gcd(num_groups, channels),
                        epsilon=GN_EPS, name=name)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = _norm(x.shape[-1], name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = _norm(h.shape[-1], name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention mid-block (diffusers 'Attention')."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = _norm(x.shape[-1], name="group_norm")(x)
        flat = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(flat)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(flat)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(flat)
        scale = 1.0 / jnp.sqrt(jnp.asarray(c, dtype=jnp.float32))
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) * scale,
            axis=-1,
        )
        out = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return res + out.reshape(b, h, w, c)


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # diffusers pads (0, 1) on H/W then convs with stride 2, VALID
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv")(x)


class MidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, dtype=self.dtype, name="resnet_0")(x)
        x = AttnBlock(self.channels, dtype=self.dtype, name="attn")(x)
        x = ResnetBlock(self.channels, dtype=self.dtype, name="resnet_1")(x)
        return x


class Encoder(nn.Module):
    block_out_channels: Sequence[int]
    layers_per_block: int
    latent_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                x = ResnetBlock(ch, dtype=self.dtype,
                                name=f"down_{i}_resnet_{j}")(x)
            if i < len(self.block_out_channels) - 1:
                x = Downsample(ch, dtype=self.dtype, name=f"down_{i}_downsample")(x)
        x = MidBlock(self.block_out_channels[-1], dtype=self.dtype,
                     name="mid_block")(x)
        x = _norm(x.shape[-1], name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    block_out_channels: Sequence[int]
    layers_per_block: int
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        reversed_ch = list(reversed(self.block_out_channels))
        x = nn.Conv(reversed_ch[0], (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        x = MidBlock(reversed_ch[0], dtype=self.dtype, name="mid_block")(x)
        for i, ch in enumerate(reversed_ch):
            for j in range(self.layers_per_block + 1):
                x = ResnetBlock(ch, dtype=self.dtype, name=f"up_{i}_resnet_{j}")(x)
            if i < len(reversed_ch) - 1:
                x = Upsample(ch, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = _norm(x.shape[-1], name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """KL VAE matching the diffusers AutoencoderKL graph (NHWC inside)."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels, self.layers_per_block,
                               self.latent_channels, dtype=self.dtype)
        self.decoder = Decoder(self.block_out_channels, self.layers_per_block,
                               dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode_moments(self, img_nhwc):
        h = self.encoder(img_nhwc)
        moments = self.quant_conv(h)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode_latent(self, lat_nhwc):
        return self.decoder(self.post_quant_conv(lat_nhwc))

    def __call__(self, img_nhwc, rng):
        mean, logvar = self.encode_moments(img_nhwc)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, dtype=mean.dtype
        )
        return self.decode_latent(z)


@dataclass
class FlaxVae:
    """Stateful convenience wrapper: NCHW public API + jit caching.

    Mirrors how the reference passes a diffusers VAE object around
    (train.py:78, diffusion.py:157). Construct via `FlaxVae.create(...)`.
    """

    module: AutoencoderKL
    params: Any
    _jitted: Dict[str, Any] = field(default_factory=dict, repr=False)

    @classmethod
    def create(cls, block_out_channels=(128, 256, 512, 512), layers_per_block=2,
               latent_channels=4, seed: int = 0, sample_size: int = 32,
               params=None, dtype=jnp.float32):
        module = AutoencoderKL(
            block_out_channels=tuple(block_out_channels),
            layers_per_block=layers_per_block,
            latent_channels=latent_channels,
            dtype=dtype,
        )
        if params is None:
            img = jnp.zeros((1, sample_size, sample_size, 3))
            params = jax.jit(module.init)(
                {"params": jax.random.PRNGKey(seed)}, img, jax.random.PRNGKey(1)
            )["params"]
        return cls(module=module, params=params)

    def _get(self, name, fn):
        if name not in self._jitted:
            self._jitted[name] = jax.jit(fn)
        return self._jitted[name]

    def encode(self, img_nchw, rng=None):
        """img (B,3,H,W) in [-1,1] -> sampled latent (B,C,H/8,W/8) (unscaled).

        Parity: `vae.encode(x).sample()` in reference data.py:36-41.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def f(params, img, rng):
            x = jnp.transpose(img, (0, 2, 3, 1))
            mean, logvar = self.module.apply(
                {"params": params}, x, method=AutoencoderKL.encode_moments
            )
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, dtype=mean.dtype
            )
            return jnp.transpose(z, (0, 3, 1, 2))

        return self._get("encode", f)(self.params, img_nchw, rng)

    def encode_mean(self, img_nchw):
        """img (B,3,H,W) in [-1,1] -> deterministic posterior MEAN latent
        (B,C,H/8,W/8) (unscaled). Jit-cached like encode/decode; used by
        utils.fid for reproducible latent features."""

        def f(params, img):
            x = jnp.transpose(img, (0, 2, 3, 1))
            mean, _ = self.module.apply(
                {"params": params}, x, method=AutoencoderKL.encode_moments
            )
            return jnp.transpose(mean, (0, 3, 1, 2))

        return self._get("encode_mean", f)(self.params, img_nchw)

    def decode(self, lat_nchw):
        """latent (B,C,h,w) (already scaled) -> image (B,3,8h,8w) ~[-1,1].

        Parity: `vae.decode(x)[0]` in reference diffusion.py:91.
        """

        def f(params, lat):
            z = jnp.transpose(lat, (0, 2, 3, 1))
            img = self.module.apply(
                {"params": params}, z, method=AutoencoderKL.decode_latent
            )
            return jnp.transpose(img, (0, 3, 1, 2))

        return self._get("decode", f)(self.params, lat_nchw)
