"""Numerical oracle for the torch->flax VAE converter.

The reference's images come from the pretrained diffusers AutoencoderKL
("madebyollin/sdxl-vae-fp16-fix", /root/reference/tld/diffusion.py:157-158,
data.py:36-41). Our production path is VaeConfig(weights_path=<diffusers
state_dict>) -> models/torch_compat.convert_torch_vae_state_dict -> FlaxVae.
diffusers itself is not installed here, so this file carries a minimal torch
re-implementation of the AutoencoderKL graph with diffusers' EXACT
state_dict key layout (encoder.down_blocks.N.resnets.M..., decoder.up_blocks
reversed-channel ordering, mid_block.attentions.0.to_out.0, quant_conv /
post_quant_conv) and asserts the converted Flax model reproduces the torch
forward to ~1e-4 — with sdxl's 4-level block structure (distinct widths
catch shape-visible misordering; the equal-width trailing pair catches the
decoder up-block orderings that only a numerical oracle can see).
"""

import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from transformer_latent_diffusion_tpu.configs import VaeConfig
from transformer_latent_diffusion_tpu.models.torch_compat import (
    convert_torch_vae_state_dict,
    load_vae_params,
)
from transformer_latent_diffusion_tpu.models.vae import AutoencoderKL, FlaxVae

# sdxl-vae structure scaled 1/8: 4 levels, LAST TWO EQUAL WIDTH — equal
# widths are where a wrong up-block ordering passes shape checks and only
# a numerical oracle catches it; the distinct first widths catch the rest.
BLOCKS = (16, 32, 64, 64)
LAYERS = 2
LATENT = 4


def _gn(ch):
    return nn.GroupNorm(math.gcd(32, ch), ch, eps=1e-6)


class TResnet(nn.Module):
    """diffusers ResnetBlock2D (keys: norm1/conv1/norm2/conv2[/conv_shortcut])."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _gn(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TAttn(nn.Module):
    """diffusers Attention as used in the VAE mid block (1 head,
    keys group_norm/to_q/to_k/to_v/to_out.0)."""

    def __init__(self, ch):
        super().__init__()
        self.group_norm = _gn(ch)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        flat = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(flat), self.to_k(flat), self.to_v(flat)
        attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        out = self.to_out[0](attn @ v)
        return res + out.transpose(1, 2).reshape(b, c, h, w)


class TMid(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = nn.ModuleList([TResnet(ch, ch), TResnet(ch, ch)])
        self.attentions = nn.ModuleList([TAttn(ch)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TDown(nn.Module):
    def __init__(self, cin, cout, final, layers=LAYERS):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet(cin if j == 0 else cout, cout) for j in range(layers)])
        if not final:
            conv = nn.Conv2d(cout, cout, 3, stride=2, padding=0)
            wrap = nn.Module()
            wrap.conv = conv
            self.downsamplers = nn.ModuleList([wrap])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = F.pad(x, (0, 1, 0, 1))  # diffusers pads (0,1) H/W, VALID conv
            x = self.downsamplers[0].conv(x)
        return x


class TUp(nn.Module):
    def __init__(self, cin, cout, final, layers=LAYERS):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet(cin if j == 0 else cout, cout) for j in range(layers + 1)])
        if not final:
            conv = nn.Conv2d(cout, cout, 3, padding=1)
            wrap = nn.Module()
            wrap.conv = conv
            self.upsamplers = nn.ModuleList([wrap])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TEncoder(nn.Module):
    def __init__(self, chans=BLOCKS, layers=LAYERS, latent=LATENT):
        super().__init__()
        self.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        blocks, cin = [], chans[0]
        for i, ch in enumerate(chans):
            blocks.append(TDown(cin, ch, final=i == len(chans) - 1,
                                layers=layers))
            cin = ch
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = TMid(chans[-1])
        self.conv_norm_out = _gn(chans[-1])
        self.conv_out = nn.Conv2d(chans[-1], 2 * latent, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TDecoder(nn.Module):
    def __init__(self, chans=BLOCKS, layers=LAYERS, latent=LATENT):
        super().__init__()
        rev = list(reversed(chans))  # diffusers reverses for up_blocks
        self.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        self.mid_block = TMid(rev[0])
        blocks, cin = [], rev[0]
        for i, ch in enumerate(rev):
            blocks.append(TUp(cin, ch, final=i == len(rev) - 1,
                              layers=layers))
            cin = ch
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = _gn(rev[-1])
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        z = self.conv_in(z)
        z = self.mid_block(z)
        for b in self.up_blocks:
            z = b(z)
        return self.conv_out(F.silu(self.conv_norm_out(z)))


class TAutoencoderKL(nn.Module):
    def __init__(self, chans=BLOCKS, layers=LAYERS, latent=LATENT):
        super().__init__()
        self.encoder = TEncoder(chans, layers, latent)
        self.decoder = TDecoder(chans, layers, latent)
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def _build_oracle(chans=BLOCKS, layers=LAYERS, latent=LATENT):
    torch.manual_seed(7)
    model = TAutoencoderKL(chans, layers, latent).eval()
    # default conv init makes deep activations shrink; rescale weights so
    # every stage carries O(1) signal and mismatches can't hide in noise
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim > 1:
                p.mul_(3.0)
    return model


def test_vae_converter_matches_torch_oracle():
    model = _build_oracle()
    torch.manual_seed(11)
    img = torch.randn(2, 3, 32, 32)

    with torch.no_grad():
        t_mean, t_logvar = model.encode_moments(img)
        t_img = model.decode(t_mean)

    params = convert_torch_vae_state_dict(model.state_dict(), BLOCKS, LAYERS)
    vae = FlaxVae.create(block_out_channels=BLOCKS, layers_per_block=LAYERS,
                         latent_channels=LATENT, params=params)

    # full moments (mean AND logvar — exercises both halves of conv_out /
    # quant_conv) via the module, then the public NCHW wrapper APIs
    import jax.numpy as jnp

    x_nhwc = jnp.transpose(jnp.asarray(img.numpy()), (0, 2, 3, 1))
    f_mean, f_logvar = vae.module.apply(
        {"params": vae.params}, x_nhwc, method=AutoencoderKL.encode_moments)
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_mean), (0, 3, 1, 2)),
        t_mean.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_logvar), (0, 3, 1, 2)),
        t_logvar.numpy(), atol=1e-4, rtol=1e-4)

    f_img = vae.decode(jnp.asarray(t_mean.numpy()))
    np.testing.assert_allclose(np.asarray(f_img), t_img.numpy(),
                               atol=2e-4, rtol=1e-4)

    f_mean2 = vae.encode_mean(jnp.asarray(img.numpy()))
    np.testing.assert_allclose(np.asarray(f_mean2), t_mean.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_vae_weights_path_production_route(tmp_path):
    """The exact route a user takes: VaeConfig(weights_path=<.pth state_dict>)
    -> load_vae_params -> FlaxVae (sampling/pipeline.py:161-170)."""
    model = _build_oracle()
    ckpt = str(tmp_path / "vae.pth")
    torch.save(model.state_dict(), ckpt)

    cfg = VaeConfig(weights_path=ckpt, block_out_channels=BLOCKS,
                    layers_per_block=LAYERS, latent_channels=LATENT)
    params = load_vae_params(ckpt, cfg)
    vae = FlaxVae.create(block_out_channels=BLOCKS, layers_per_block=LAYERS,
                         latent_channels=LATENT, params=params)

    import jax.numpy as jnp

    torch.manual_seed(13)
    z = torch.randn(1, LATENT, 8, 8)
    with torch.no_grad():
        t_img = model.decode(z)
    f_img = vae.decode(jnp.asarray(z.numpy()))
    np.testing.assert_allclose(np.asarray(f_img), t_img.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_convert_towers_then_generate_smoke(tmp_path, monkeypatch):
    """The documented real-weights workflow, end to end and offline:
    diffusers-layout .pth -> scripts/convert_towers.py -> vae.npz ->
    examples/generate.py --vae-npz (the exact command from the example's
    docstring, tiny architecture). The day network exists, the same two
    commands run unchanged with the published sdxl-vae checkpoint."""
    import runpy

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

    model = _build_oracle(chans=(8, 16), layers=1)
    ckpt = str(tmp_path / "diffusion_pytorch_model.pth")
    torch.save(model.state_dict(), ckpt)

    monkeypatch.setattr(sys, "argv", [
        "convert_towers.py", "--vae", ckpt, "--vae-blocks", "8,16",
        "--vae-layers", "1", "--out-dir", str(tmp_path), "--verify"])
    runpy.run_path(os.path.join(root, "scripts", "convert_towers.py"),
                   run_name="__main__")
    vae_npz = tmp_path / "vae.npz"
    assert vae_npz.exists()

    out = str(tmp_path / "cat.png")
    monkeypatch.setattr(sys, "argv", [
        "generate.py", "--tiny", "--vae-npz", str(vae_npz),
        "--n-iter", "4", "--out", out])
    runpy.run_path(os.path.join(root, "examples", "generate.py"),
                   run_name="__main__")
    assert os.path.exists(out)
