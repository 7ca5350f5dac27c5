"""Shared utilities: param init/counting, image grids, PIL conversion.

Covers the reference helpers `count_parameters` (train.py:43),
`count_parameters_per_layer` (train.py:47) and the torchvision
`make_grid` + `ToPILImage` usage (train.py:37, diffusion.py:185).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_denoiser_params(model, cfg, seed: int = 0):
    """Initialize denoiser params under jit (eager init is ~10x slower)."""
    key = jax.random.PRNGKey(seed)
    in_ch = getattr(cfg, "input_channels", None) or cfg.n_channels
    x = jnp.zeros((1, in_ch, cfg.image_size, cfg.image_size))
    noise = jnp.zeros((1, 1))
    label = jnp.zeros((1, cfg.text_emb_size))
    return jax.jit(model.init)(key, x, noise, label)["params"]


def count_parameters(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def count_parameters_per_layer(params, prefix: str = "") -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        print(f"{prefix}{name}: {int(np.prod(leaf.shape))} parameters")


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile a batch (B, C, H, W) into one (C, H', W') image grid.

    Same layout semantics as torchvision.utils.make_grid used by the
    reference (diffusion.py:185, train.py:37).
    """
    images = np.asarray(images)
    b, c, h, w = images.shape
    ncol = nrow
    nrows = int(np.ceil(b / ncol))
    grid = np.full(
        (c, padding + nrows * (h + padding), padding + ncol * (w + padding)),
        pad_value,
        dtype=images.dtype,
    )
    for idx in range(b):
        r, col = divmod(idx, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[:, y : y + h, x : x + w] = images[idx]
    return grid


def uint8_grid_to_pil(images_bhwc: np.ndarray, nrow: int = 8,
                      padding: int = 2):
    """Tile already-uint8 (B, H, W, 3) images into one PIL grid.

    Pixel-identical to `to_pil(clip(make_grid(float_images, ...)))` when
    the uint8 quantization used the same clip + (x*255+0.5) math (see
    DiffusionGenerator.generate(output="uint8")) — each interior pixel
    depends only on its own float value and the pad value maps to 0.
    """
    from PIL import Image

    images = np.asarray(images_bhwc)
    # make_grid is dtype-preserving and pads with 0 — reuse it so the
    # float and uint8 grid layouts can never drift apart
    grid = make_grid(images.transpose(0, 3, 1, 2), nrow=nrow,
                     padding=padding, pad_value=0)
    if grid.shape[0] == 1:
        return Image.fromarray(grid[0], mode="L")
    return Image.fromarray(np.transpose(grid, (1, 2, 0)), mode="RGB")


def to_pil(img_chw: np.ndarray):
    """(C, H, W) float in [0, 1] -> PIL.Image (like ToPILImage)."""
    from PIL import Image

    arr = np.asarray(img_chw)
    arr = np.clip(arr, 0.0, 1.0)
    arr = (arr * 255.0 + 0.5).astype(np.uint8)
    if arr.shape[0] == 1:
        return Image.fromarray(arr[0], mode="L")
    return Image.fromarray(np.transpose(arr, (1, 2, 0)), mode="RGB")


def slerp(a: np.ndarray, b: np.ndarray, t) -> np.ndarray:
    """Spherical linear interpolation between two vectors.

    `t` may be a scalar or a 1-D array of interpolation points; the
    result has shape (*t.shape, dim). Interpolates along the great
    circle through a/|a| and b/|b| while linearly interpolating the
    magnitudes, so unit-norm inputs stay unit-norm (pooled CLIP
    embeddings live on a sphere — plain lerp would pass through
    low-norm midpoints the text tower never produces). Near-parallel
    inputs fall back to lerp (sin(omega) -> 0 is ill-conditioned).
    """
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    t = np.asarray(t, dtype=np.float32)[..., None]
    na = float(np.linalg.norm(a))
    nb = float(np.linalg.norm(b))
    cos = float(np.clip(np.dot(a / na, b / nb), -1.0, 1.0))
    omega = float(np.arccos(cos))
    if omega < 1e-4:
        return (1.0 - t) * a + t * b
    so = np.sin(omega)
    unit = (np.sin((1.0 - t) * omega) * (a / na)
            + np.sin(t * omega) * (b / nb)) / so
    return ((1.0 - t) * na + t * nb) * unit
