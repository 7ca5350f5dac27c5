"""Native data loader tests: C++ gather parity vs numpy, uint8
dequantization, static batch shapes, shuffling."""

import numpy as np

from transformer_latent_diffusion_tpu.data.loader import (
    LatentBatcher,
    _build_native,
    _gather,
)


def _write(tmp_path, n=10, dtype=np.float32):
    rng = np.random.default_rng(0)
    if dtype == np.uint8:
        lat = rng.integers(0, 255, (n, 4, 8, 8)).astype(np.uint8)
    else:
        lat = rng.standard_normal((n, 4, 8, 8)).astype(dtype)
    txt = rng.standard_normal((n, 768)).astype(np.float32)
    lp, tp = str(tmp_path / "l.npy"), str(tmp_path / "t.npy")
    np.save(lp, lat)
    np.save(tp, txt)
    return lp, tp, lat, txt


def test_native_gather_matches_numpy(tmp_path):
    lib = _build_native()
    rng = np.random.default_rng(1)
    src = rng.standard_normal((20, 16)).astype(np.float32)
    idx = rng.integers(0, 20, 7)
    got = _gather(lib, src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_native_gather_f16(tmp_path):
    lib = _build_native()
    rng = np.random.default_rng(2)
    src = rng.standard_normal((20, 16)).astype(np.float16)
    idx = rng.integers(0, 20, 7)
    got = _gather(lib, src, idx)
    np.testing.assert_allclose(got, src[idx].astype(np.float32), rtol=1e-3)


def test_native_gather_dequant_u8():
    lib = _build_native()
    src = np.arange(0, 256, dtype=np.uint8).reshape(16, 16)
    idx = np.arange(16)
    got = _gather(lib, src, idx)
    want = (src.astype(np.float32) / 255.0 * 2.0 - 1.0) * 20.0
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batcher_static_shapes_and_shuffle(tmp_path):
    lp, tp, lat, txt = _write(tmp_path, n=10)
    b = LatentBatcher(lp, tp, batch_size=4, seed=0)
    batches = list(b.epoch())
    assert len(batches) == 2  # 10 // 4
    for x, y in batches:
        assert x.shape == (4, 4, 8, 8) and y.shape == (4, 768)
    # shuffling: different epochs yield different first batches
    first_a = batches[0][0]
    first_b = next(iter(b.epoch()))[0]
    assert not np.array_equal(first_a, first_b)


def test_batcher_uint8_store(tmp_path):
    lp, tp, lat, txt = _write(tmp_path, n=8, dtype=np.uint8)
    b = LatentBatcher(lp, tp, batch_size=8, seed=0)
    x, y = next(iter(b.epoch()))
    assert x.dtype == np.float32
    assert x.min() >= -20.0 and x.max() <= 20.0


def test_batcher_small_dataset(tmp_path):
    lp, tp, *_ = _write(tmp_path, n=3)
    b = LatentBatcher(lp, tp, batch_size=32, seed=0)
    x, y = next(iter(b.epoch()))
    assert x.shape[0] == 3  # batch clamped to dataset size
