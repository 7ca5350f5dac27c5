"""Data pipeline tests: quantization helpers, encode/decode round trips,
the native tar shard reader, the HDF5 encode loop, and the .npy export.
Mirrors reference data.py capabilities (its own test was manual-only,
test_diffuser.py:160-180)."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from transformer_latent_diffusion_tpu.data import (
    append_to_dataset,
    decode_latents,
    dequantize_latents,
    encode_image,
    encode_text,
    get_text_and_latent_embeddings_hdf5,
    hdf5_to_npy,
    iter_webdataset_shards,
    quantize_latents,
)

h5py = pytest.importorskip("h5py")


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((4, 4, 8, 8)).astype(np.float32) * 5
    q = quantize_latents(lat)
    assert q.dtype == np.uint8
    dq = dequantize_latents(q)
    # quantization step is 2*20/255 ~ 0.157; uint8 cast truncates (same as
    # the reference's .to(torch.uint8)), so worst case is one full step
    assert np.abs(dq.astype(np.float32) - lat).max() < 0.2


def test_quantize_clips_extremes():
    lat = np.array([-100.0, 0.0, 100.0], dtype=np.float32)
    q = quantize_latents(lat)
    assert q[0] == 0 and q[-1] == 255
    dq = dequantize_latents(q)
    assert dq[0] == -20 and dq[-1] == 20


def _make_tar_shard(path, n, image_size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = Image.fromarray(
                rng.integers(0, 255, (image_size, image_size, 3), dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")

            def add(name, data):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

            add(f"{i:05d}.jpg", buf.getvalue())
            add(f"{i:05d}.json", json.dumps(
                {"caption": f"caption {i}", "url": f"http://x/{i}"}).encode())


def test_iter_webdataset_shards(tmp_path):
    shard = str(tmp_path / "00000.tar")
    _make_tar_shard(shard, 5, image_size=16)
    batches = list(iter_webdataset_shards([shard], batch_size=2, image_size=16))
    assert len(batches) == 3  # 2 + 2 + 1
    imgs, (caps, urls) = batches[0]
    assert imgs.shape == (2, 3, 16, 16)
    # batches stay uint8; encode_image converts on device (4x less
    # host->device traffic than f32)
    assert imgs.dtype == np.uint8
    assert caps == ["caption 0", "caption 1"]
    assert urls[0] == "http://x/0"


def test_encode_decode_with_tiny_towers(tmp_path):
    from transformer_latent_diffusion_tpu.models.clip import FlaxClip
    from transformer_latent_diffusion_tpu.models.vae import FlaxVae

    vae = FlaxVae.create(block_out_channels=(8, 16), layers_per_block=1)
    clip_model = FlaxClip.create(width=64, heads=2, layers=2)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 3, 16, 16)).astype(np.float32)
    lat = encode_image(img, vae)
    assert lat.shape == (2, 4, 8, 8)
    dec = decode_latents(lat, vae)
    assert dec.shape == (2, 3, 16, 16)
    assert dec.min() >= 0 and dec.max() <= 1

    emb = encode_text(["a", "b"], clip_model)
    assert emb.shape == (2, 768)


def test_hdf5_encode_loop_and_npy_export(tmp_path):
    from transformer_latent_diffusion_tpu.models.clip import FlaxClip
    from transformer_latent_diffusion_tpu.models.vae import FlaxVae

    vae = FlaxVae.create(block_out_channels=(8, 16), layers_per_block=1)
    clip_model = FlaxClip.create(width=64, heads=2, layers=2)

    shard = str(tmp_path / "00000.tar")
    _make_tar_shard(shard, 4, image_size=16)
    loader = iter_webdataset_shards([shard], batch_size=2, image_size=16)

    out_dir = str(tmp_path / "latents")
    os.makedirs(out_dir)
    get_text_and_latent_embeddings_hdf5(
        loader, vae, clip_model, out_dir, latent_shape=(4, 8, 8))

    with h5py.File(os.path.join(out_dir, "image_latents.hdf5")) as f:
        assert f["image_latents"].shape == (4, 4, 8, 8)
        assert f["image_latents"].dtype == np.float16
    with h5py.File(os.path.join(out_dir, "text_encodings.hdf5")) as f:
        assert f["text_encodings"].shape == (4, 768)
    meta = open(os.path.join(out_dir, "metadata.csv")).read()
    assert "caption 0" in meta

    lp, tp = hdf5_to_npy(out_dir, str(tmp_path / "l.npy"), str(tmp_path / "t.npy"))
    assert np.load(lp).shape == (4, 4, 8, 8)
    assert np.load(tp).shape == (4, 768)


def test_hdf5_to_npy_streams_in_chunks(tmp_path):
    """The HDF5 -> .npy export never materializes the dataset in RAM
    (VERDICT r3 #7): a chunk size smaller than the row count must copy
    every row bit-exactly across chunk boundaries."""
    rng = np.random.default_rng(3)
    lat = rng.standard_normal((7, 4, 8, 8)).astype(np.float16)
    emb = rng.standard_normal((7, 768)).astype(np.float16)
    with h5py.File(tmp_path / "image_latents.hdf5", "w") as f:
        f.create_dataset("image_latents", data=lat)
    with h5py.File(tmp_path / "text_encodings.hdf5", "w") as f:
        f.create_dataset("text_encodings", data=emb)

    lp, tp = hdf5_to_npy(str(tmp_path), str(tmp_path / "l.npy"),
                         str(tmp_path / "t.npy"), chunk_rows=2)
    got_l = np.load(lp, mmap_mode="r")
    got_t = np.load(tp, mmap_mode="r")
    assert got_l.dtype == got_t.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(got_l), lat.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(got_t), emb.astype(np.float32))


def test_append_to_dataset(tmp_path):
    with h5py.File(tmp_path / "x.hdf5", "w") as f:
        ds = f.create_dataset("d", shape=(0, 3), maxshape=(None, 3), dtype="f4")
        append_to_dataset(ds, np.ones((2, 3)))
        append_to_dataset(ds, np.zeros((1, 3)))
        assert ds.shape == (3, 3)
        assert ds[0, 0] == 1 and ds[2, 0] == 0


def test_data_main_end_to_end(tmp_path, monkeypatch):
    """Full data.main flow (reference data.py:177-214) without network:
    parquet -> imgs.csv -> pre-downloaded tar shards -> HDF5 + config.json."""
    import pandas as pd
    from transformer_latent_diffusion_tpu.configs import DataDownloadConfig
    from transformer_latent_diffusion_tpu.data import main as data_main
    import transformer_latent_diffusion_tpu.data.pipeline as pipeline_mod

    monkeypatch.chdir(tmp_path)

    # parquet of (key, url, caption)
    parquet = str(tmp_path / "data.parquet")
    pd.DataFrame({
        "key": [f"k{i}" for i in range(6)],
        "url": [f"http://x/{i}" for i in range(6)],
        "caption": [f"caption {i}" for i in range(6)],
        "extra": list(range(6)),
    }).to_parquet(parquet)

    # pre-downloaded shard (download_data=False path)
    raw = tmp_path / "raw_imgs"
    raw.mkdir()
    _make_tar_shard(str(raw / "00000.tar"), 4, image_size=16)

    # tiny towers so the encode loop is fast
    from transformer_latent_diffusion_tpu.models.clip import FlaxClip
    from transformer_latent_diffusion_tpu.models.vae import FlaxVae
    tiny_vae = FlaxVae.create(block_out_channels=(8, 16), layers_per_block=1)
    tiny_clip = FlaxClip.create(width=64, heads=2, layers=2)
    orig = pipeline_mod.download_and_process_data

    def patched(**kw):
        kw.update(vae=tiny_vae, clip_model=tiny_clip)
        return orig(**kw)

    monkeypatch.setattr(pipeline_mod, "download_and_process_data", patched)

    cfg = DataDownloadConfig(
        data_link=parquet,
        latent_save_path=str(tmp_path / "latents"),
        raw_imgs_save_path=str(raw),
        initial_csv_path=str(tmp_path / "imgs.csv"),
        download_data=False,
        first_n_rows=5,
        image_size=16,
        batch_size=2,
        use_wandb=False,
    )
    data_main(cfg)

    csv = pd.read_csv(tmp_path / "imgs.csv")
    assert list(csv.columns) == ["key", "url", "caption"] and len(csv) == 5
    assert os.path.exists(tmp_path / "latents" / "config.json")
    with h5py.File(tmp_path / "latents" / "image_latents.hdf5") as f:
        # tiny VAE downsamples x2: 16px -> 8x8 latents
        assert f["image_latents"].shape == (4, 4, 8, 8)
    with h5py.File(tmp_path / "latents" / "text_encodings.hdf5") as f:
        assert f["text_encodings"].shape == (4, 768)
    meta = open(tmp_path / "latents" / "metadata.csv").read()
    assert "caption 0" in meta
