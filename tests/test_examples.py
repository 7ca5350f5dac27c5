"""Smoke test for the runnable examples (user-facing entry points)."""

import os
import runpy
import sys


def test_example_generate_tiny(tmp_path, monkeypatch):
    out = str(tmp_path / "out.png")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setattr(sys, "argv", [
        "examples/generate.py", "--tiny", "--n-iter", "4", "--out", out])
    runpy.run_path(os.path.join(root, "examples", "generate.py"),
                   run_name="__main__")
    import PIL.Image

    img = PIL.Image.open(out)
    assert img.size[0] > 0


def test_example_generate_img2img_and_inpaint(tmp_path, monkeypatch):
    import numpy as np
    import PIL.Image

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    px = 32  # tiny 2-block VAE downsamples by 2; 16-wide latent model
    src = str(tmp_path / "src.png")
    PIL.Image.fromarray(np.random.default_rng(0).integers(
        0, 255, size=(px, px, 3), dtype=np.uint8)).save(src)

    out = str(tmp_path / "i2i.png")
    monkeypatch.setattr(sys, "argv", [
        "examples/generate.py", "--tiny", "--n-iter", "4", "--out", out,
        "--init-image", src, "--strength", "0.5",
        "--negative-prompt", "blurry"])
    runpy.run_path(os.path.join(root, "examples", "generate.py"),
                   run_name="__main__")
    assert PIL.Image.open(out).size[0] > 0

    mask = str(tmp_path / "mask.png")
    m = np.zeros((px, px), dtype=np.uint8)
    m[: px // 2] = 255
    PIL.Image.fromarray(m).save(mask)
    out2 = str(tmp_path / "inpaint.png")
    monkeypatch.setattr(sys, "argv", [
        "examples/generate.py", "--tiny", "--n-iter", "4", "--out", out2,
        "--init-image", src, "--mask", mask])
    runpy.run_path(os.path.join(root, "examples", "generate.py"),
                   run_name="__main__")
    assert PIL.Image.open(out2).size[0] > 0


def test_example_generate_interpolate(tmp_path, monkeypatch):
    import PIL.Image

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "interp.png")
    monkeypatch.setattr(sys, "argv", [
        "examples/generate.py", "--tiny", "--n-iter", "4", "--out", out,
        "--prompt", "a cat", "--interpolate-to", "a dog", "--num-imgs", "3"])
    runpy.run_path(os.path.join(root, "examples", "generate.py"),
                   run_name="__main__")
    img = PIL.Image.open(out)
    assert img.size[0] == 3 * 32 + 4 * 4  # 3-frame strip


def test_example_distill_fewstep(tmp_path, monkeypatch):
    import PIL.Image

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "fewstep.png")
    save = str(tmp_path / "ema.npz")
    monkeypatch.setattr(sys, "argv", [
        "examples/distill_fewstep.py", "--tiny", "--steps", "2",
        "--out", out, "--save", save])
    runpy.run_path(os.path.join(root, "examples", "distill_fewstep.py"),
                   run_name="__main__")
    assert os.path.exists(save)
    assert PIL.Image.open(out).size[0] > 0


def test_example_evaluate(tmp_path, monkeypatch, capsys):
    import json

    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    real = np.random.default_rng(0).uniform(
        -1, 1, (6, 3, 32, 32)).astype(np.float32)
    np.save(tmp_path / "real.npy", real)
    save = str(tmp_path / "gen.npy")
    monkeypatch.setattr(sys, "argv", [
        "examples/evaluate.py", "--tiny", "--n-iter", "3",
        "--prompt", "a cat", "--prompt", "a dog",
        "--real-images", str(tmp_path / "real.npy"),
        "--save-images", save, "--batch-size", "2"])
    runpy.run_path(os.path.join(root, "examples", "evaluate.py"),
                   run_name="__main__")
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_images"] == 2 and np.isfinite(out["clip_score"])
    assert out["real_weights"] is False
    assert np.isfinite(out["clip_fid"]) and out["clip_fid"] > 0
    gen = np.load(save)
    assert gen.dtype == np.uint8 and gen.shape[0] == 2
    assert gen.shape[-1] == 3


def test_example_lora_finetune(tmp_path, monkeypatch):
    import PIL.Image
    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "lora_samples.png")
    save = str(tmp_path / "lora.npz")
    monkeypatch.setattr(sys, "argv", [
        "examples/lora_finetune.py", "--tiny",
        "--out", out, "--save", save])
    runpy.run_path(os.path.join(root, "examples", "lora_finetune.py"),
                   run_name="__main__")
    assert os.path.exists(save)
    with np.load(save) as z:
        assert float(z["__scale__"]) > 0
        assert any(k.endswith("::b") for k in z.files)
    assert PIL.Image.open(out).size[0] > 0
