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
