"""Training-batch loader: memory-mapped .npy + native C++ gather.

Replaces the reference's TensorDataset/DataLoader (train.py:72-76) with a
TPU-host-friendly design: the latent store is memory-mapped (no RAM blowup
at 1M+ latents), per-epoch shuffling is a host permutation, and batch
assembly (index gather, f16->f32 widening, uint8 latent dequantization)
runs in an OpenMP C++ library (data/native/loader.cpp) via ctypes, with a
pure-numpy fallback when no compiler is available.

Batch shapes are static (wraparound on the last partial batch) so the
jitted train step never recompiles.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_CACHE = {}


def _build_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native loader; None if unavailable."""
    if "lib" in _LIB_CACHE:
        return _LIB_CACHE["lib"]
    src = os.path.join(_NATIVE_DIR, "loader.cpp")
    if not os.path.exists(src):
        _LIB_CACHE["lib"] = None
        return None
    lib_path = os.path.join(
        tempfile.gettempdir(),
        f"tld_tpu_loader_{os.path.getmtime(src):.0f}.so",
    )
    if not os.path.exists(lib_path):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                 "-fPIC", src, "-o", lib_path],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            try:  # retry without openmp/march
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", src, "-o", lib_path],
                    check=True, capture_output=True,
                )
            except Exception:
                _LIB_CACHE["lib"] = None
                return None
    try:
        lib = ctypes.CDLL(lib_path)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.gather_f32.argtypes = [f32p, i64p, f32p, ctypes.c_int64, ctypes.c_int64]
        lib.gather_f16_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), i64p, f32p,
            ctypes.c_int64, ctypes.c_int64]
        lib.gather_dequant_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), i64p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_float]
        _LIB_CACHE["lib"] = lib
        return lib
    except OSError:
        _LIB_CACHE["lib"] = None
        return None


def _gather(lib, src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Gather rows src[idx] -> contiguous f32 batch, natively if possible."""
    n = len(idx)
    row = int(np.prod(src.shape[1:]))
    out = np.empty((n, *src.shape[1:]), dtype=np.float32)
    if lib is None:
        if src.dtype == np.uint8:
            out[:] = (src[idx].astype(np.float32) / 255.0 * 2.0 - 1.0) * 20.0
        else:
            out[:] = src[idx].astype(np.float32)
        return out

    idx64 = np.ascontiguousarray(idx, dtype=np.int64)
    i64p = idx64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    outp = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    flat = np.ascontiguousarray(src).reshape(src.shape[0], -1) \
        if not src.flags["C_CONTIGUOUS"] else src
    if src.dtype == np.float32:
        lib.gather_f32(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       i64p, outp, n, row)
    elif src.dtype == np.float16:
        lib.gather_f16_to_f32(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            i64p, outp, n, row)
    elif src.dtype == np.uint8:
        lib.gather_dequant_u8(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            i64p, outp, n, row, ctypes.c_float(20.0))
    else:
        out[:] = src[idx].astype(np.float32)
    return out


class LatentBatcher:
    """Shuffled, static-shape batches over memory-mapped .npy latents.

    uint8 stores are dequantized on the fly (reference data.py:58-60
    semantics, clip_val=20)."""

    def __init__(self, latent_path: str, text_emb_path: str, batch_size: int,
                 seed: int = 0, mmap: bool = True, holdout: int = 0):
        mode = "r" if mmap else None
        self.latents = np.load(latent_path, mmap_mode=mode)
        self.text = np.load(text_emb_path, mmap_mode=mode)
        assert len(self.latents) == len(self.text), (
            len(self.latents), len(self.text))
        self.n = len(self.latents)
        # holdout: the LAST `holdout` examples never enter training
        # batches; holdout_batch() hands them out for validation loss
        if not 0 <= holdout < self.n:
            raise ValueError(
                f"holdout={holdout} must be in [0, {self.n}) for a "
                f"{self.n}-example dataset")
        self.holdout = holdout
        self.n -= holdout
        self.batch_size = min(batch_size, self.n)
        self.rng = np.random.default_rng(seed)
        self.lib = _build_native()

    def holdout_batch(self):
        """The held-out tail as one (latents, text) f32 batch,
        dequantized exactly like training batches."""
        if not self.holdout:
            raise ValueError("constructed with holdout=0")
        idx = np.arange(self.n, self.n + self.holdout)
        return (_gather(self.lib, self.latents, idx),
                _gather(self.lib, self.text, idx))

    @property
    def steps_per_epoch(self) -> int:
        return max(1, self.n // self.batch_size)

    def epoch(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        perm = self.rng.permutation(self.n)
        bs = self.batch_size
        for it in range(self.steps_per_epoch):
            start = (it * bs) % self.n
            idx = perm[start:start + bs]
            if len(idx) < bs:  # wraparound keeps shapes static
                idx = np.concatenate([idx, perm[: bs - len(idx)]])
            yield _gather(self.lib, self.latents, idx), \
                _gather(self.lib, self.text, idx)
