"""ctypes bridge to the C++ batch loader (compiled on first use, cached).

The reference JIT-compiles its CUDA extensions at import with
``torch.utils.cpp_extension.load`` (``op/fused_act.py:11-17``); same idea
here with ``g++`` + ctypes (pybind11 isn't in this image).  Falls back to a
pure-numpy implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "batch_loader.cpp")


def _build() -> str | None:
    with open(_SRC, "rb") as fh:
        tag = hashlib.sha1(fh.read()).hexdigest()[:12]
    cache = os.path.join(tempfile.gettempdir(),
                         f"nd_batch_loader_{tag}.so")
    if os.path.exists(cache):
        return cache
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", cache + ".tmp"],
            check=True, capture_output=True)
        os.replace(cache + ".tmp", cache)
        return cache
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


class NativeBatchLoader:
    """Shuffled float32 batches out of uint8 record files (CIFAR-10 binary
    layout by default).  ``next_batch`` returns ([n,h,w,c] in [0,1], [n])."""

    def __init__(self, paths: list[str], *, label_bytes: int = 1, c: int = 3,
                 h: int = 32, w: int = 32, seed: int = 0,
                 force_numpy: bool = False):
        self.shape = (h, w, c)
        self.label_bytes = label_bytes
        self.rng = np.random.default_rng(seed)
        self._lib = None
        self._handle = None

        so = None if force_numpy else _build()
        if so is not None:
            lib = ctypes.CDLL(so)
            lib.bl_open.restype = ctypes.c_void_p
            lib.bl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int]
            lib.bl_num_records.restype = ctypes.c_long
            lib.bl_num_records.argtypes = [ctypes.c_void_p]
            lib.bl_fill_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8)]
            lib.bl_fill_batch_mt.argtypes = lib.bl_fill_batch.argtypes + [
                ctypes.c_int]
            lib.bl_submit.restype = ctypes.c_int
            lib.bl_submit.argtypes = lib.bl_fill_batch.argtypes + [
                ctypes.c_int]
            lib.bl_wait.argtypes = [ctypes.c_void_p]
            lib.bl_close.argtypes = [ctypes.c_void_p]
            arr = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in paths])
            handle = lib.bl_open(arr, len(paths), label_bytes, c, h, w)
            if handle:
                self._lib, self._handle = lib, handle

        if self._handle is None:
            # numpy fallback: load whole files
            recs = []
            rec_len = label_bytes + c * h * w
            for p in paths:
                raw = np.fromfile(p, dtype=np.uint8)
                recs.append(raw.reshape(-1, rec_len))
            self._records = np.concatenate(recs)
        self._n = (int(self._lib.bl_num_records(self._handle))
                   if self._handle else len(self._records))

    def __len__(self) -> int:
        return self._n

    @property
    def backend(self) -> str:
        return "native" if self._handle else "numpy"

    def gather(self, indices: np.ndarray, hflip: np.ndarray | None = None):
        n = len(indices)
        h, w, c = self.shape
        images = np.empty((n, h, w, c), np.float32)
        labels = np.empty((n,), np.int32)
        if self._handle:
            idx = np.ascontiguousarray(indices, np.int64)
            flip = np.zeros(n, np.uint8) if hflip is None else \
                np.ascontiguousarray(hflip, np.uint8)
            self._lib.bl_fill_batch(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                flip.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        else:
            rec = self._records[indices]
            lb = self.label_bytes
            labels[:] = rec[:, :lb].astype(np.int64).reshape(n, lb)[:, -1]
            px = rec[:, lb:].reshape(n, c, h, w).transpose(0, 2, 3, 1)
            images[:] = px.astype(np.float32) / 255.0
            if hflip is not None:
                images[hflip.astype(bool)] = \
                    images[hflip.astype(bool)][:, :, ::-1]
        return images, labels

    def next_batch(self, batch_size: int, *, random_flip: bool = True):
        idx = self.rng.integers(0, self._n, batch_size)
        flip = (self.rng.random(batch_size) < 0.5).astype(np.uint8) \
            if random_flip else None
        return self.gather(idx, flip)

    def prefetch_batches(self, batch_size: int, *, random_flip: bool = True,
                         n_threads: int = 4):
        """Infinite batch generator with native double-buffer prefetch: the
        next batch's gather/dequantize runs on the loader's C++ worker
        thread (splitting records over ``n_threads``) while the caller
        consumes the current one — the host side of the input pipeline
        overlaps the device step instead of serializing with it.

        Zero-copy contract: each yielded ``(images, labels)`` pair aliases
        one of two rotating buffers and is overwritten TWO iterations
        later; consume it (e.g. ``jax.device_put``) before then, or copy.
        Batch composition is identical to ``next_batch`` (same RNG stream).
        Falls back to the synchronous path on the numpy backend.
        """
        if not self._handle:
            while True:
                yield self.next_batch(batch_size, random_flip=random_flip)

        h, w, c = self.shape
        bufs = [(np.empty((batch_size, h, w, c), np.float32),
                 np.empty((batch_size,), np.int32)) for _ in range(2)]

        def submit(k):
            idx = np.ascontiguousarray(
                self.rng.integers(0, self._n, batch_size), np.int64)
            flip = (self.rng.random(batch_size) < 0.5).astype(np.uint8) \
                if random_flip else np.zeros(batch_size, np.uint8)
            images, labels = bufs[k]
            ok = self._lib.bl_submit(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                batch_size,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                flip.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                n_threads)
            assert ok, "a prefetch job was already in flight"
            # idx/flip may be freed now — bl_submit copies them into the
            # job before returning; only the OUTPUT buffers must persist
            return images, labels

        k = 0
        submit(k)
        try:
            while True:
                self._lib.bl_wait(self._handle)
                ready = bufs[k]
                k ^= 1
                submit(k)
                yield ready
        finally:
            # A job is ALWAYS in flight at this point, and it writes into
            # ``bufs`` — which die with this generator frame.  Drain it
            # before the frame is torn down, or the C++ worker scribbles
            # over freed heap (observed: later abort/segv in teardown).
            # Generator finalization runs this before releasing locals.
            if self._handle:
                self._lib.bl_wait(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.bl_close(self._handle)
            self._handle = None
