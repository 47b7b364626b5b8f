"""Native C++ batch loader vs numpy fallback, dataset iterators."""

import numpy as np
import pytest

from naturaldiffusion_tpu.data import (NativeBatchLoader, get_dataset,
                                       get_scaler, get_inverse_scaler)


@pytest.fixture(scope="module")
def cifar_bin(tmp_path_factory):
    """Two synthetic CIFAR-10-binary files (1 label byte + 3072 CHW bytes)."""
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("cifar")
    paths = []
    for fi in range(2):
        n = 50
        rec = np.empty((n, 1 + 3072), np.uint8)
        rec[:, 0] = rng.integers(0, 10, n)
        rec[:, 1:] = rng.integers(0, 256, (n, 3072))
        p = d / f"data_batch_{fi + 1}.bin"
        rec.tofile(p)
        paths.append(str(p))
    return paths


def test_native_matches_numpy(cifar_bin):
    nat = NativeBatchLoader(cifar_bin, seed=0)
    ref = NativeBatchLoader(cifar_bin, seed=0, force_numpy=True)
    assert len(nat) == len(ref) == 100
    idx = np.asarray([0, 7, 49, 50, 99, 3], np.int64)
    flip = np.asarray([0, 1, 0, 1, 1, 0], np.uint8)
    img_n, lab_n = nat.gather(idx, flip)
    img_r, lab_r = ref.gather(idx, flip)
    np.testing.assert_array_equal(lab_n, lab_r)
    np.testing.assert_allclose(img_n, img_r, atol=1e-7)
    assert img_n.shape == (6, 32, 32, 3)
    assert img_n.min() >= 0.0 and img_n.max() <= 1.0


def test_multibyte_label_convention(tmp_path):
    """CIFAR-100 layout ([coarse, fine] label bytes): both backends keep the
    last byte (fine label)."""
    rng = np.random.default_rng(1)
    n, px = 20, 3072
    rec = np.empty((n, 2 + px), np.uint8)
    rec[:, 0] = rng.integers(0, 20, n)      # coarse
    rec[:, 1] = rng.integers(0, 100, n)     # fine
    rec[:, 2:] = rng.integers(0, 256, (n, px))
    p = tmp_path / "train.bin"
    rec.tofile(p)
    idx = np.asarray([0, 3, 19], np.int64)
    nat = NativeBatchLoader([str(p)], label_bytes=2)
    ref = NativeBatchLoader([str(p)], label_bytes=2, force_numpy=True)
    _, lab_n = nat.gather(idx)
    _, lab_r = ref.gather(idx)
    np.testing.assert_array_equal(lab_n, rec[idx, 1].astype(np.int32))
    np.testing.assert_array_equal(lab_n, lab_r)


def test_native_backend_active(cifar_bin):
    nat = NativeBatchLoader(cifar_bin)
    assert nat.backend == "native", "C++ loader failed to build"


def test_flip_semantics(cifar_bin):
    ld = NativeBatchLoader(cifar_bin)
    idx = np.asarray([5], np.int64)
    plain, _ = ld.gather(idx, np.asarray([0], np.uint8))
    flipped, _ = ld.gather(idx, np.asarray([1], np.uint8))
    np.testing.assert_allclose(flipped[0], plain[0][:, ::-1], atol=1e-7)


def test_cifar10_iterator(cifar_bin):
    import os
    it = get_dataset("cifar10", 8,
                     data_dir=os.path.dirname(cifar_bin[0]))
    imgs, labels = next(it)
    assert imgs.shape == (8, 32, 32, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0      # centered
    assert labels.shape == (8,) and labels.dtype == np.int32


def test_synthetic_fallback():
    it = get_dataset("cifar10", 4, data_dir=None)
    imgs, labels = next(it)
    assert imgs.shape == (4, 32, 32, 3)


def test_scalers_roundtrip():
    x = np.random.default_rng(0).random((4, 2)).astype(np.float32)
    s, inv = get_scaler(True), get_inverse_scaler(True)
    np.testing.assert_allclose(inv(s(x)), x, atol=1e-7)
    assert s(x).min() >= -1.0 and s(x).max() <= 1.0


def test_svhn_mat_loader_and_registry(tmp_path):
    """SVHN .mat release (the reference's svhn_cropped family,
    deps/score_sde_pytorch/datasets.py:82-96): loader semantics incl. the
    MATLAB [32,32,3,N] layout and the 10->0 label convention."""
    from scipy.io import savemat
    from naturaldiffusion_tpu.data.datasets import load_svhn_mat

    rng = np.random.default_rng(0)
    X = rng.integers(0, 256, (32, 32, 3, 20), dtype=np.uint8)
    y = np.concatenate([rng.integers(1, 10, 19), [10]]).reshape(-1, 1)
    savemat(tmp_path / "train_32x32.mat", {"X": X, "y": y})

    imgs, labels = load_svhn_mat(str(tmp_path / "train_32x32.mat"))
    assert imgs.shape == (20, 32, 32, 3) and imgs.dtype == np.uint8
    np.testing.assert_array_equal(imgs[5], X[..., 5])
    assert labels[-1] == 0                       # MATLAB class 10 = digit 0
    assert labels.max() < 10

    it = get_dataset("svhn", 8, data_dir=str(tmp_path))
    x, lab = next(it)
    assert x.shape == (8, 32, 32, 3)
    assert -1.0 <= x.min() and x.max() <= 1.0
    assert lab.max() < 10

    # no data on disk -> synthetic fallback at the right shape
    x2, _ = next(get_dataset("svhn", 4, data_dir=None))
    assert x2.shape == (4, 32, 32, 3)


def test_prefetch_batches_matches_sync_stream(cifar_bin):
    """The async double-buffer prefetch must produce the exact batch stream
    next_batch would (same RNG draws), for both backends."""
    for force_numpy in (False, True):
        pre = NativeBatchLoader(cifar_bin, seed=7, force_numpy=force_numpy)
        # same backend for the reference stream: the native dequantize is
        # x*(1/255) vs numpy's x/255 — 1-ulp apart, not the point here
        ref = NativeBatchLoader(cifar_bin, seed=7, force_numpy=force_numpy)
        it = pre.prefetch_batches(16, n_threads=3)
        for _ in range(5):
            img_a, lbl_a = next(it)
            # copy before advancing: the generator overwrites its buffer
            # two iterations later (documented zero-copy contract)
            img_a, lbl_a = img_a.copy(), lbl_a.copy()
            img_b, lbl_b = ref.next_batch(16)
            np.testing.assert_array_equal(lbl_a, lbl_b)
            np.testing.assert_allclose(img_a, img_b, rtol=0, atol=0)


def test_prefetch_teardown_drains_inflight_job(cifar_bin):
    """Dropping the prefetch generator (and the loader) with a job in
    flight must drain the job before the generator frame's buffers are
    freed — the C++ worker otherwise writes into freed heap (observed as
    a later abort inside ``bl_close`` when the suite ran under load).
    Subprocess, because the failure mode is a hard crash."""
    import os
    import subprocess
    import sys

    code = (
        "import gc, sys\n"
        "import numpy as np\n"
        "from naturaldiffusion_tpu.data.native_loader import"
        " NativeBatchLoader\n"
        "paths = sys.argv[1:]\n"
        "for trial in range(10):\n"
        "    ld = NativeBatchLoader(paths, seed=trial)\n"
        "    if ld.backend != 'native':\n"
        "        print('SKIP'); sys.exit(0)\n"
        "    it = ld.prefetch_batches(64, n_threads=2)\n"
        "    next(it); next(it)\n"
        "    del it, ld\n"                      # job in flight right here
        "    gc.collect()\n"
        "    junk = [np.empty(64 * 32 * 32 * 3, np.float32)"
        " for _ in range(4)]\n"
        "    junk[0][:] = 1.0\n"                # churn the freed heap
        "    del junk\n"
        "print('SURVIVED')\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))            # repo root only — no jax
    r = subprocess.run([sys.executable, "-c", code, *cifar_bin],
                       capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0 and ("SURVIVED" in r.stdout
                                  or "SKIP" in r.stdout), \
        (r.returncode, r.stdout[-500:], r.stderr[-500:])


def test_fill_batch_mt_matches_single_thread(cifar_bin):
    """The multithreaded fill (records split over a thread pool) must be
    bit-identical to the single-threaded gather."""
    nat = NativeBatchLoader(cifar_bin, seed=0)
    if nat.backend != "native":
        pytest.skip("no compiler in this environment")
    import ctypes
    idx = np.arange(40, dtype=np.int64)
    flip = (np.arange(40) % 2).astype(np.uint8)
    want = nat.gather(idx, flip)
    img = np.empty((40, 32, 32, 3), np.float32)
    lbl = np.empty((40,), np.int32)
    nat._lib.bl_fill_batch_mt(
        nat._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), 40,
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        flip.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(4))
    np.testing.assert_array_equal(img, want[0])
    np.testing.assert_array_equal(lbl, want[1])
