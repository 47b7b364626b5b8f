"""Dataset pipelines — ``deps/score_sde_pytorch/datasets.py:23-196`` without
the TFDS dependency.

* ``get_scaler``/``get_inverse_scaler``: the centered/[0,1] data maps.
* ``cifar10_iterator``: infinite shuffled batch iterator over the CIFAR-10
  binary files through the native C++ loader (numpy fallback), with the
  reference's random-flip augmentation (``datasets.py:123-130``).
* ``synthetic_iterator``: shape-compatible stand-in when no data is on disk
  (this image has no datasets and zero egress).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import numpy as np

from .native_loader import NativeBatchLoader


def get_scaler(centered: bool = True):
    """[0,1] -> model space (reference ``datasets.py:36-42``)."""
    return (lambda x: x * 2.0 - 1.0) if centered else (lambda x: x)


def get_inverse_scaler(centered: bool = True):
    return (lambda x: (x + 1.0) / 2.0) if centered else (lambda x: x)


def cifar10_iterator(data_dir: str, batch_size: int, *,
                     split: str = "train", centered: bool = True,
                     random_flip: bool = True, seed: int = 0,
                     force_numpy: bool = False) -> Iterator:
    """Yields (images [B,32,32,3] in model space, labels [B]) forever.

    ``data_dir`` holds the CIFAR-10 *binary* release (cifar-10-batches-bin):
    data_batch_{1..5}.bin / test_batch.bin."""
    pattern = "data_batch_*.bin" if split == "train" else "test_batch.bin"
    paths = sorted(glob.glob(os.path.join(data_dir, pattern)))
    if not paths:
        raise FileNotFoundError(
            f"no CIFAR-10 binary files under {data_dir!r} ({pattern})")
    loader = NativeBatchLoader(paths, seed=seed, force_numpy=force_numpy)
    scaler = get_scaler(centered)

    def gen():
        # native double-buffer prefetch: the NEXT batch's gather/dequantize
        # runs on the loader's C++ worker while the trainer steps on this
        # one; the yielded arrays must not alias the rotating prefetch
        # buffers (centered's scaler allocates; uncentered copies)
        for images, labels in loader.prefetch_batches(
                batch_size, random_flip=random_flip):
            yield (scaler(images) if centered else images.copy()), \
                labels.copy()

    return gen()


def load_svhn_mat(path: str) -> tuple[np.ndarray, np.ndarray]:
    """SVHN cropped-digits ``.mat`` (train_32x32.mat layout) ->
    (images [N,32,32,3] uint8, labels [N] int32 with 10 -> 0).

    The reference consumes SVHN via TFDS ``svhn_cropped``
    (``deps/score_sde_pytorch/datasets.py:82-96``); the universal local
    form is Stanford's MATLAB release: X [32,32,3,N], y [N,1]
    (digit '0' stored as class 10)."""
    from scipy.io import loadmat

    m = loadmat(path)
    images = np.ascontiguousarray(np.transpose(m["X"], (3, 0, 1, 2)))
    labels = m["y"].reshape(-1).astype(np.int32) % 10
    return images, labels


def svhn_iterator(data_dir: str, batch_size: int, *, split: str = "train",
                  centered: bool = True, seed: int = 0) -> Iterator:
    """Infinite shuffled (images in model space, labels) batches over the
    SVHN .mat release.  No flip augmentation: the reference sets
    ``random_flip=False`` implicitly for digit data (flipped digits are
    different glyphs) — matching TFDS's un-augmented svhn_cropped."""
    path = os.path.join(data_dir, f"{split}_32x32.mat")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    images, labels = load_svhn_mat(path)
    rng = np.random.default_rng(seed)
    scaler = get_scaler(centered)
    n = len(images)

    while True:
        idx = rng.integers(0, n, batch_size)
        yield (scaler(images[idx].astype(np.float32) / 255.0),
               labels[idx])


def synthetic_iterator(batch_size: int, *, shape=(32, 32, 3),
                       num_classes: int = 10, centered: bool = True,
                       seed: int = 0) -> Iterator:
    rng = np.random.default_rng(seed)
    scaler = get_scaler(centered)

    while True:
        imgs = rng.random((batch_size,) + tuple(shape), np.float32)
        labels = rng.integers(0, num_classes, batch_size).astype(np.int32)
        yield scaler(imgs), labels


# dataset -> (default image size, image-folder preprocessing mode) for the
# reference's non-CIFAR datasets (datasets.py:44-139 semantics)
_FOLDER_DATASETS = {
    "celeba": 64,
    "lsun": 256,
    "church": 256,
    "bedroom": 128,
    "celebahq": 256,
}


def _folder_mode(name: str, size: int) -> str:
    if name == "celeba":
        return "celeba"
    # reference LSUN semantics are size-dependent (datasets.py:127-139):
    # 128px = resize_small -> central_crop; larger = central crop_resize
    if name in ("lsun", "church", "bedroom"):
        return "lsun_small" if size == 128 else "crop_resize"
    return "crop_resize"


def get_dataset(name: str, batch_size: int, *, data_dir: str | None = None,
                centered: bool = True, image_size: int | None = None,
                **kw) -> Iterator:
    """Registry entry point (reference ``get_dataset``, ``datasets.py:71``).

    * ``cifar10`` — the binary release through the native C++ loader;
    * ``celeba``/``lsun``/``church``/``bedroom``/``celebahq`` — an image
      directory through the PIL pipeline with the reference's crop/resize
      mode, OR ``.tfrecords`` files through the pure-numpy TFRecord reader;
    * ``ffhq`` — TFRecords (the reference's only FFHQ form);
    * ``synthetic`` — shape-compatible stand-in (no data on disk).
    Falls back to synthetic at the right shape when ``data_dir`` is empty.
    """
    if name not in ("cifar10", "svhn"):
        kw.pop("split", None)
    if name == "cifar10":
        if data_dir and glob.glob(os.path.join(data_dir, "*_batch*.bin")):
            return cifar10_iterator(data_dir, batch_size, centered=centered,
                                    **kw)
        return synthetic_iterator(batch_size, shape=(32, 32, 3),
                                  centered=centered)
    if name in _FOLDER_DATASETS or name == "ffhq":
        size = image_size or _FOLDER_DATASETS.get(name, 256)
        mode = _folder_mode(name, size)
        if data_dir:
            recs = glob.glob(os.path.join(data_dir, "*.tfrecord*"))
            if recs or name == "ffhq":
                from .tfrecord import tfrecord_iterator
                return tfrecord_iterator(sorted(recs), batch_size,
                                         centered=centered, **kw)
            from .image_folder import image_folder_iterator, list_images
            if list_images(data_dir):
                return image_folder_iterator(
                    data_dir, batch_size, image_size=size, mode=mode,
                    centered=centered, **kw)
        return synthetic_iterator(batch_size, shape=(size, size, 3),
                                  centered=centered)
    if name == "svhn":
        split = kw.pop("split", "train")
        kw.pop("random_flip", None)            # digits are never flipped
        if data_dir and os.path.exists(
                os.path.join(data_dir, f"{split}_32x32.mat")):
            return svhn_iterator(data_dir, batch_size, split=split,
                                 centered=centered, **kw)
        return synthetic_iterator(batch_size, shape=(32, 32, 3),
                                  centered=centered)
    if name == "synthetic":
        return synthetic_iterator(batch_size, centered=centered, **kw)
    raise ValueError(f"unknown dataset {name!r}")
