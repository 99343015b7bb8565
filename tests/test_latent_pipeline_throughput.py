"""Latent-HDF5 input pipeline: correctness + a host-side throughput floor.

The reference reopens the HDF5 file per item (reference:
datasets/data_loader.py:76-81) and relies on 16 DataLoader workers
(main.py:171-177); the TPU build reads whole sorted batches through one
chunk-cached handle. The throughput floor here is deliberately loose (CI
boxes vary) but catches pathological per-item regressions: the flagship
recipe needs ~850 imgs/s of 32x32x8 f32 moments (~7 MB/s), and a healthy
batched reader does >100x that from the page cache.
"""

import time

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from vaw_tpu.data.datasets import (  # noqa: E402
    BatchLoader,
    LatentDataset,
    SlabShuffleLoader,
)


@pytest.fixture(scope="module")
def latents_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("latents") / "latents.h5"
    rs = np.random.RandomState(0)
    n = 2048
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "train_latents", data=rs.randn(n, 8, 32, 32).astype(np.float16),
            chunks=(64, 8, 32, 32),
        )
        f.create_dataset("train_labels",
                         data=rs.randint(0, 1000, (n,)).astype(np.int64))
    return str(path)


def test_latent_dataset_layout_and_values(latents_h5):
    ds = LatentDataset(latents_h5, "train")
    batch = ds.get_batch(np.array([5, 3, 100]))
    assert batch["image"].shape == (3, 32, 32, 8)  # CHW -> HWC
    assert batch["image"].dtype == np.float32
    assert batch["label"].shape == (3,)
    with h5py.File(latents_h5, "r") as f:
        raw = f["train_latents"][5]
    np.testing.assert_allclose(
        batch["image"][0], np.transpose(raw, (1, 2, 0)).astype(np.float32)
    )


@pytest.mark.slow  # perf floor — flaky under concurrent load (1-core box)
def test_latent_loader_throughput_floor(latents_h5):
    ds = LatentDataset(latents_h5, "train")
    loader = SlabShuffleLoader(ds, batch_size=256, slab_size=1024,
                               shuffle=True, seed=0)
    it = iter(loader.forever())
    next(it)  # warm the chunk cache
    t0 = time.perf_counter()
    n_batches, n_imgs = 8, 0
    for _ in range(n_batches):
        b = next(it)
        n_imgs += len(b["image"])
    rate = n_imgs / (time.perf_counter() - t0)
    # flagship train step consumes ~850 imgs/s; require 10x headroom
    assert rate > 8_500, f"latent pipeline too slow: {rate:.0f} imgs/s"


def test_slab_loader_covers_epoch_exactly(latents_h5):
    ds = LatentDataset(latents_h5, "train")
    loader = SlabShuffleLoader(ds, batch_size=100, slab_size=512,
                               shuffle=True, seed=3)
    seen = []
    for batch in loader:
        assert len(batch["image"]) == 100
        seen.append(batch["label"])
    n = len(ds)
    assert sum(len(s) for s in seen) == n - n % 100


def test_slab_loader_shuffles_across_slabs(latents_h5):
    ds = LatentDataset(latents_h5, "train")
    a = next(iter(SlabShuffleLoader(ds, 256, slab_size=512, seed=0)))
    b = next(iter(SlabShuffleLoader(ds, 256, slab_size=512, seed=1)))
    assert not np.array_equal(a["label"], b["label"])
