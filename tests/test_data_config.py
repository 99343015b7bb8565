"""Data pipeline + config system tests."""

import dataclasses
import os

import numpy as np
import pytest

from vaw_tpu.data import (
    BatchLoader,
    GaussianDataset,
    ImageFolderDataset,
    LatentDataset,
    LatentWithPixelDataset,
    center_crop_arr,
    load_dataset,
)
from vaw_tpu.utils.config import (
    TrainConfig,
    add_sample_args,
    add_train_args,
    config_from_args,
)
import argparse


def test_center_crop_arr_matches_adm_semantics():
    from PIL import Image

    # 100x80 image -> 32: halve once (50x40), scale to min=32, center crop.
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (80, 100, 3), np.uint8)
    )
    out = center_crop_arr(img, 32)
    assert out.shape == (32, 32, 3)


def test_gaussian_dataset_and_loader():
    ds = GaussianDataset(image_size=8, channels=3, num_classes=5, length=64)
    loader = BatchLoader(ds, batch_size=16)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["image"].shape == (16, 8, 8, 3)
    assert batches[0]["label"].shape == (16,)
    # forever() cycles epochs
    it = loader.forever()
    for _ in range(6):
        next(it)


def test_image_folder_dataset(tmp_path):
    from PIL import Image

    for cls in ["cat", "dog"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                np.random.RandomState(i).randint(0, 255, (40, 40, 3), np.uint8)
            ).save(d / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), image_size=16, flip=False)
    assert len(ds) == 6
    b = ds.get_batch(np.arange(6))
    assert b["image"].shape == (6, 16, 16, 3)
    assert b["image"].min() >= -1 and b["image"].max() <= 1
    assert set(b["label"]) == {0, 1}


def test_latent_h5_datasets(tmp_path):
    import h5py

    path = str(tmp_path / "latents.h5")
    rs = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        f["train_latents"] = rs.randn(20, 8, 4, 4).astype(np.float32)  # CHW
        f["train_labels"] = np.arange(20)
        f["train_pixels"] = rs.randint(
            0, 255, (20, 3, 32, 32)).astype(np.uint8)
    ds = LatentDataset(path)
    b = ds.get_batch(np.array([3, 1, 7]))
    assert b["image"].shape == (3, 4, 4, 8)  # HWC
    np.testing.assert_array_equal(b["label"], [3, 1, 7])
    dsp = LatentWithPixelDataset(path)
    bp = dsp.get_batch(np.array([0, 2]))
    assert bp["pixels"].shape == (2, 32, 32, 3)


def test_load_dataset_gaussian():
    train, test = load_dataset("/nonexistent", "Gaussian", 32, 16)
    batch = next(iter(train))
    assert batch["image"].shape == (32, 16, 16, 3)


def test_config_cli_roundtrip():
    p = argparse.ArgumentParser()
    add_train_args(p)
    cfg = config_from_args(p.parse_args([
        "--model", "DiT-B", "--weight_type", "lambda", "--image_size", "32",
        "--in_chans", "4", "--class_cond", "True", "--num_classes", "1000",
        "--betas", "0.9", "0.95", "--path_type", "cosine",
        "--interval", "0.2", "0.8",
    ]))
    assert cfg.model == "DiT-B"
    assert cfg.weight_type == "lambda"
    assert cfg.betas == (0.9, 0.95)
    assert cfg.interval == (0.2, 0.8)
    assert cfg.class_cond is True
    d = cfg.to_dict()
    assert d["model"] == "DiT-B"


def test_sample_args_defaults_delta():
    """sample.py changes warmup/cosine defaults
    (reference: sample.py vs main.py flag deltas, SURVEY.md section 5)."""
    p = argparse.ArgumentParser()
    add_sample_args(p)
    cfg = config_from_args(p.parse_args([]))
    assert cfg.warmup_steps == 5000
    assert cfg.cosine_decay is True
    assert cfg.train is False
    assert hasattr(cfg, "save_path") and cfg.atol == 1e-6

    p2 = argparse.ArgumentParser()
    add_train_args(p2)
    cfg2 = config_from_args(p2.parse_args([]))
    assert cfg2.warmup_steps == 0
    assert cfg2.cosine_decay is False


def test_compute_dtype_policy():
    import jax.numpy as jnp

    assert TrainConfig(amp=True).compute_dtype == jnp.bfloat16
    assert TrainConfig(amp=False).compute_dtype == jnp.float32


def test_model_variant_lists_in_sync():
    """config.py duplicates the registry list for argparse (no model-zoo
    import at flag-parse time); they must not drift."""
    from vaw_tpu.models.registry import MODEL_VARIANTS as reg
    from vaw_tpu.utils.config import MODEL_VARIANTS as cfg

    assert sorted(reg) == sorted(cfg)


def test_batch_loader_fast_forward_matches_uninterrupted():
    """Resume determinism: fast_forward(n) then iterating must yield exactly
    the batches an uninterrupted run yields after n batches — across epoch
    boundaries (epoch-seeded reshuffles included)."""
    from vaw_tpu.data.datasets import BatchLoader, GaussianDataset

    ds = GaussianDataset(image_size=4, channels=1, num_classes=3, length=24)
    ref = BatchLoader(ds, batch_size=4, shuffle=True, seed=5)
    it = ref.forever()
    full = [next(it) for _ in range(14)]  # 6 batches/epoch -> 2+ epochs

    for n in (0, 3, 6, 11):
        lo = BatchLoader(ds, batch_size=4, shuffle=True, seed=5)
        lo.fast_forward(n)
        it2 = lo.forever()
        for k in range(14 - n):
            got = next(it2)
            np.testing.assert_array_equal(got["image"], full[n + k]["image"],
                                          err_msg=f"n={n} k={k}")


def test_slab_loader_fast_forward_matches_uninterrupted():
    from vaw_tpu.data.datasets import SlabShuffleLoader

    class _SlabDS:
        def __len__(self):
            return 32

        def get_slab(self, a, b):
            return {"image": np.arange(a, b, dtype=np.float32)[:, None]}

    mk = lambda: SlabShuffleLoader(_SlabDS(), batch_size=4, slab_size=8,
                                   shuffle=True, seed=3)
    it = mk().forever()
    full = [next(it) for _ in range(20)]  # 8 batches/epoch -> 2+ epochs
    for n in (0, 5, 8, 13):
        lo = mk()
        lo.fast_forward(n)
        it2 = lo.forever()
        for k in range(20 - n):
            np.testing.assert_array_equal(
                next(it2)["image"], full[n + k]["image"],
                err_msg=f"n={n} k={k}")


def test_latent_pixel_slab_carries_pixels(tmp_path):
    """load_dataset routes Latent_Pixel to SlabShuffleLoader (get_slab);
    the slab read must carry the pixels key — dropping it silently fed the
    8-channel moment stack to the REPA teacher as 'pixels'."""
    import h5py

    path = str(tmp_path / "latents.h5")
    rs = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        f["train_latents"] = rs.randn(20, 8, 4, 4).astype(np.float32)
        f["train_labels"] = np.arange(20)
        f["train_pixels"] = rs.randint(
            0, 255, (20, 3, 32, 32)).astype(np.uint8)
    dsp = LatentWithPixelDataset(path)
    slab = dsp.get_slab(2, 7)
    assert slab["pixels"].shape == (5, 32, 32, 3)
    assert slab["image"].shape == (5, 4, 4, 8)

    train, _ = load_dataset(path, "Latent_Pixel", batch_size=4,
                            image_size=32)
    batch = next(iter(train))
    assert "pixels" in batch, "loader batches must include teacher pixels"
    assert batch["pixels"].shape == (4, 32, 32, 3)


def test_prefetch_propagates_worker_errors():
    """An exception in the prefetch worker must surface in the consumer,
    not masquerade as clean end-of-data (which would silently stop
    training and hang multi-host peers)."""
    import pytest

    from vaw_tpu.data.pipeline import prefetch_to_device
    from vaw_tpu.parallel import make_mesh

    def bad_iter():
        yield {"image": np.zeros((8, 4, 4, 3), np.float32),
               "label": np.zeros((8,), np.int32)}
        raise OSError("disk exploded")

    gen = prefetch_to_device(bad_iter(), make_mesh(), size=2)
    next(gen)
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        for _ in gen:
            pass


def test_image_folder_parallel_decode_matches_serial(tmp_path):
    from PIL import Image

    for i in range(6):
        d = tmp_path / ("a" if i < 3 else "b")
        d.mkdir(exist_ok=True)
        Image.fromarray(
            np.random.RandomState(i).randint(
                0, 255, (20, 20, 3)).astype(np.uint8)
        ).save(d / f"{i}.png")
    serial = ImageFolderDataset(str(tmp_path), image_size=16, flip=False)
    par = ImageFolderDataset(str(tmp_path), image_size=16, flip=False,
                             num_workers=4)
    bs = serial.get_batch(np.arange(6))
    bp = par.get_batch(np.arange(6))
    np.testing.assert_array_equal(bs["image"], bp["image"])
    np.testing.assert_array_equal(bs["label"], bp["label"])


def test_shapes_dataset_deterministic_and_learnable():
    """Procedural Shapes (the zero-egress CIFAR stand-in for on-hardware
    e2e runs): per-index determinism (resume fast-forward requirement),
    [-1,1] range, and per-class visual separation (it must be learnable,
    not noise)."""
    from vaw_tpu.data.datasets import ShapesDataset, load_dataset

    ds = ShapesDataset(image_size=32)
    b1 = ds.get_batch(np.arange(128))
    b2 = ds.get_batch(np.arange(128))
    np.testing.assert_array_equal(b1["image"], b2["image"])
    img, lab = b1["image"], b1["label"]
    assert img.shape == (128, 32, 32, 3) and img.dtype == np.float32
    assert img.min() >= -1.0 and img.max() <= 1.0
    assert set(np.unique(lab)) <= set(range(10))
    means = np.stack([img[lab == c].mean(axis=(0, 1, 2))
                      for c in range(10) if (lab == c).any()])
    assert means.std() > 0.1  # classes are visually distinct

    train, test = load_dataset("", "Shapes", batch_size=16, image_size=32)
    batch = next(iter(train))
    assert batch["image"].shape == (16, 32, 32, 3)
    assert "label" in batch
    tb = next(iter(test))  # test split: different seed, no flip
    assert not np.array_equal(tb["image"], batch["image"])
